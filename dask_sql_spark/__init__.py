"""dask_sql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dask-contrib/dask-sql.

The reference (see /root/reference, SURVEY.md) is a two-tier engine: a Rust
DataFusion planner plus a Python executor emitting Dask DataFrame operations.
Here the entire relational stack is delegated to Spark SQL / Catalyst; this
package supplies the capability shim around it:

- :class:`Context` — dask-sql-compatible API surface (table registry, UDF
  registry, ``sql()``, custom DDL/ML statements) on top of ``SparkSession``.
- ``operators/`` — operators beyond stock Spark SQL (dedup, similarity
  search, text analysis, multimodal plumbing), all DataFrame-first.
- ``sources/`` — location/format-dispatched readers (parity with the
  reference's input plugin chain, dask_sql/input_utils/location.py).
- ``functions/`` — dialect-compat scalar functions.
- ``streaming/`` — Structured Streaming surface (additive; the reference
  has no streaming, SURVEY.md §2.10).
"""

from dask_sql_spark.context import Context
from dask_sql_spark.datacontainer import Aggregation, Statistics

__version__ = "0.1.0"

__all__ = [
    "Context",
    "Aggregation",
    "Statistics",
    "cmd_loop",
    "run_server",
    "__version__",
]


def __getattr__(name: str):
    # reference __init__.py exports cmd_loop and run_server at package
    # level (dask_sql/__init__.py:10-13); import lazily so `import
    # dask_sql_spark` stays light for query-only users
    if name == "cmd_loop":
        from dask_sql_spark.cmd import cmd_loop

        return cmd_loop
    if name == "run_server":
        from dask_sql_spark.server.app import run_server

        return run_server
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
