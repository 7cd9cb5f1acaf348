"""FugueSQL integration (reference integrations/fugue.py:41-116 provides a
DaskSQLEngine so fugue workflows can run dask-sql).

Fugue already ships a first-class Spark engine (`fugue_spark`), so the
Spark-native integration is simply: use fugue's own SparkExecutionEngine
with this Context's SparkSession. This module provides the glue + a
helpful error when fugue isn't installed (it is not in this environment).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from dask_sql_spark.context import Context


def fugue_engine(context: "Context") -> Any:
    """Return a fugue ExecutionEngine bound to this Context's session."""
    try:
        from fugue_spark import SparkExecutionEngine
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fugue is not installed; `pip install fugue[spark]` to use "
            "FugueSQL with this engine"
        ) from e
    return SparkExecutionEngine(context.spark)  # pragma: no cover


def fsql(context: "Context", query: str, **kwargs: Any) -> Any:
    """Run a FugueSQL query on this engine (reference fsql_dask)."""
    try:
        import fugue.api as fa
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "fugue is not installed; `pip install fugue[spark]`"
        ) from e
    return fa.fugue_sql_flow(query, **kwargs).run(fugue_engine(context))  # pragma: no cover
