"""The Context: dask-sql-compatible API surface on a SparkSession.

Parity target: ``dask_sql/context.py`` (Context class, :62-982). The
reference's two-tier plan pipeline (Rust DataFusion planner → Python plugin
executor, SURVEY.md §0) collapses here into ``spark.sql`` — Catalyst is
parser, optimizer and physical planner in one. What this class adds on top:

- table / schema / function / model registries (reference
  context.py:168-480)
- the dialect conformance pre-rewriter (dialect.py)
- the custom-statement front door (plans/statements.py)
- scoped ``config_options`` and ad-hoc ``dataframes=`` registration
  (reference context.py:482-533)

Scale notes (100 TB design):
- ``sql()`` returns a *lazy* DataFrame; nothing is collected on the driver
  (the reference's ``return_futures=False`` maps to the caller invoking an
  action). The reference's IN-subquery driver-side ``.compute()``
  anti-pattern (call.py:996-1026) does not exist here — Catalyst plans
  subqueries as joins.
- AQE is enabled by default: runtime partition coalescing, skew-join
  splitting, and dynamic join-strategy switching replace the reference's
  static JoinReorder / DynamicPartitionPruning rules
  (src/sql/optimizer.rs:53-115) with strictly-better runtime equivalents.
- Registered file-backed tables keep their path so scans stay file-source
  scans (predicate pushdown + partition pruning reach the parquet reader).
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_sql_spark import dialect
from dask_sql_spark.datacontainer import (
    Aggregation,
    SchemaContainer,
    Statistics,
    UDFInfo,
)
from dask_sql_spark.mappings import python_to_spark_type
from dask_sql_spark.plans.statements import maybe_handle_custom_statement
from dask_sql_spark.sources.location import to_spark_dataframe

DEFAULT_SCHEMA_NAME = "root"


def default_spark_session(
    app_name: str = "dask_sql_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    **conf: str,
) -> SparkSession:
    """Build a SparkSession with the engine's scale-oriented defaults.

    AQE on (runtime re-planning, skew handling, partition coalescing),
    Arrow on (vectorized pandas interchange for the UDF path). On a real
    cluster, ``master``/executors come from spark-submit; locally we default
    to all cores.
    """
    import os

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master("local[*]")
    defaults = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # reference dialect parity (Calcite/ANSI, reference planner): a
        # double-quoted token is an IDENTIFIER, not a string literal —
        # `SELECT "from" FROM "select"` works for keyword-laden names.
        # This also makes the dialect layer's single-quote-only literal
        # masks exactly right for what Spark now treats as string data.
        "spark.sql.ansi.doubleQuotedIdentifiers": "true",
        # read TIMESTAMP(NANOS) parquet as long; sources/location.py
        # restores them to timestamps losslessly
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    if shuffle_partitions is not None:
        defaults["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    defaults.update(conf)
    for k, v in defaults.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


class Context:
    """Main entry point, mirroring ``dask_sql.Context`` (context.py:62-109).

    Usage::

        from dask_sql_spark import Context
        c = Context()
        c.create_table("lineitem", "/data/lineitem.parquet")
        df = c.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
        df.show()
    """

    def __init__(self, spark: SparkSession | None = None, **session_conf: str):
        self.spark = spark or default_spark_session(**session_conf)
        # dynamic confs the engine depends on even when the session was
        # built outside default_spark_session: nano-timestamp parquet
        # inputs, and a pinned UTC session timezone (timestamps must
        # collect identically regardless of host timezone)
        for key, value in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.session.timeZone", "UTC"),
        ):
            try:
                self.spark.conf.set(key, value)
            except Exception:
                pass
        self.schemas: dict[str, SchemaContainer] = {
            DEFAULT_SCHEMA_NAME: SchemaContainer(DEFAULT_SCHEMA_NAME)
        }
        self.schema_name = DEFAULT_SCHEMA_NAME
        # reference context.py exposes catalog_name (default "dask_sql");
        # SHOW SCHEMAS FROM <catalog> and the JDBC shim validate against it
        self.catalog_name = "dask_sql_spark"

    # ------------------------------------------------------------------ #
    # table registry                                                     #
    # ------------------------------------------------------------------ #
    def create_table(
        self,
        table_name: str,
        input_table: Any,
        format: str | None = None,
        persist: bool = False,
        schema_name: str | None = None,
        statistics: Statistics | None = None,
        auto_rebalance: bool = False,
        **kwargs: Any,
    ) -> None:
        """Register a table (reference context.py:168-260).

        ``input_table`` may be a Spark DataFrame, a pandas DataFrame, a
        location string (csv/parquet/json/orc/…, dispatched like the
        reference's input plugin chain), or rows. ``persist=True`` caches
        into cluster memory (reference input_utils/convert.py:70-71).

        ``auto_rebalance`` (opt-in): when a *small* file-backed table
        arrives with pathologically low scan parallelism (e.g. one giant
        parquet row group — a single task serializes every downstream
        operator), repartition to cluster parallelism and cache.
        Size-capped so a 100 TB fact table is never touched. Off by
        default: measured locally, NVMe parquet scans + whole-stage
        codegen beat in-memory-cache scans for one-pass analytics; turn
        it on for iterative workloads that rescan small tables many times.
        """
        schema_name = schema_name or self.schema_name
        # reference API parity: create_table(..., gpu=True) selects cudf
        # there; in Spark, GPU execution is a session-level concern (the
        # RAPIDS plugin rewrites plans for ALL tables), so the flag is
        # accepted and surfaced rather than silently forwarded as a bogus
        # reader option
        if kwargs.pop("gpu", False):
            import warnings

            warnings.warn(
                "gpu=True: per-table GPU selection does not exist on Spark; "
                "enable the RAPIDS Accelerator on the session "
                "(spark.plugins=com.nvidia.spark.SQLPlugin) to run plans on "
                "GPU. Registering the table for CPU execution.",
                stacklevel=2,
            )
        df = to_spark_dataframe(self.spark, input_table, format=format, **kwargs)
        if persist:
            df = df.cache()
        elif auto_rebalance and isinstance(input_table, str):
            df = self._maybe_rebalance(df, input_table)
        schema = self.schemas[schema_name]
        self._unpersist_if_cached(schema.tables.get(table_name.lower()))
        schema.tables[table_name.lower()] = df
        if isinstance(input_table, str):
            schema.filepaths[table_name.lower()] = input_table
            from dask_sql_spark.sources.location import _infer_format

            schema.fileformats[table_name.lower()] = (
                format or _infer_format(input_table)
            ).lower()
        if statistics:
            schema.statistics[table_name.lower()] = statistics
        df.createOrReplaceTempView(self._view_name(table_name, schema_name))

    # size cap for auto-rebalance caching: tables above this stay pure
    # file scans (their layout is the lake's responsibility)
    AUTO_REBALANCE_MAX_BYTES = 2 * 1024**3

    def _maybe_rebalance(self, df: DataFrame, location: str):
        """Repartition+cache a small table whose file layout starves the
        cluster of parallelism (scan splits < half the executor slots)."""
        import glob
        import os

        try:
            paths = glob.glob(location) or [location]
            size = sum(
                os.path.getsize(p)
                for path in paths
                for p in (
                    [path]
                    if os.path.isfile(path)
                    else glob.glob(os.path.join(path, "**"), recursive=True)
                )
                if os.path.isfile(p)
            )
        except OSError:
            return df
        if size > self.AUTO_REBALANCE_MAX_BYTES:
            return df
        parallelism = self.spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() * 2 >= parallelism:
            return df
        return df.repartition(parallelism).cache()

    @staticmethod
    def _unpersist_if_cached(df: DataFrame | None) -> None:
        """Release executor cache when a registration is replaced/dropped —
        otherwise create/drop cycles leak storage memory."""
        if df is not None:
            try:
                if df.is_cached:
                    df.unpersist()
            except Exception:  # storage state gone with a stopped session
                pass

    def drop_table(self, table_name: str, schema_name: str | None = None) -> None:
        schema_name = schema_name or self.schema_name
        self._unpersist_if_cached(
            self.schemas[schema_name].tables.get(table_name.lower())
        )
        self.schemas[schema_name].tables.pop(table_name.lower(), None)
        self.schemas[schema_name].filepaths.pop(table_name.lower(), None)
        self.schemas[schema_name].fileformats.pop(table_name.lower(), None)
        self.spark.catalog.dropTempView(self._view_name(table_name, schema_name))

    def create_schema(self, schema_name: str) -> None:
        if schema_name not in self.schemas:
            self.schemas[schema_name] = SchemaContainer(schema_name)

    def drop_schema(self, schema_name: str) -> None:
        if schema_name not in self.schemas:
            raise RuntimeError(f"Schema {schema_name} does not exist")
        if schema_name == self.schema_name:
            self.schema_name = DEFAULT_SCHEMA_NAME
        schema = self.schemas.pop(schema_name)
        for t in list(schema.tables):
            # release executor cache like drop_table does — dropping a
            # schema full of persisted tables used to leak their storage
            # memory (round-10 audit)
            self._unpersist_if_cached(schema.tables.get(t))
            self.spark.catalog.dropTempView(self._view_name(t, schema_name))
        if DEFAULT_SCHEMA_NAME not in self.schemas:
            # the default schema always exists (dropping it empties it)
            self.schemas[DEFAULT_SCHEMA_NAME] = SchemaContainer(DEFAULT_SCHEMA_NAME)

    def _view_name(self, table_name: str, schema_name: str) -> str:
        # default schema registers bare names so plain SQL works; other
        # schemas are name-mangled (Spark temp views live in one namespace)
        if schema_name == DEFAULT_SCHEMA_NAME:
            return table_name.lower()
        return f"{schema_name}__{table_name.lower()}"

    def _table_exists(self, name: str) -> bool:
        schema_name, table = self._split_qualified(name)
        return table.lower() in self.schemas.get(schema_name, SchemaContainer("")).tables

    def _get_table(self, name: str) -> DataFrame:
        schema_name, table = self._split_qualified(name)
        try:
            return self.schemas[schema_name].tables[table.lower()]
        except KeyError:
            raise RuntimeError(f"Table {name} does not exist") from None

    def _split_qualified(self, name: str) -> tuple[str, str]:
        if "." in name:
            schema_name, table = name.split(".", 1)
            if schema_name in self.schemas:
                return schema_name, table
        return self.schema_name, name

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], T.StructType([]))

    # ------------------------------------------------------------------ #
    # function registry                                                  #
    # ------------------------------------------------------------------ #
    def register_function(
        self,
        f: Callable,
        name: str,
        parameters: list[tuple[str, Any]],
        return_type: Any,
        replace: bool = False,
        row_udf: bool = False,
        schema_name: str | None = None,
    ) -> None:
        """Register a scalar UDF callable from SQL (reference
        context.py:324-413).

        Column UDFs (``row_udf=False``) receive columnar batches — here
        that's a vectorized pandas UDF (Arrow transfer, the fast path).
        Row UDFs receive one row's scalars at a time (slow path; reference
        implements them via ``df.apply(axis=1)``).
        """
        schema_name = schema_name or self.schema_name
        schema = self.schemas[schema_name]
        lower = name.lower()
        if lower in schema.functions and not replace:
            existing = schema.functions[lower]
            if existing.func is not f:
                raise ValueError(
                    f"Function {name} already registered; pass replace=True"
                )
        spark_return = python_to_spark_type(return_type)
        if row_udf:
            spark_f = F.udf(f, spark_return)
        else:
            spark_f = F.pandas_udf(f, spark_return)
        # registered under original, lower, and upper case like the
        # reference (context.py:973-982)
        for variant in {name, name.lower(), name.upper()}:
            self.spark.udf.register(variant, spark_f)
        schema.functions[lower] = UDFInfo(name, f, parameters, return_type, row_udf)

    def register_aggregation(
        self,
        f: Aggregation | Callable,
        name: str,
        parameters: list[tuple[str, Any]],
        return_type: Any,
        replace: bool = False,
        schema_name: str | None = None,
    ) -> None:
        """Register a custom aggregation callable from SQL (reference
        context.py:415-480). Accepts either a tri-phase
        :class:`Aggregation` (chunk/agg/finalize, dask-compatible shape) or
        a plain ``pandas.Series -> scalar`` callable. Executed as a
        GROUPED_AGG pandas UDF (Arrow-batched)."""
        schema_name = schema_name or self.schema_name
        schema = self.schemas[schema_name]
        if f_existing := schema.functions.get(name.lower()):
            if not replace and f_existing.func is not f:
                raise ValueError(
                    f"Aggregation {name} already registered; pass replace=True"
                )
        series_fn = f.as_series_fn() if isinstance(f, Aggregation) else f
        spark_return = python_to_spark_type(return_type)
        agg_udf = F.pandas_udf(series_fn, spark_return, F.PandasUDFType.GROUPED_AGG)
        for variant in {name, name.lower(), name.upper()}:
            self.spark.udf.register(variant, agg_udf)
        schema.functions[name.lower()] = UDFInfo(
            name, series_fn, parameters, return_type, aggregation=True
        )

    def register_udtf(
        self,
        cls: Any,
        name: str,
        return_type: str | None = None,
        replace: bool = False,
        schema_name: str | None = None,
    ) -> None:
        """Register a Python table function callable from SQL (additive —
        the reference has no UDTF support, SURVEY §2.7). ``cls`` is a class
        with an ``eval`` method yielding tuples; ``return_type`` a DDL
        schema string like ``"word string, n int"``. Uses Spark's native
        Python UDTF machinery (Arrow-optimized where possible)."""
        from pyspark.sql.functions import udtf as spark_udtf

        schema_name = schema_name or self.schema_name
        schema = self.schemas[schema_name]
        lower = name.lower()
        if lower in schema.functions and not replace:
            raise ValueError(f"Function {name} already registered; pass replace=True")
        wrapped = spark_udtf(cls, returnType=return_type) if return_type else spark_udtf(cls)
        for variant in {name, name.lower(), name.upper()}:
            self.spark.udtf.register(variant, wrapped)
        schema.functions[lower] = UDFInfo(name, cls, [], return_type)

    def register_model(
        self,
        model_name: str,
        model: Any,
        training_columns: list[str] | None = None,
        schema_name: str | None = None,
    ) -> None:
        """Register any object with ``.predict`` (reference
        context.py:626-649)."""
        schema_name = schema_name or self.schema_name
        self.schemas[schema_name].models[model_name] = (
            model,
            list(training_columns or []),
        )

    def register_experiment(
        self,
        experiment_name: str,
        experiment_results: Any,
        schema_name: str | None = None,
    ) -> None:
        """Register experiment results for SHOW/DESCRIBE surfacing
        (reference context.py:615-624)."""
        schema_name = schema_name or self.schema_name
        self.schemas[schema_name].experiments[experiment_name] = (
            experiment_results
        )

    def alter_schema(self, old_schema_name: str, new_schema_name: str) -> None:
        """Rename a schema (reference context.py:589-597); the SQL path
        (ALTER SCHEMA … RENAME TO) routes through the same registry."""
        if old_schema_name not in self.schemas:
            raise RuntimeError(f"Schema {old_schema_name} does not exist")
        if new_schema_name in self.schemas and new_schema_name != old_schema_name:
            # renaming onto a live schema would silently orphan its
            # tables (and leak their caches) — SQL rename-onto-existing
            # fails, so does this (round-10 audit)
            raise RuntimeError(f"Schema {new_schema_name} already exists")
        schema = self.schemas.pop(old_schema_name)
        schema.name = new_schema_name
        self.schemas[new_schema_name] = schema
        if self.schema_name == old_schema_name:
            self.schema_name = new_schema_name
        # temp views carry the schema prefix — re-register under the new one
        for t, df in schema.tables.items():
            df.createOrReplaceTempView(self._view_name(t, new_schema_name))
            self.spark.catalog.dropTempView(
                self._view_name(t, old_schema_name)
            )

    def alter_table(
        self,
        old_table_name: str,
        new_table_name: str,
        schema_name: str | None = None,
    ) -> None:
        """Rename a table by MOVING its registry entries (reference
        context.py:599-613 / alter.py:14-86).

        A move, not create-new+drop-old: the old shape unpersisted the
        shared cached frame out from under the new name and silently
        dropped the table's filepath/format/statistics entries, so
        OPTIMIZE after a rename no longer knew the file location
        (round-10 audit)."""
        schema_name = schema_name or self.schema_name
        qualified = f"{schema_name}.{old_table_name}"
        if not self._table_exists(qualified):
            raise RuntimeError(f"Table {old_table_name} does not exist")
        schema = self.schemas[schema_name]
        lower_old = old_table_name.lower()
        lower_new = new_table_name.lower()
        df = schema.tables[lower_old]
        if lower_new != lower_old:
            # displacing a live table: release its cache AND clear its
            # registry entries — otherwise a source table with no
            # filepath entry would leave the displaced table's stale
            # location under the new name, so OPTIMIZE after the rename
            # would compact the WRONG files (round-10 advisor). A
            # case-only rename (Foo -> FOO) displaces nothing and must
            # not unpersist its own frame (round-10 advisor).
            self._unpersist_if_cached(schema.tables.get(lower_new))
            for reg in (
                schema.filepaths,
                schema.fileformats,
                schema.statistics,
            ):
                reg.pop(lower_new, None)
        schema.tables[lower_new] = schema.tables.pop(lower_old)
        for reg in (
            schema.filepaths,
            schema.fileformats,
            schema.statistics,
        ):
            if lower_old in reg:
                reg[lower_new] = reg.pop(lower_old)
        df.createOrReplaceTempView(self._view_name(new_table_name, schema_name))
        if lower_new != lower_old:
            self.spark.catalog.dropTempView(
                self._view_name(old_table_name, schema_name)
            )

    def fqn(self, name: str) -> tuple[str, str]:
        """Fully-qualified (schema, table) for a possibly-qualified name
        (reference context.py:732-747)."""
        return self._split_qualified(name)

    def run_server(self, **kwargs: Any):
        """Start the Presto-protocol HTTP server over this Context in a
        background thread and return it (reference context.py:704-719;
        stdlib server — the environment has no FastAPI/uvicorn)."""
        from dask_sql_spark.server.app import SQLServer

        if getattr(self, "_server", None) is not None:
            raise RuntimeError("server already running; call stop_server()")
        self._server = SQLServer(self, **kwargs)
        self._server.start()
        return self._server

    def stop_server(self) -> None:
        """Stop the server started by :meth:`run_server`
        (reference context.py:721-726)."""
        server = getattr(self, "_server", None)
        if server is not None:
            server.stop()
            self._server = None

    # ------------------------------------------------------------------ #
    # SQL execution                                                      #
    # ------------------------------------------------------------------ #
    def sql(
        self,
        sql: str,
        return_futures: bool = True,
        dataframes: dict[str, Any] | None = None,
        config_options: dict[str, Any] | None = None,
    ) -> DataFrame | pd.DataFrame:
        """Parse and plan a SQL statement; return a lazy DataFrame
        (reference context.py:482-533).

        ``return_futures=False`` collects to pandas (the reference's
        ``.compute()``). ``dataframes=`` registers ad-hoc tables first.
        ``config_options=`` are applied for this statement and restored
        afterwards (maps dask config keys to spark.conf where sensible).
        """
        if dataframes:
            for name, df in dataframes.items():
                self.create_table(name, df)

        restore: dict[str, str | None] = {}
        if config_options:
            for k, v in config_options.items():
                spark_key = _CONFIG_MAP.get(k, k if k.startswith("spark.") else None)
                if spark_key is None and k in _CONFIG_NOOP:
                    import warnings

                    warnings.warn(
                        f"config {k!r} has no Spark equivalent; ignored",
                        stacklevel=2,
                    )
                if spark_key:
                    try:
                        restore[spark_key] = self.spark.conf.get(spark_key)
                    except Exception:
                        restore[spark_key] = None
                    self.spark.conf.set(spark_key, str(v))
        try:
            result = self._do_sql(sql)
        finally:
            for k, v in restore.items():
                try:
                    if v is None:
                        self.spark.conf.unset(k)
                    else:
                        self.spark.conf.set(k, v)
                except Exception:  # never mask the query's own error
                    pass
        if not return_futures and isinstance(result, DataFrame):
            return result.toPandas()
        return result

    def _do_sql(self, sql: str) -> DataFrame:
        sql = sql.strip().rstrip(";")
        handled = maybe_handle_custom_statement(self, sql)
        if handled is not None:
            return handled
        rewritten = dialect.rewrite(sql)
        rewritten = self._qualify_schema_tables(rewritten)
        try:
            return self.spark.sql(rewritten)
        except Exception as e:
            # auto-table discovery from the caller's stack (reference
            # _get_tables_from_stack, context.py:914-931): an unresolved
            # table whose name matches a DataFrame variable in a calling
            # frame is registered on the fly and the query retried
            missing = _missing_table_name(e)
            if missing and self._register_from_stack(missing):
                return self.spark.sql(rewritten)
            raise

    def _register_from_stack(self, name: str) -> bool:
        import inspect

        frame = inspect.currentframe()
        try:
            while frame is not None:
                candidate = frame.f_locals.get(name)
                if candidate is not None and _is_frame_like(candidate):
                    self.create_table(name, candidate)
                    return True
                frame = frame.f_back
        finally:
            del frame
        return False

    def _qualify_schema_tables(self, sql: str) -> str:
        """Rewrite ``schema.table`` references for non-default schemas into
        their mangled temp-view names. String literals are left untouched;
        each identifier part may be bare, double-quoted, or backticked
        (``s2.t``, ``"s2"."t"``, `` `s2`.`t` ``)."""
        import re

        from dask_sql_spark.dialect import _rewrite_outside_literals

        def _rewrite_chunk(chunk: str) -> str:
            for schema_name in self.schemas:
                if schema_name == DEFAULT_SCHEMA_NAME:
                    continue
                for table in self.schemas[schema_name].tables:
                    s, t = re.escape(schema_name), re.escape(table)
                    chunk = re.sub(
                        rf"(?<![\w.])(?:{s}|\"{s}\"|`{s}`)\s*\.\s*"
                        rf"(?:{t}|\"{t}\"|`{t}`)(?![\w.])",
                        self._view_name(table, schema_name),
                        chunk,
                        flags=re.IGNORECASE,
                    )
            return chunk

        if (
            all(s == DEFAULT_SCHEMA_NAME for s in self.schemas)
            and self.schema_name == DEFAULT_SCHEMA_NAME
        ):
            return sql
        sql = _rewrite_outside_literals(sql, _rewrite_chunk)
        if self.schema_name != DEFAULT_SCHEMA_NAME:
            sql = self._rewrite_unqualified_tables(sql)
        return sql

    def _rewrite_unqualified_tables(self, sql: str) -> str:
        """UNQUALIFIED names resolve against the CURRENT schema when it is
        non-default (reference context.py: USE SCHEMA s; SELECT ... FROM t
        reads s.t) — rewrite bare table names of the current schema to
        their mangled views. Anchored to table-position keywords so a
        column (or keyword) that merely shares a table's name is never
        touched; root-schema tables are already registered under their
        bare names. A ``FROM`` that is *call syntax* — ``EXTRACT(unit FROM
        expr)``, ``TRIM(... FROM s)``, ``SUBSTRING(s FROM n)``,
        ``OVERLAY(s PLACING r FROM n)`` — is NOT table position: a column
        after that FROM sharing a table's name must stay untouched, so
        this runs full-text with a literal mask + an innermost-call mask
        instead of the chunk rewriter."""
        import re

        from dask_sql_spark.dialect import _literal_mask

        for table in self.schemas[self.schema_name].tables:
            t = re.escape(table)
            pat = re.compile(
                rf"\b(FROM|JOIN|INTO|UPDATE|TABLE)(\s+)"
                rf"(?:{t}|\"{t}\"|`{t}`)(?![\w.])",
                re.IGNORECASE,
            )
            lit = _literal_mask(sql)
            func_mask = _from_func_call_mask(sql, lit)
            out: list[str] = []
            last = 0
            for m in pat.finditer(sql):
                if lit[m.start()]:
                    continue
                if m.group(1).upper() == "FROM" and func_mask[m.start()]:
                    continue
                out.append(sql[last : m.start()])
                out.append(
                    m.group(1)
                    + m.group(2)
                    + self._view_name(table, self.schema_name)
                )
                last = m.end()
            out.append(sql[last:])
            sql = "".join(out)
        return sql

    # ------------------------------------------------------------------ #
    # introspection                                                      #
    # ------------------------------------------------------------------ #
    def explain(
        self,
        sql: str,
        dataframes: dict[str, Any] | None = None,
        mode: str = "formatted",
    ) -> str:
        """Return the plan string (reference context.py:535-571).

        ``mode``: formatted | simple | extended | codegen | cost —
        Spark's ExplainMode set; ``cost`` shows CBO row/size statistics
        (after ``ANALYZE TABLE`` they drive join reordering at scale).
        """
        if dataframes:
            for name, df in dataframes.items():
                self.create_table(name, df)
        df = self._do_sql(sql)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )

    def visualize(self, sql: str, filename: str = "plan.txt") -> None:
        """Plan visualization: writes the formatted plan (reference
        context.py:573-578 renders the dask graph — no graphviz dep here)."""
        with open(filename, "w") as f:
            f.write(self.explain(sql))

    def ipython_magic(self, auto_include: bool = False) -> None:  # pragma: no cover
        """Register the %%sql cell magic (reference context.py:651-702)."""
        try:
            from IPython import get_ipython
        except ImportError as e:
            raise RuntimeError("IPython is not installed") from e
        ip = get_ipython()
        if ip is None:
            return

        def _sql_magic(line, cell=None):
            query = cell or line
            return self.sql(query, return_futures=False)

        ip.register_magic_function(_sql_magic, "line_cell", "sql")


_FROM_CALL_FUNCS = frozenset({"EXTRACT", "TRIM", "SUBSTRING", "OVERLAY"})


def _from_func_call_mask(sql: str, lit_mask: list[bool]) -> list[bool]:
    """True at positions whose INNERMOST unclosed paren is the argument
    list of a function where FROM is call syntax (EXTRACT/TRIM/SUBSTRING/
    OVERLAY). Innermost-only: a derived-table subquery nested deeper
    re-opens ordinary table position."""
    n = len(sql)
    out = [False] * n
    stack: list[bool] = []
    for i in range(n):
        if not lit_mask[i]:
            ch = sql[i]
            if ch == "(":
                j = i - 1
                while j >= 0 and sql[j].isspace():
                    j -= 1
                e = j + 1
                while j >= 0 and (sql[j].isalnum() or sql[j] == "_"):
                    j -= 1
                stack.append(sql[j + 1 : e].upper() in _FROM_CALL_FUNCS)
            elif ch == ")" and stack:
                stack.pop()
        out[i] = bool(stack) and stack[-1]
    return out


def _missing_table_name(e: Exception) -> str | None:
    """Extract the table name from a TABLE_OR_VIEW_NOT_FOUND error."""
    import re

    m = re.search(r"The table or view `?([\w.]+)`? cannot be found", str(e))
    return m.group(1) if m else None


def _is_frame_like(obj: Any) -> bool:
    if isinstance(obj, DataFrame):
        return True
    try:
        import pandas as _pd

        return isinstance(obj, _pd.DataFrame)
    except ImportError:  # pragma: no cover
        return False


# dask-sql config keys → spark conf equivalents (reference sql-schema.yaml)
_CONFIG_MAP = {
    "sql.join.broadcast": "spark.sql.autoBroadcastJoinThreshold",
    "sql.identifier.case_sensitive": "spark.sql.caseSensitive",
    "sql.predicate_pushdown": "spark.sql.parquet.filterPushdown",
    "sql.dynamic_partition_pruning": "spark.sql.optimizer.dynamicPartitionPruning.enabled",
    # number of output partitions from an aggregation
    "sql.aggregate.split_out": "spark.sql.shuffle.partitions",
    # max tables considered by the join-reorder rule (Spark: CBO DP limit)
    "sql.max_fact_tables": "spark.sql.cbo.joinReorder.dp.threshold",
    # element cap for the top-k sort optimization
    "sql.sort.topk-nelem-limit": "spark.sql.execution.topKSortFallbackThreshold",
}

# reference keys with NO Spark equivalent: accepted and ignored with a
# warning (Spark's engine covers the concern differently — tree
# reductions via AQE, incremental limits natively, decimals natively)
_CONFIG_NOOP = {
    "sql.aggregate.split_every",
    "sql.limit.check-first-partition",
    "sql.optimize",
    "sql.optimizer.verbose",
    "sql.fact_dimension_ratio",
    "sql.preserve_user_order",
    "sql.filter_selectivity",
    "sql.mappings.decimal_support",
}
