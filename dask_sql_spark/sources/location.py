"""Input dispatch: anything → Spark DataFrame.

Parity with the reference's input plugin chain
(dask_sql/input_utils/location.py:13-54 — extension-dispatched
``dd.read_<ext>``; dask.py / pandaslike.py — direct frame registration).

Spark-first: location strings go through ``spark.read.format(...)`` so the
scan benefits from Catalyst column pruning / predicate pushdown and scales
to many files; pandas frames go through ``spark.createDataFrame`` (Arrow).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".ndjson": "json",
    ".jsonl": "json",
    ".orc": "orc",
    ".txt": "text",
    ".text": "text",
    ".avro": "avro",
    ".tsv": "csv",
}


# compression suffixes Spark's text-based readers decode transparently;
# the REAL format extension sits underneath (/data/x.csv.gz → csv)
_COMPRESSION_EXTS = frozenset(
    {".gz", ".gzip", ".bz2", ".zst", ".xz", ".lz4", ".deflate", ".snappy"}
)


def _split_ext(base: str) -> str:
    _, ext = os.path.splitext(base)
    return ext.replace("*", "").replace("?", "").lower()


def _infer_format(path: str) -> str:
    # dispatch on the real extension, ignoring glob characters anywhere in
    # the basename (/data/part-*.parquet, /data/*.csv, /data/dir/)
    base = path.rstrip("/")
    ext = _split_ext(base)
    if ext in _COMPRESSION_EXTS:
        base = os.path.splitext(base)[0]
        ext = _split_ext(base)
    if ext in _EXT_TO_FORMAT:
        return _EXT_TO_FORMAT[ext]
    # an unrecognized alphabetic extension is almost certainly a format we
    # don't dispatch (the reference raises `Can not read files of format
    # <ext>`, location.py:52); silently scanning it as parquet would
    # produce a baffling low-level error or garbage instead
    if ext and ext[1:].isalpha():
        raise ValueError(
            f"cannot infer a reader for {path!r} (extension {ext!r}); "
            f"pass format=... explicitly"
        )
    # directory of parquet files (or numeric shard suffix) is the common
    # lake layout
    return "parquet"


def read_location(
    spark: SparkSession,
    location: str,
    format: str | None = None,
    **kwargs: Any,
) -> DataFrame:
    """Read a location string into a DataFrame, dispatching on extension or
    explicit ``format=`` (reference location.py:13-54).

    kwargs are passed through as reader options (e.g. ``header=True``,
    ``inferSchema=True`` for csv). For csv, header+schema inference default
    on to match the reference's pandas-like behavior.
    """
    fmt = (format or _infer_format(location)).lower()
    reader = spark.read
    if fmt == "csv":
        kwargs.setdefault("header", True)
        kwargs.setdefault("inferSchema", True)
    if fmt == "tsv":
        fmt = "csv"
        kwargs.setdefault("sep", "\t")
    options = {k: _as_option(v) for k, v in kwargs.items()}
    df = reader.format(fmt).options(**options).load(location)
    if fmt == "parquet":
        df = _restore_nano_timestamps(spark, df, location)
    return df


def _nano_timestamp_fields(location: str) -> list[str]:
    """Names of timestamp[ns] fields in a parquet location (driver-side
    footer peek via pyarrow; metadata-scale, not data-scale)."""
    try:
        import pyarrow.dataset as ds

        schema = ds.dataset(location, format="parquet").schema
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    except Exception:
        return []


def _restore_nano_timestamps(spark: SparkSession, df: DataFrame, location: str) -> DataFrame:
    """Spark's parquet reader rejects TIMESTAMP(NANOS) columns. With
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as epoch-nanos
    BIGINT; convert back to TIMESTAMP with exact integer division (a
    double division would lose precision above 2^53). The whole fix stays
    a file-source scan — pushdown and partitioning are unaffected."""
    nano_cols = _nano_timestamp_fields(location)
    if not nano_cols:
        return df
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for c in nano_cols:
        # repair only when the reader actually produced epoch-nanos BIGINT
        # (nanosAsLong set); a session that already read the column as a
        # timestamp needs no fix
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` DIV 1000)"))
    return df


def _as_option(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def to_spark_dataframe(
    spark: SparkSession,
    input_table: Any,
    format: str | None = None,
    **kwargs: Any,
) -> DataFrame:
    """Convert any supported input (Spark DF, pandas DF, location string,
    list-of-rows) to a Spark DataFrame."""
    if isinstance(input_table, DataFrame):
        return input_table
    if isinstance(input_table, str):
        if (
            format == "hive"
            or input_table.startswith("hive://")
            or input_table.startswith("databricks+pyhive://")
        ):
            # reference input_utils/sqlalchemy.py:12-16 accepts both
            # hive:// and databricks+pyhive:// connection strings and
            # routes them to the same Hive plugin; here both resolve
            # through the session catalog's Hive metastore.
            from dask_sql_spark.sources.catalogs import read_hive_table

            name = input_table.removeprefix("hive://").removeprefix(
                "databricks+pyhive://"
            )
            # the reference's scheme is a FULL SQLAlchemy connection URL
            # (token:...@host:port/database); this engine reads through
            # the session catalog's metastore instead, so only the
            # `scheme://db.table` shorthand is meaningful. Reject real
            # connection URLs loudly rather than mangling them into a
            # nonsense db/table lookup.
            if any(c in name for c in "@/:"):
                raise ValueError(
                    f"remote connection strings are not supported: "
                    f"{input_table!r}. This engine resolves hive:// and "
                    f"databricks+pyhive:// through the active Spark "
                    f"session's Hive metastore — use the "
                    f"'databricks+pyhive://db.table' (or 'hive://db.table') "
                    f"shorthand and configure the metastore on the "
                    f"SparkSession instead."
                )
            db, _, tbl = name.rpartition(".")
            return read_hive_table(spark, tbl, db or None)
        if format == "intake":
            from dask_sql_spark.sources.catalogs import read_intake_catalog

            return read_intake_catalog(spark, input_table, **kwargs)
        if format == "memory":
            # reference: format="memory" reads published datasets; here the
            # closest native notion is an existing temp view
            return spark.table(input_table)
        return read_location(spark, input_table, format=format, **kwargs)
    try:
        import pandas as pd

        if isinstance(input_table, pd.DataFrame):
            pdf = _normalize_pandas(input_table)
            if len(pdf) == 0:
                # dtypes carry the schema even with zero rows (the
                # reference registers empty frames; Spark's row-based
                # inference raises CANNOT_INFER_EMPTY_SCHEMA) — build
                # the schema explicitly from the dtypes (r9 probe)
                from pyspark.sql import types as T

                from dask_sql_spark.mappings import python_to_spark_type

                schema = T.StructType(
                    [
                        T.StructField(
                            str(c), python_to_spark_type(pdf[c].dtype)
                        )
                        for c in pdf.columns
                    ]
                )
                return spark.createDataFrame([], schema)
            return spark.createDataFrame(pdf)
    except ImportError:  # pragma: no cover
        pass
    try:
        import pyarrow as pa

        if isinstance(input_table, pa.Table):
            # Spark 4 ingests Arrow tables natively (zero-copy batches);
            # fall back through pandas for exotic types it rejects
            try:
                return spark.createDataFrame(input_table)
            except Exception:
                return spark.createDataFrame(
                    _normalize_pandas(input_table.to_pandas())
                )
    except ImportError:  # pragma: no cover
        pass
    # final fallback: rows/dicts
    try:
        return spark.createDataFrame(input_table)
    except TypeError as e:
        # a clear input-contract error instead of Spark's opaque
        # "'object' object is not iterable" (r9 probe; reference
        # input_utils raises the equivalent for unknown plugins)
        raise ValueError(
            f"Unsupported input type {type(input_table).__name__!r} for "
            "create_table: expected a Spark or pandas DataFrame, a "
            "pyarrow Table, a location string, or rows/dicts"
        ) from e


# unsigned → next-wider signed, preserving NULLs; Spark has no unsigned
# types and Arrow conversion rejects them (reference collapses unsigned into
# same-width signed SQL types, mappings.py:32-39 — we widen instead so
# values above the signed midpoint survive)
_UNSIGNED_TO_SIGNED = {
    "UInt8": "Int16",
    "UInt16": "Int32",
    "UInt32": "Int64",
    "UInt64": "Int64",
    "uint8": "int16",
    "uint16": "int32",
    "uint32": "int64",
    "uint64": "int64",
}


def _normalize_pandas(pdf):
    import pandas as pd  # noqa: F401

    converted = {}
    for c in pdf.columns:
        name = str(pdf[c].dtype)
        if name in _UNSIGNED_TO_SIGNED:
            converted[c] = pdf[c].astype(_UNSIGNED_TO_SIGNED[name])
    return pdf.assign(**converted) if converted else pdf
