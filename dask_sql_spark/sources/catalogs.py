"""Catalog-backed inputs: Hive metastore tables and Intake catalogs.

Parity with the reference's input plugin chain (input_utils/hive.py:27-316
scrapes DESCRIBE FORMATTED to find storage locations; input_utils/intake.py
opens intake catalogs). Spark-first: Hive goes through the session's
metastore support (``enableHiveSupport()``) — no location scraping needed,
partition pruning and statistics come from the metastore natively. Intake
is import-gated (not installed in this environment).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_hive_table(
    spark: SparkSession, table: str, database: str | None = None
) -> DataFrame:
    """Read a Hive metastore table (reference hive.py:27-316 reimplemented
    as a catalog lookup — Spark's Hive integration replaces the
    DESCRIBE-FORMATTED scraping wholesale)."""
    qualified = f"{database}.{table}" if database else table
    try:
        return spark.table(qualified)
    except Exception as e:
        raise RuntimeError(
            f"Cannot read Hive table {qualified!r}. Build the session with "
            "SparkSession.builder.enableHiveSupport() and a configured "
            "metastore."
        ) from e


def read_intake_catalog(
    spark: SparkSession, catalog_path: str, entry: str, **kwargs: Any
) -> DataFrame:
    """Load an intake catalog entry and convert to a Spark DataFrame
    (reference intake.py). Import-gated: intake is optional."""
    try:
        import intake  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "intake is not installed; `pip install intake` to read intake "
            "catalogs"
        ) from e
    catalog = intake.open_catalog(catalog_path)  # pragma: no cover
    pdf = catalog[entry].read()  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover
