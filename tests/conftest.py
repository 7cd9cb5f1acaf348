"""Shared fixtures, mirroring the reference's fixture tables
(tests/integration/fixtures.py:31-253; see FIXTURES.md)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dask_sql_spark.context import default_spark_session

    spark = default_spark_session(
        app_name="dask_sql_spark_tests", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def context(spark):
    """Context preloaded with the reference-style fixture tables."""
    from dask_sql_spark import Context

    c = Context(spark=spark)

    c.create_table(
        "df_simple", pd.DataFrame({"a": [1, 2, 3], "b": [1.1, 2.2, 3.3]})
    )
    rng = np.random.RandomState(42)
    c.create_table(
        "df",
        pd.DataFrame(
            {
                "a": [1.0] * 100 + [2.0] * 200 + [3.0] * 400,
                "b": rng.uniform(0, 10, 700),
            }
        ),
    )
    c.create_table(
        "user_table_1",
        pd.DataFrame({"user_id": [2, 1, 2, 3], "b": [3, 3, 1, 3]}),
    )
    c.create_table(
        "user_table_2",
        pd.DataFrame({"user_id": [1, 1, 2, 4], "c": [1, 2, 3, 4]}),
    )
    c.create_table(
        "long_table", pd.DataFrame({"a": [0] * 100 + [1] * 101 + [2] * 103})
    )
    c.create_table(
        "user_table_nan",
        pd.DataFrame({"c": pd.array([3, pd.NA, 1], dtype="UInt8")}),
    )
    c.create_table(
        "string_table",
        pd.DataFrame({"a": ["a normal string", "%_%", "^|()-*[]$", "a\nmultiline"]}),
    )
    c.create_table(
        "datetime_table",
        pd.DataFrame(
            {
                "no_timezone": pd.date_range(
                    "2014-08-01 09:00", periods=6, freq="8h"
                ),
                "utc_timezone": pd.date_range(
                    "2014-08-01 09:00", periods=6, freq="8h", tz="UTC"
                ),
            }
        ),
    )
    return c


@pytest.fixture(scope="session")
def sf_tables(context):
    """Registers the sf0.001 star-schema tables into the shared context."""
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        context.create_table(t, f"{SF_DIR}/{t}.parquet")
    return context


def collect_sorted(df, *cols):
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))
