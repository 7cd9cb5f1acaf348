"""Skew-join + bucketing tests (scale-path operators)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from dask_sql_spark.operators.skew import salted_join

    # one ultra-hot key (90% of rows)
    big = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 900 + list(range(2, 102)), "v": range(1000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": range(1, 102), "w": range(101)})
    )
    plain = salted_join(big, small, on="k", salt=8)
    expected = big.join(small, on="k")
    assert plain.count() == expected.count() == 1000
    assert (
        plain.agg(F.sum("v"), F.sum("w")).collect()
        == expected.agg(F.sum("v"), F.sum("w")).collect()
    )


def test_salted_left_join_keeps_unmatched(spark):
    from dask_sql_spark.operators.skew import salted_join

    big = spark.createDataFrame(pd.DataFrame({"k": [1, 1, 2, 99], "v": [1, 2, 3, 4]}))
    small = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "w": [10, 20]}))
    out = salted_join(big, small, on="k", how="left", salt=4).collect()
    assert len(out) == 4
    assert any(r.w is None for r in out)  # k=99 preserved


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # managed tables land in ./spark-warehouse (gitignored); the warehouse
    # dir is a static conf and cannot be redirected per-test
    from dask_sql_spark.operators.skew import create_bucketed_table

    import shutil

    for t in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    left = spark.range(0, 10_000).withColumn("x", F.col("id") % 7)
    right = spark.range(0, 10_000).withColumn("y", F.col("id") % 13)
    lb = create_bucketed_table(spark, "bkt_left", left, ["id"], 8, sort_cols=["id"])
    rb = create_bucketed_table(spark, "bkt_right", right, ["id"], 8, sort_cols=["id"])
    # force the sort-merge path (tiny test tables would otherwise
    # broadcast); at fact-fact scale SMJ is what the planner picks anyway
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lb.join(rb, on="id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with NO shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
