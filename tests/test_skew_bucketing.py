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


def test_write_sorted_produces_disjoint_file_ranges(spark, tmp_path):
    """Range-clustered write → parquet footer min/max ranges are pairwise
    disjoint on the sort key (file-level zone-map pruning works); a
    round-robin write of the same data leaves overlapping ranges."""
    from dask_sql_spark.sources.maintenance import file_stats_ranges, write_sorted

    df = spark.range(0, 10000).selectExpr(
        "(id * 2654435761) % 10000 AS k", "id AS payload"
    )
    sorted_path = str(tmp_path / "sorted")
    write_sorted(df, sorted_path, ["k"], n_files=8)
    ranges = sorted(file_stats_ranges(sorted_path, "k"))
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    unsorted_path = str(tmp_path / "unsorted")
    df.repartition(8).write.parquet(unsorted_path)
    overlapping = sorted(file_stats_ranges(unsorted_path, "k"))
    assert any(
        hi1 > lo2
        for (lo1, hi1), (lo2, hi2) in zip(overlapping, overlapping[1:])
    )


def test_salted_join_rejects_right_and_full(spark):
    """Round-9 guard: the salt-exploded small side would duplicate
    unmatched rows salt x under right/full semantics."""
    import pandas as pd
    import pytest

    from dask_sql_spark.operators.skew import salted_join

    big = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1.0]}))
    small = spark.createDataFrame(pd.DataFrame({"k": [1], "w": [2.0]}))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, "k", how=how)


def test_salted_join_accepts_spark_join_type_spellings(spark):
    """Round-10 advisor fix, pinned: the guard normalizes casing and
    underscores the way Spark itself does, so previously-working calls
    like how='INNER' or how='Left_Outer' are not rejected."""
    import pandas as pd

    from dask_sql_spark.operators.skew import salted_join

    big = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))
    small = spark.createDataFrame(pd.DataFrame({"k": [1], "w": [2.0]}))
    for how in ("INNER", "Left", "LEFT_OUTER", "leftOuter"):
        out = salted_join(big, small, "k", how=how, salt=4).collect()
        want = 2 if how.lower().replace("_", "") != "inner" else 1
        assert len(out) == want, how
