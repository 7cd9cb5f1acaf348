"""Per-operator integration tests over the fixture tables, mirroring the
reference's operator-level suites (test_select/test_filter/test_join/
test_groupby/test_over/test_sort — SURVEY §5)."""

import pytest

from tests.conftest import collect_sorted


# ---------------- select / filter (reference test_select, test_filter) --- #
def test_select_columns(context):
    rows = context.sql("SELECT a FROM df_simple").collect()
    assert sorted(r.a for r in rows) == [1, 2, 3]


def test_select_expression(context):
    rows = context.sql("SELECT a + b AS s FROM df_simple").collect()
    assert sorted(round(r.s, 1) for r in rows) == [2.1, 4.2, 6.3]


def test_filter_null_is_false(context):
    # NULL predicate rows are dropped (reference filter.py:39)
    rows = context.sql("SELECT c FROM user_table_nan WHERE c > 1").collect()
    assert [r.c for r in rows] == [3]


def test_filter_conjunction(context):
    n = context.sql("SELECT * FROM df WHERE a = 2.0 AND b > 5").count()
    assert 0 < n < 200


# ---------------- joins (reference test_join.py, 21 tests) -------------- #
def test_join_inner(context):
    rows = collect_sorted(
        context.sql(
            """SELECT u1.user_id, u1.b, u2.c FROM user_table_1 u1
               JOIN user_table_2 u2 ON u1.user_id = u2.user_id"""
        )
    )
    assert rows == [(1, 3, 1), (1, 3, 2), (2, 1, 3), (2, 3, 3)]


def test_join_left_keeps_unmatched(context):
    rows = context.sql(
        """SELECT u1.user_id, u2.c FROM user_table_1 u1
           LEFT JOIN user_table_2 u2 ON u1.user_id = u2.user_id"""
    ).collect()
    assert len(rows) == 5  # user 3 unmatched, user 1 matches twice
    assert any(r.c is None for r in rows)


def test_join_full(context):
    rows = context.sql(
        """SELECT u1.user_id AS l, u2.user_id AS r FROM user_table_1 u1
           FULL JOIN user_table_2 u2 ON u1.user_id = u2.user_id"""
    ).collect()
    assert any(r.l is None for r in rows)  # user 4 right-only
    assert any(r.r is None for r in rows)  # user 3 left-only


def test_join_semi_anti_cross(context):
    semi = context.sql(
        "SELECT user_id FROM user_table_1 WHERE user_id IN (SELECT user_id FROM user_table_2)"
    ).count()
    anti = context.sql(
        "SELECT user_id FROM user_table_1 WHERE user_id NOT IN (SELECT user_id FROM user_table_2)"
    ).count()
    cross = context.sql(
        "SELECT * FROM user_table_1 CROSS JOIN user_table_2"
    ).count()
    assert semi == 3 and anti == 1 and cross == 16


def test_intersect_except(context):
    i = collect_sorted(
        context.sql(
            "SELECT user_id FROM user_table_1 INTERSECT SELECT user_id FROM user_table_2"
        )
    )
    e = collect_sorted(
        context.sql(
            "SELECT user_id FROM user_table_1 EXCEPT SELECT user_id FROM user_table_2"
        )
    )
    assert i == [(1,), (2,)] and e == [(3,)]


# ---------------- groupby (reference test_groupby.py) ------------------- #
def test_groupby_count_sum(context):
    rows = collect_sorted(
        context.sql("SELECT a, COUNT(*) AS n FROM long_table GROUP BY a")
    )
    assert rows == [(0, 100), (1, 101), (2, 103)]


def test_groupby_null_group_kept(context):
    rows = context.sql(
        "SELECT c, COUNT(*) AS n FROM user_table_nan GROUP BY c"
    ).collect()
    assert len(rows) == 3  # NULL forms its own group (aggregate.py:575-577)


def test_sum_all_null_is_null(context):
    # reference enforces sum(min_count=1): all-NULL -> NULL not 0
    # (aggregate.py:486-493); Spark matches natively
    row = context.sql(
        "SELECT SUM(c) AS s FROM user_table_nan WHERE c IS NULL"
    ).collect()[0]
    assert row.s is None


def test_count_star_vs_count_col(context):
    row = context.sql(
        "SELECT COUNT(*) AS all_rows, COUNT(c) AS non_null FROM user_table_nan"
    ).collect()[0]
    assert (row.all_rows, row.non_null) == (3, 2)


def test_distinct_aggregate(context):
    row = context.sql(
        "SELECT COUNT(DISTINCT user_id) AS n FROM user_table_1"
    ).collect()[0]
    assert row.n == 3


def test_agg_filter_clause(context):
    row = context.sql(
        "SELECT SUM(b) FILTER (WHERE user_id = 2) AS s FROM user_table_1"
    ).collect()[0]
    assert row.s == 4


# ---------------- window (reference test_over.py) ----------------------- #
def test_window_row_number(context):
    rows = collect_sorted(
        context.sql(
            """SELECT user_id, b,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY b, user_id) AS rn
               FROM user_table_1"""
        )
    )
    assert (2, 1, 1) in rows and (2, 3, 2) in rows


def test_window_frame_rows(context):
    rows = context.sql(
        """SELECT a, SUM(a) OVER (ORDER BY a ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
           FROM (SELECT a FROM df_simple)"""
    ).collect()
    assert sorted(r.s for r in rows) == [1, 3, 5]


def test_window_lag_lead(context):
    rows = context.sql(
        """SELECT a, LAG(a) OVER (ORDER BY a) AS p, LEAD(a) OVER (ORDER BY a) AS n
           FROM df_simple"""
    ).collect()
    by_a = {r.a: (r.p, r.n) for r in rows}
    assert by_a[1] == (None, 2) and by_a[2] == (1, 3) and by_a[3] == (2, None)


# ---------------- sort / limit (reference test_sort.py) ----------------- #
def test_sort_nulls_first_last(context):
    first = context.sql(
        "SELECT c FROM user_table_nan ORDER BY c ASC NULLS FIRST"
    ).collect()
    last = context.sql(
        "SELECT c FROM user_table_nan ORDER BY c ASC NULLS LAST"
    ).collect()
    assert first[0].c is None and last[-1].c is None
    assert [r.c for r in first[1:]] == [1, 3]


def test_sort_multi_direction(context):
    rows = context.sql(
        "SELECT user_id, b FROM user_table_1 ORDER BY user_id ASC, b DESC"
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 3), (2, 3), (2, 1), (3, 3)]


def test_limit_offset(context):
    rows = context.sql(
        "SELECT a FROM long_table ORDER BY a LIMIT 5 OFFSET 99"
    ).collect()
    assert [r.a for r in rows] == [0, 1, 1, 1, 1]


# ---------------- string/regex over fixture strings --------------------- #
def test_like_with_metachars(context):
    rows = context.sql(
        "SELECT a FROM string_table WHERE a LIKE '%^|()-*[]$%'"
    ).collect()
    assert len(rows) == 1


def test_similar_to_on_table(context):
    rows = context.sql(
        "SELECT a FROM string_table WHERE a SIMILAR TO '(a|b) normal%'"
    ).collect()
    assert [r.a for r in rows] == ["a normal string"]


def test_multiline_string_survives(context):
    rows = context.sql("SELECT a FROM string_table WHERE a LIKE 'a%multiline'").collect()
    assert len(rows) == 1


# ---------------- sample / distribute ----------------------------------- #
def test_tablesample(context):
    n = context.sql(
        "SELECT * FROM long_table TABLESAMPLE (50 PERCENT) REPEATABLE (1)"
    ).count()
    assert 0 < n < 304


def test_distribute_by(context):
    n = context.sql("SELECT a FROM long_table DISTRIBUTE BY a").count()
    assert n == 304


# ---------------- timezone handling (datetime_table) -------------------- #
def test_timestamps_utc_normalized(context):
    rows = context.sql(
        "SELECT no_timezone, utc_timezone FROM datetime_table ORDER BY no_timezone"
    ).collect()
    # session tz pinned to UTC: both columns agree (reference mappings.py:83-85)
    assert all(r.no_timezone == r.utc_timezone for r in rows)


def test_groups_frame_peer_semantics(spark):
    """GROUPS semantics pinned on a handcrafted case: bounds count DISTINCT
    order values (peer groups), not rows and not numeric ranges. Order keys
    10, 20, 20, 50: for the row at 50, GROUPS 1 PRECEDING covers {20, 50}
    (5+7+100=112) — a ROWS frame would cut the 20-peer in half (107) and a
    numeric RANGE frame would cover only {50} (100)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_sql_spark.operators.window_ext import groups_frame

    df = spark.createDataFrame(
        pd.DataFrame({"p": ["a"] * 4, "k": [10, 20, 20, 50], "x": [1, 5, 7, 100]})
    )
    out = groups_frame(df, ["p"], "k", F.sum("x"), preceding=1, following=0)
    got = {(r.k, r.x): r.groups_agg for r in out.collect()}
    assert got[(10, 1)] == 1          # first peer group alone
    assert got[(20, 5)] == 13         # {10} + {20,20} — whole peer group
    assert got[(20, 7)] == 13
    assert got[(50, 100)] == 112      # {20,20} + {50}, NOT 107, NOT 100


def test_groups_frame_unbounded(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_sql_spark.operators.window_ext import groups_frame

    df = spark.createDataFrame(
        pd.DataFrame({"p": ["a", "a", "b"], "k": [1, 1, 2], "x": [3, 4, 9]})
    )
    out = groups_frame(df, ["p"], "k", F.count(F.lit(1)), out_col="n")
    assert {(r.p, r.n) for r in out.collect()} == {("a", 2), ("b", 1)}


def test_hll_mergeable_sketch_accuracy(sf_tables):
    """Shard-built HLL sketches merged via hll_union_agg estimate within
    5% of exact distinct counts (the 100 TB pre-aggregation workflow)."""
    rows = sf_tables.sql(
        """
        WITH shard AS (
          SELECT o_orderpriority, hll_sketch_agg(o_custkey) AS sk,
                 COUNT(DISTINCT o_custkey) AS exact_d
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, hll_sketch_estimate(sk) AS approx_d, exact_d,
          hll_sketch_estimate(hll_union_agg(sk) OVER ()) AS approx_total
        FROM shard
        """
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_d - r.exact_d) <= max(2, 0.05 * r.exact_d)
    exact_total = sf_tables.sql(
        "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders"
    ).collect()[0].n
    assert abs(rows[0].approx_total - exact_total) <= max(2, 0.05 * exact_total)


def test_groups_frame_differential_vs_model(spark):
    """r9 audit: seeded 20-trial differential sweep of groups_frame
    against a plain-Python SQL:2011 GROUPS model (dense-rank interval
    over peer groups) — random tie-heavy data, sum/count/min/max,
    bounded and UNBOUNDED bounds in both directions. DuckDB 1.0 has no
    GROUPS mode, so the model oracle stands in."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from dask_sql_spark.operators.window_ext import UNBOUNDED, groups_frame

    rng = random.Random(11)

    def model(pdf, prec, foll, fn):
        out = {}
        for _, sub in pdf.groupby("g"):
            ranks = {o: i + 1 for i, o in enumerate(sorted(sub["o"].unique()))}
            for _, row in sub.iterrows():
                r = ranks[row["o"]]
                lo = -(10**9) if prec == UNBOUNDED else r - prec
                hi = 10**9 if foll == UNBOUNDED else r + foll
                vals = [
                    int(x)
                    for o, x in zip(sub["o"], sub["x"])
                    if lo <= ranks[o] <= hi
                ]
                out[row["rid"]] = {
                    "sum": sum(vals),
                    "count": len(vals),
                    "min": min(vals),
                    "max": max(vals),
                }[fn]
        return out

    aggs = {
        "sum": F.sum("x"),
        "count": F.count("*"),
        "min": F.min("x"),
        "max": F.max("x"),
    }
    for trial in range(20):
        n = rng.randint(1, 20)
        pdf = pd.DataFrame(
            {
                "g": pd.array([rng.choice([0, 1]) for _ in range(n)], dtype="int64"),
                "o": pd.array([rng.randint(0, 5) for _ in range(n)], dtype="int64"),
                "x": pd.array([rng.randint(-10, 10) for _ in range(n)], dtype="int64"),
                "rid": pd.array(range(n), dtype="int64"),
            }
        )
        prec = rng.choice([0, 1, 2, UNBOUNDED])
        foll = rng.choice([0, 1, 2, UNBOUNDED])
        fn = rng.choice(list(aggs))
        got = {
            int(r.rid): int(r.v)
            for r in groups_frame(
                spark.createDataFrame(pdf), ["g"], "o", aggs[fn],
                preceding=prec, following=foll, out_col="v",
            ).collect()
        }
        assert got == model(pdf, prec, foll, fn), (
            f"trial={trial} fn={fn} prec={prec} foll={foll}"
        )
