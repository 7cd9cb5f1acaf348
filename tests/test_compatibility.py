"""Randomized differential-compatibility corpus.

Mirrors the reference's fugue-derived corpus (test_compatibility.py:1-42:
42 randomized agg/case/join/union queries checked against SQLite). Here the
oracle is DuckDB, the tables are FIXTURES.md's randomized df1/df2, and the
generator is seeded — every run exercises the same 40 queries.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

SEED = 42


def _df1() -> pd.DataFrame:
    rng = np.random.RandomState(SEED)
    user_id = pd.array(
        rng.choice([1, 2, 3, 4, None], 100), dtype="Int64"
    )
    a = rng.rand(100)
    a[a > 0.8] = np.nan
    b = rng.randint(-10, 10, 100)
    return pd.DataFrame({"user_id": user_id, "a": a, "b": b})


def _df2() -> pd.DataFrame:
    rng = np.random.RandomState(SEED + 1)
    return pd.DataFrame(
        {
            "user_id": pd.array(rng.choice([1, 2, 3, 4], 100), dtype="Int64"),
            "c": rng.randint(20, 30, 100),
            "d": rng.choice(["a", "b", "c", None], 100),
        }
    )


def _gen_queries() -> list[str]:
    r = random.Random(SEED)
    ops = ["<", "<=", ">", ">=", "=", "<>"]
    queries: list[str] = []
    for _ in range(8):
        queries.append(
            f"SELECT user_id, b FROM df1 WHERE b {r.choice(ops)} {r.randint(-9, 9)}"
        )
    for _ in range(8):
        queries.append(
            f"""SELECT user_id, COUNT(*) AS n, SUM(b) AS sb, MIN(b) AS mb,
                MAX(b) AS xb FROM df1 WHERE b {r.choice(ops)} {r.randint(-5, 5)}
                GROUP BY user_id"""
        )
    for _ in range(6):
        join = r.choice(["JOIN", "LEFT JOIN"])
        queries.append(
            f"""SELECT df1.user_id AS u, b, c FROM df1 {join} df2
                ON df1.user_id = df2.user_id WHERE c {r.choice(ops)} {r.randint(20, 29)}"""
        )
    for _ in range(5):
        vals = ", ".join(str(r.randint(-9, 9)) for _ in range(3))
        queries.append(
            f"""SELECT CASE WHEN b IN ({vals}) THEN 'hit' ELSE 'miss' END AS k,
                COUNT(*) AS n FROM df1 GROUP BY 1"""
        )
    for _ in range(4):
        direction = r.choice(["ASC", "DESC"])
        nulls = r.choice(["NULLS FIRST", "NULLS LAST"])
        queries.append(
            f"""SELECT user_id, b FROM df1
                ORDER BY user_id {direction} {nulls}, b LIMIT {r.randint(5, 40)}"""
        )
    for _ in range(3):
        queries.append(
            f"""SELECT d, COUNT(*) AS n, SUM(c) AS sc FROM df2 GROUP BY d
                HAVING COUNT(*) > {r.randint(5, 20)}"""
        )
    queries.append(
        "SELECT user_id FROM df1 UNION SELECT user_id FROM df2"
    )
    queries.append(
        "SELECT UPPER(COALESCE(d, 'z')) AS u, LENGTH(COALESCE(d, '')) AS l, "
        "COUNT(*) AS n FROM df2 GROUP BY 1, 2"
    )
    for _ in range(4):
        queries.append(
            f"""SELECT COUNT(*) AS n, COUNT(user_id) AS nu,
                COUNT(DISTINCT user_id) AS du FROM df1 WHERE b {r.choice(ops)} {r.randint(-5, 5)}"""
        )
    return queries


QUERIES = _gen_queries()


@pytest.fixture(scope="module")
def compat_ctx(context):
    context.create_table("df1", _df1())
    context.create_table("df2", _df2())
    return context


@pytest.fixture(scope="module")
def compat_duck():
    con = duckdb.connect()
    con.register("df1", _df1())
    con.register("df2", _df2())
    return con


@pytest.mark.parametrize("idx", range(len(QUERIES)))
def test_random_query_matches_duckdb(compat_ctx, compat_duck, idx):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    q = QUERIES[idx]
    sdf = compat_ctx.sql(q).toPandas()
    odf = _downcast_hugeint(compat_duck.sql(q))
    assert compare(sdf, odf) is None, q


def _downcast_hugeint(rel):
    """This harness runs the SAME SQL text on both engines, so DuckDB's
    SUM(int)->HUGEINT->float64 conversion is inherent rather than an
    oracle-authoring bug (those are swept by tests/test_oracle_types.py).
    Exactly re-integerize such columns so compare()'s dtype-kind gate
    tests real value parity, not DuckDB's pandas conversion."""
    types = [str(t).upper() for t in rel.types]
    odf = rel.df()
    for col, typ in zip(rel.columns, types):
        if "HUGEINT" in typ and col in odf:
            vals = odf[col].dropna()
            if (vals % 1 == 0).all():  # integral -> exact down-cast
                odf[col] = odf[col].astype("Int64")
    return odf


# extra templates appended after the initial 40 (kept separate so the
# original indices stay stable)
def _gen_queries_extra() -> list[str]:
    r = random.Random(SEED + 100)
    out = []
    for _ in range(4):
        a, b = r.randint(1, 9), r.randint(1, 9)
        out.append(
            f"SELECT user_id, b + {a} AS bp, b * {b} AS bt, -b AS bn, "
            f"ABS(b) AS ba, b % {a} AS bm FROM df1"
        )
    for _ in range(3):
        out.append(
            f"SELECT DISTINCT user_id FROM df1 WHERE b > {r.randint(-8, 8)}"
        )
    for _ in range(3):
        out.append(
            f"""SELECT u, COUNT(*) AS n FROM (
                  SELECT user_id AS u FROM df1 WHERE b > {r.randint(-5, 5)}
                  UNION ALL
                  SELECT user_id AS u FROM df2 WHERE c < {r.randint(21, 29)}
                ) t GROUP BY u"""
        )
    return out


EXTRA = _gen_queries_extra()


@pytest.mark.parametrize("idx", range(len(EXTRA)))
def test_random_query_extra(compat_ctx, compat_duck, idx):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    q = EXTRA[idx]
    sdf = compat_ctx.sql(q).toPandas()
    odf = _downcast_hugeint(compat_duck.sql(q))
    assert compare(sdf, odf) is None, q


# third batch: the TPC-DS xfail-construct families (QUERIES99.md) as
# randomized differential templates — integer arithmetic only, so results
# are exact in both engines
def _gen_queries_ds() -> list[str]:
    r = random.Random(SEED + 200)
    out = []
    for _ in range(3):
        k = r.randint(2, 5)
        out.append(
            f"""SELECT user_id, g, COUNT(*) AS n, SUM(b) AS sb FROM (
                  SELECT user_id, b % {k} AS g, b FROM df1
                ) t GROUP BY ROLLUP (user_id, g)"""
        )
    for _ in range(3):
        # RANGE frame (the ORDER BY default) is tie-inclusive → the
        # running sum is deterministic even with duplicate order keys
        out.append(
            f"""SELECT user_id, b,
                  SUM(b) OVER (PARTITION BY user_id ORDER BY b) AS run,
                  RANK() OVER (PARTITION BY user_id ORDER BY b) AS rnk
                FROM df1 WHERE b > {r.randint(-8, 0)}"""
        )
    for _ in range(2):
        k = r.randint(21, 28)
        out.append(
            f"""SELECT user_id, b FROM df1
                WHERE EXISTS (SELECT 1 FROM df2
                              WHERE df2.user_id = df1.user_id AND c > {k})"""
        )
        out.append(
            f"""SELECT user_id, b FROM df1
                WHERE NOT EXISTS (SELECT 1 FROM df2
                                  WHERE df2.user_id = df1.user_id AND c > {k})"""
        )
    out.append(
        """SELECT user_id,
             (SELECT COUNT(*) FROM df2 WHERE df2.user_id = df1.user_id) AS n2
           FROM df1"""
    )
    out.append("SELECT user_id FROM df1 INTERSECT SELECT user_id FROM df2")
    out.append("SELECT user_id FROM df1 EXCEPT SELECT user_id FROM df2")
    for _ in range(2):
        k1, k2 = r.randint(-5, 5), r.randint(21, 28)
        out.append(
            f"""SELECT
                 (SELECT COUNT(*) FROM df1 WHERE b > {k1}) AS n1,
                 (SELECT COUNT(*) FROM df2 WHERE c < {k2}) AS n2,
                 (SELECT COUNT(DISTINCT user_id) FROM df1) AS du"""
        )
    for _ in range(2):
        out.append(
            f"""SELECT user_id,
                  SUM(CASE WHEN b > {r.randint(-3, 3)} THEN 1 ELSE 0 END) AS hi,
                  SUM(CASE WHEN b < {r.randint(-3, 3)} THEN 1 ELSE 0 END) AS lo
                FROM df1 GROUP BY user_id"""
        )
    return out


DS_EXTRA = _gen_queries_ds()


@pytest.mark.parametrize("idx", range(len(DS_EXTRA)))
def test_random_query_ds_constructs(compat_ctx, compat_duck, idx):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    q = DS_EXTRA[idx]
    sdf = compat_ctx.sql(q).toPandas()
    odf = _downcast_hugeint(compat_duck.sql(q))
    assert compare(sdf, odf) is None, q


def test_csv_permissive_corrupt_records(context, tmp_path):
    """Malformed CSV rows surface in _corrupt_record under PERMISSIVE
    mode instead of failing the 100 TB ingest; DROPMALFORMED skips them."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n3\n4,5,6\n7,8\n")
    df = context.spark.read.option("header", True).schema(
        "a INT, b INT, _corrupt_record STRING"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).csv(str(p))
    rows = df.collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = [(r["a"], r["b"]) for r in rows if r["_corrupt_record"] is None]
    assert sorted(good) == [(1, 2), (3, None), (7, 8)] or len(bad) >= 1
    dropped = context.spark.read.option("header", True).schema(
        "a INT, b INT"
    ).option("mode", "DROPMALFORMED").csv(str(p))
    assert dropped.count() <= 4


def test_stream_static_dimension_join(spark, tmp_path):
    """Streaming fact × static dimension joins natively (the standard
    enrichment topology); dimension stays a broadcastable batch side."""
    import pandas as pd

    from dask_sql_spark.streaming.core import memory_sink_query

    d = tmp_path / "stream_src"
    d.mkdir()
    pd.DataFrame({"k": [1, 2, 1], "v": [10.0, 20.0, 30.0]}).to_parquet(
        d / "a.parquet"
    )
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k LONG, name STRING")
    src = spark.readStream.schema("k LONG, v DOUBLE").parquet(str(d))
    joined = src.join(dim, "k").groupBy("name").sum("v")
    q = memory_sink_query(joined, "enriched", output_mode="complete")
    q.processAllAvailable()
    rows = {r["name"]: r["sum(v)"] for r in spark.sql("SELECT * FROM enriched").collect()}
    q.stop()
    assert rows == {"one": 40.0, "two": 20.0}
