"""As-of join and range join (operators/joins.py) vs pandas/DuckDB ground
truth. The reference family exposes these as dedicated operators; Spark
has no native ASOF/interval join, so we verify the union-window and
bucketed-explode compositions bit-for-bit against engines that do.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from dask_sql_spark.operators.joins import asof_join, range_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def asof_frames(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "ts": [_ts(10), _ts(12), _ts(8), _ts(11), _ts(9)],
            "v": [100, 200, 50, 300, 400],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ts": [_ts(9), _ts(10), _ts(11, 30), _ts(12)],
            "p": [1, 2, 3, 4],
        }
    )
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def test_asof_backward_matches_duckdb(spark, asof_frames):
    sl, sr, pl, pr = asof_frames
    got = (
        asof_join(sl, sr, on="ts", by="k")
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", pl)
    con.register("r", pr)
    want = con.execute(
        """
        SELECT l.k, l.ts, l.v, r.p AS right_p, r.ts AS right_ts
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        ORDER BY l.k, l.ts
        """
    ).df()
    assert list(got["k"]) == list(want["k"])
    assert list(got["right_p"].fillna(-1)) == list(want["right_p"].fillna(-1))
    assert list(got["right_ts"].fillna(_ts(0))) == list(
        want["right_ts"].fillna(_ts(0))
    )


def test_asof_matches_pandas_merge_asof(spark, asof_frames):
    sl, sr, pl, pr = asof_frames
    got = (
        asof_join(sl, sr, on="ts", by="k")
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        pl.sort_values("ts"),
        pr.sort_values("ts").rename(columns={"ts": "right_ts", "p": "right_p"}),
        left_on="ts",
        right_on="right_ts",
        by="k",
        direction="backward",
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(got["right_p"].fillna(-1)) == list(want["right_p"].fillna(-1))


def test_asof_forward_and_tolerance(spark, asof_frames):
    sl, sr, pl, pr = asof_frames
    fwd = (
        asof_join(sl, sr, on="ts", by="k", direction="forward")
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        pl.sort_values("ts"),
        pr.sort_values("ts").rename(columns={"ts": "right_ts", "p": "right_p"}),
        left_on="ts",
        right_on="right_ts",
        by="k",
        direction="forward",
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(fwd["right_p"].fillna(-1)) == list(want["right_p"].fillna(-1))

    # 1-hour tolerance: k=1 @12:00 matched 11:30 (keep); @10:00 matched
    # 10:00 (keep, gap 0); @8:00 has no backward match at all.
    tol = (
        asof_join(sl, sr, on="ts", by="k", tolerance_seconds=3600)
        .toPandas()
        .set_index(["k", "ts"])
    )
    assert tol.loc[(1, _ts(12)), "right_p"] == 3
    assert tol.loc[(1, _ts(10)), "right_p"] == 2
    assert pd.isna(tol.loc[(1, _ts(8)), "right_p"])
    # k=2 @11:00: only right row is 12:00 (forward of it) → no backward match
    assert pd.isna(tol.loc[(2, _ts(11)), "right_p"])


def test_asof_subsecond_tolerance(spark):
    """r9 audit fix: the tolerance gap is integer MICROseconds — a 0.9 s
    gap must fail a 0.5 s tolerance (the old unix_timestamp arithmetic
    truncated both to whole seconds, so 0.9 s ≤ 0.5 s 'passed'). Matches
    pandas merge_asof(tolerance=...) behavior."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(seconds=10))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, t0 - dt.timedelta(milliseconds=900), 11),  # gap 0.9s
            (2, t0 + dt.timedelta(seconds=10) - dt.timedelta(milliseconds=400), 22),
        ],
        "k int, ts timestamp, p int",
    )
    out = (
        asof_join(left, right, on="ts", by="k", tolerance_seconds=0.5)
        .toPandas()
        .set_index("k")
    )
    assert pd.isna(out.loc[1, "right_p"])  # 0.9s > 0.5s: nulled
    assert out.loc[2, "right_p"] == 22     # 0.4s <= 0.5s: kept


def test_asof_no_by_keys(spark):
    left = spark.createDataFrame(pd.DataFrame({"ts": [_ts(10), _ts(11)], "v": [1, 2]}))
    right = spark.createDataFrame(
        pd.DataFrame({"ts": [_ts(9), _ts(10, 30)], "p": [7, 8]})
    )
    got = asof_join(left, right, on="ts").toPandas().sort_values("ts")
    assert list(got["right_p"]) == [7, 8]


def test_range_join_matches_plain_inequality_join(spark):
    points = pd.DataFrame({"pid": range(20), "x": [i * 7 % 50 for i in range(20)]})
    intervals = pd.DataFrame(
        {"iid": [0, 1, 2], "lo": [0, 10, 45], "hi": [5, 30, 49]}
    )
    got = (
        range_join(
            spark.createDataFrame(points),
            spark.createDataFrame(intervals),
            point_col="x",
            start_col="lo",
            end_col="hi",
            bucket_width=8,
        )
        .toPandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("p", points)
    con.register("i", intervals)
    want = con.execute(
        "SELECT p.*, i.* FROM p JOIN i ON p.x BETWEEN i.lo AND i.hi "
        "ORDER BY pid, iid"
    ).df()
    assert got[["pid", "iid"]].values.tolist() == want[["pid", "iid"]].values.tolist()


def test_range_join_extra_keys_no_duplicates(spark):
    points = pd.DataFrame(
        {"g": [0, 0, 1, 1], "x": [5, 15, 5, 15], "pid": [0, 1, 2, 3]}
    )
    intervals = pd.DataFrame({"g": [0, 1], "lo": [0, 10], "hi": [20, 20]})
    got = (
        range_join(
            spark.createDataFrame(points),
            spark.createDataFrame(intervals),
            point_col="x",
            start_col="lo",
            end_col="hi",
            bucket_width=4,  # intervals span several buckets — still no dups
            extra_on=["g"],
        )
        .toPandas()
        .sort_values("pid")
    )
    assert list(got["pid"]) == [0, 1, 3]
    assert len(got) == len(got.drop_duplicates())


def test_scd2_apply_closes_and_versions(spark):
    """SCD2: changed attrs close the current row and append a new
    version; unchanged and un-updated keys pass through; brand-new keys
    insert; intra-batch history collapses to the latest update."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dask_sql_spark.operators.scd import scd2_apply

    d0 = dt.date(2020, 1, 1)
    dim = spark.createDataFrame(
        [
            (1, "BUILDING", d0, None),
            (2, "MACHINERY", d0, None),
            (3, "AUTOMOBILE", d0, None),
            (1, "FURNITURE", dt.date(2019, 1, 1), d0),  # history row
        ],
        "k LONG, segment STRING, valid_from DATE, valid_to DATE",
    )
    up = dt.date(2024, 6, 1)
    updates = spark.createDataFrame(
        [
            (1, "HOUSEHOLD", dt.date(2024, 5, 1)),  # superseded in batch
            (1, "HOUSEHOLD2", up),                  # latest wins
            (2, "MACHINERY", up),                   # identical → no-op
            (9, "NEWSEG", up),                      # brand-new key
        ],
        "k LONG, segment STRING, ts DATE",
    )
    out = scd2_apply(dim, updates, "k", ["segment"], ts_col="ts")
    rows = {(r.k, r.segment): (r.valid_from, r.valid_to) for r in out.collect()}
    assert len(rows) == 6
    assert rows[(1, "FURNITURE")] == (dt.date(2019, 1, 1), d0)  # history kept
    assert rows[(1, "BUILDING")] == (d0, up)                    # closed
    assert rows[(1, "HOUSEHOLD2")] == (up, None)                # new version
    assert rows[(2, "MACHINERY")] == (d0, None)                 # no-op kept
    assert rows[(3, "AUTOMOBILE")] == (d0, None)                # untouched
    assert rows[(9, "NEWSEG")] == (up, None)                    # insert


def test_nearest_join_directions_and_tolerance(spark):
    import datetime as dt

    from dask_sql_spark.operators.joins import nearest_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=10)),   # nearer to r@9 than r@12
            (1, t0 + dt.timedelta(minutes=11, seconds=30)),  # nearer to r@12
            (1, t0 + dt.timedelta(hours=9)),       # beyond 2h tolerance
            (2, t0),                               # user with no right rows
        ],
        "user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=9), 90.0),
            (1, t0 + dt.timedelta(minutes=12), 120.0),
        ],
        "user_id LONG, ts TIMESTAMP, val DOUBLE",
    )
    out = {
        (r.user_id, r.ts): r
        for r in nearest_join(
            left, right, on="ts", by="user_id", tolerance_seconds=7200
        ).collect()
    }
    assert out[(1, t0 + dt.timedelta(minutes=10))].right_val == 90.0
    assert out[(1, t0 + dt.timedelta(minutes=11, seconds=30))].right_val == 120.0
    assert out[(1, t0 + dt.timedelta(hours=9))].right_val is None
    assert out[(2, t0)].right_val is None
    # exact tie prefers the backward match
    tie = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10, seconds=30))],
        "user_id LONG, ts TIMESTAMP",
    )
    r = nearest_join(tie, right, on="ts", by="user_id").collect()[0]
    assert r.right_val == 90.0


def test_asof_family_differential_vs_pandas(spark):
    """r9 audit: seeded differential sweep of the whole as-of family
    (backward/forward/nearest × tolerance × duplicate keys × empty right
    side) against pandas merge_asof — 45 comparisons. Guards boundary
    semantics (ties at the timestamp, no-candidate partitions,
    tolerance edges) against future plan rewrites."""
    import datetime as dt
    import random

    from dask_sql_spark.operators.joins import nearest_join

    t0 = dt.datetime(2024, 1, 1)
    rng = random.Random(42)
    for trial in range(15):
        nl, nr = rng.randint(1, 6), rng.randint(0, 6)
        pl = pd.DataFrame(
            {
                "k": pd.array([rng.choice([1, 2]) for _ in range(nl)], dtype="int64"),
                "ts": [t0 + dt.timedelta(seconds=rng.randint(0, 20)) for _ in range(nl)],
            }
        ).drop_duplicates(["k", "ts"]).sort_values(["k", "ts"]).reset_index(drop=True)
        pr = pd.DataFrame(
            {
                "k": pd.array([rng.choice([1, 2]) for _ in range(nr)], dtype="int64"),
                "ts": pd.to_datetime(
                    [t0 + dt.timedelta(seconds=rng.randint(0, 20)) for _ in range(nr)]
                ),
                "p": pd.array(list(range(nr)), dtype="int64"),
            }
        ).drop_duplicates(["k", "ts"]).sort_values(["k", "ts"]).reset_index(drop=True)
        sl = spark.createDataFrame(pl)
        sr = (
            spark.createDataFrame(pr)
            if len(pr)
            else spark.createDataFrame([], "k bigint, ts timestamp, p bigint")
        )

        def oracle(direction, tol):
            return pd.merge_asof(
                pl.sort_values("ts"),
                pr.sort_values("ts").rename(
                    columns={"ts": "right_ts", "p": "right_p"}
                ),
                left_on="ts", right_on="right_ts", by="k", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            ).sort_values(["k", "ts"]).reset_index(drop=True)

        for direction in ("backward", "forward"):
            tol = rng.choice([None, 3, 7])
            got = (
                asof_join(sl, sr, on="ts", by="k", direction=direction,
                          tolerance_seconds=tol)
                .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
            )
            want = oracle(direction, tol)
            assert list(got["right_p"].fillna(-1)) == list(
                want["right_p"].fillna(-1)
            ), f"asof {direction} tol={tol} trial={trial}"
        tol = rng.choice([None, 3, 7])
        got = (
            nearest_join(sl, sr, on="ts", by="k", tolerance_seconds=tol)
            .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
        )
        want = oracle("nearest", tol)
        assert list(got["right_p"].fillna(-1)) == list(
            want["right_p"].fillna(-1)
        ), f"nearest tol={tol} trial={trial}"
