"""Round-9 adversarial audit of the table-maintenance layer: seeded
differential sweeps of scd2_apply / snapshot_diff / refresh_aggregate
against plain-pandas models, plus pinned regressions for the audit
findings:

- ``snapshot_diff`` classified an all-NULL key present in BOTH
  snapshots as 'insert' (presence was inferred from key NULL-ness while
  the join pairs NULL keys via <=>); presence markers fix it.
- ``scd2_apply`` broadcast the update batch unconditionally (OOM hazard
  for backfill-sized batches) and picked an engine-dependent winner
  among duplicate (key, ts) updates; now ``broadcast_updates=False``
  and ``tiebreak_col`` are available.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest


# -------------------------------------------------------------- snapshot_diff


def _diff_model(old: pd.DataFrame, new: pd.DataFrame, keys: list[str],
                cmp_cols: list[str]) -> dict[tuple, str]:
    def ix(df):
        return {
            tuple(r[k] for k in keys): tuple(r[c] for c in cmp_cols)
            for _, r in df.iterrows()
        }

    o, n = ix(old), ix(new)
    out = {}
    for k in set(o) | set(n):
        if k not in o:
            out[k] = "insert"
        elif k not in n:
            out[k] = "delete"
        else:
            eq = all(
                (pd.isna(a) and pd.isna(b)) or a == b
                for a, b in zip(o[k], n[k])
            )
            out[k] = "same" if eq else "change"
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_snapshot_diff_differential_null_keys(spark, seed):
    from dask_sql_spark.operators.diff import snapshot_diff

    rng = random.Random(seed)
    keyspace = [None, 1, 2, 3, 4, 5, 6]

    def snap():
        ks = rng.sample(keyspace, rng.randrange(3, len(keyspace)))
        return pd.DataFrame(
            {
                "k": pd.array(ks, dtype="Int64"),
                "v": [rng.choice([None, "x", "y"]) for _ in ks],
                "w": [rng.choice([None, 1.5, 2.5]) for _ in ks],
            }
        )

    old, new = snap(), snap()
    sold = spark.createDataFrame(old.astype(object).where(old.notna(), None),
                                 "k long, v string, w double")
    snew = spark.createDataFrame(new.astype(object).where(new.notna(), None),
                                 "k long, v string, w double")
    got = {
        (None if r["k"] is None else int(r["k"]),): r["change"]
        for r in snapshot_diff(sold, snew, ["k"]).collect()
    }
    want = {
        (None if pd.isna(k[0]) else int(k[0]),): v
        for k, v in _diff_model(old, new, ["k"], ["v", "w"]).items()
    }
    assert got == want


def test_snapshot_diff_null_key_same_pinned(spark):
    """Pinned round-9 finding: identical all-NULL-key rows in both
    snapshots are 'same', not 'insert'."""
    from dask_sql_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(None, "a"), (1, "b")], "k int, v string")
    new = spark.createDataFrame([(None, "a"), (1, "c")], "k int, v string")
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {None: "same", 1: "change"}


def test_snapshot_diff_composite_partial_null_keys(spark):
    """Composite keys with one NULL component are still one identity."""
    from dask_sql_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "a"), (None, None, "z")], "k1 int, k2 int, v string"
    )
    new = spark.createDataFrame(
        [(1, None, "b"), (None, None, "z")], "k1 int, k2 int, v string"
    )
    got = {
        (r["k1"], r["k2"]): r["change"]
        for r in snapshot_diff(old, new, ["k1", "k2"]).collect()
    }
    assert got == {(1, None): "change", (None, None): "same"}


# ----------------------------------------------------------------- scd2_apply


def _scd2_model(dim: list[dict], updates: list[dict], tracked: list[str]):
    """dim rows: k, attrs, valid_from, valid_to. Latest update per key by
    (ts desc, seq desc)."""
    latest: dict = {}
    for u in updates:
        k = u["k"]
        if k not in latest or (u["ts"], u["seq"]) > (
            latest[k]["ts"], latest[k]["seq"]
        ):
            latest[k] = u
    out = [dict(r) for r in dim if r["valid_to"] is not None]  # history
    cur = {r["k"]: r for r in dim if r["valid_to"] is None}
    for k, r in cur.items():
        u = latest.get(k)
        if u is not None and any(
            not (
                (r[c] is None and u[c] is None) or r[c] == u[c]
            )
            for c in tracked
        ):
            closed = dict(r)
            closed["valid_to"] = u["ts"]
            out.append(closed)
        else:
            out.append(dict(r))
    for k, u in latest.items():
        r = cur.get(k)
        if r is None or any(
            not ((r[c] is None and u[c] is None) or r[c] == u[c])
            for c in tracked
        ):
            out.append(
                {"k": k, **{c: u[c] for c in tracked},
                 "valid_from": u["ts"], "valid_to": None}
            )
    return out


@pytest.mark.parametrize("seed,broadcast", [(0, True), (1, False), (2, True),
                                            (3, False)])
def test_scd2_apply_differential(spark, seed, broadcast):
    from dask_sql_spark.operators.scd import scd2_apply

    rng = random.Random(seed)
    t0 = dt.datetime(2021, 1, 1)
    keys = list(range(8))
    dim_rows = []
    for k in rng.sample(keys, 6):
        n_hist = rng.randrange(0, 3)
        for h in range(n_hist):
            dim_rows.append(
                {"k": k, "segment": rng.choice([None, "a", "b"]),
                 "valid_from": t0 + dt.timedelta(days=h),
                 "valid_to": t0 + dt.timedelta(days=h + 1)}
            )
        dim_rows.append(
            {"k": k, "segment": rng.choice([None, "a", "b"]),
             "valid_from": t0 + dt.timedelta(days=n_hist),
             "valid_to": None}
        )
    upd_rows = [
        {"k": rng.choice(keys), "segment": rng.choice([None, "a", "b", "c"]),
         # coarse ts lattice → duplicate (k, ts) pairs exercised
         "ts": t0 + dt.timedelta(days=10 + rng.randrange(2)), "seq": i}
        for i in range(10)
    ]
    dim = spark.createDataFrame(
        pd.DataFrame(dim_rows),
        "k long, segment string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        pd.DataFrame(upd_rows),
        "k long, segment string, ts timestamp, seq long",
    )
    got = sorted(
        (
            (r["k"], r["segment"], r["valid_from"], r["valid_to"])
            for r in scd2_apply(
                dim, updates, "k", ["segment"],
                broadcast_updates=broadcast, tiebreak_col="seq",
            ).collect()
        ),
        key=str,
    )
    want = sorted(
        (
            (r["k"], r["segment"], r["valid_from"], r["valid_to"])
            for r in _scd2_model(dim_rows, upd_rows, ["segment"])
        ),
        key=str,
    )
    assert got == want


# ---------------------------------------------------------- refresh_aggregate


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_refresh_aggregate_differential(spark, seed):
    """Folding N delta batches one at a time equals a full recompute —
    integer measures so the check is exact, NULL measures included."""
    from dask_sql_spark.operators.diff import refresh_aggregate
    from pyspark.sql import functions as F

    rng = random.Random(seed)

    def batch(n):
        return pd.DataFrame(
            {
                "g": [rng.choice(["a", "b", "c", None]) for _ in range(n)],
                "v": pd.array(
                    [rng.choice([None, 1, 2, 5]) for _ in range(n)],
                    dtype="Int64",
                ),
            }
        )

    batches = [batch(rng.randrange(1, 12)) for _ in range(4)]
    base = spark.createDataFrame(batches[0], "g string, v long")
    agg = base.groupBy("g").agg(
        F.sum("v").alias("v"), F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    for b in batches[1:]:
        delta = spark.createDataFrame(b, "g string, v long")
        agg = refresh_aggregate(agg, delta, ["g"], ["v"])
    got = {
        r["g"]: (r["v"], r["n_rows"]) for r in agg.collect()
    }
    allb = pd.concat(batches, ignore_index=True)
    want = {}
    for g, grp in allb.groupby("g", dropna=False):
        key = None if pd.isna(g) else g
        s = grp["v"].dropna().sum()
        want[key] = (
            None if grp["v"].dropna().empty else int(s), len(grp)
        )
    assert got == want


def test_scd2_broadcast_updates_broadcasts_both_joins(spark):
    """Round-10 advisor fix, pinned: with broadcast_updates=True the
    INSERT join is broadcastable too. `latest` is the preserved side of
    a right-outer join — Spark never builds the preserved side, so the
    old hint on it was silently ignored and the join shuffled. The fix
    shrinks the dimension side with a broadcast semi-join on the update
    keys, then broadcasts the shrunk side (RightOuter, BuildLeft): the
    whole scd2 plan runs without a single sort-merge join."""
    from dask_sql_spark.operators.scd import scd2_apply

    t0 = dt.datetime(2021, 1, 1)
    dim = spark.createDataFrame(
        pd.DataFrame(
            [{"k": 1, "segment": "a", "valid_from": t0, "valid_to": None}]
        ),
        "k long, segment string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            [{"k": 1, "segment": "b", "ts": t0 + dt.timedelta(days=1)},
             {"k": 2, "segment": "c", "ts": t0 + dt.timedelta(days=1)}]
        ),
        "k long, segment string, ts timestamp",
    )
    out = scd2_apply(dim, updates, "k", ["segment"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "RightOuter, BuildLeft" in plan, plan
    # semantics unchanged: new key 2 still null-extends through
    got = sorted(
        (r["k"], r["segment"], r["valid_to"] is None)
        for r in out.collect()
    )
    assert got == [(1, "a", False), (1, "b", True), (2, "c", True)]
