"""Round-9 adversarial audit of the events layer: seeded differential
sweeps of every events.py operator against plain-pandas models.

The generator is hostile on purpose: duplicate (user, ts) pairs, exact
gap-boundary spacing, sub-second microsecond offsets, pre-epoch
timestamps, NULL values, single-event users, and users whose whole
timeline is one tie. Each sweep compares full result sets, not spot
rows. Findings fixed under this audit:

- ``resample_fill`` bucketed pre-epoch timestamps one bucket late
  (``%`` is sign-of-dividend in Spark and DuckDB; now ``pmod``).
- ``event_transitions`` edge counts were engine-dependent under
  duplicate (user, ts); a ``tiebreak_col`` makes them total-ordered.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

EPOCH = dt.datetime(1970, 1, 1)


def _gen_events(seed: int, n_users: int = 6, n_events: int = 120,
                pre_epoch: bool = False) -> pd.DataFrame:
    """Hostile event log: tie-heavy timestamps on a coarse lattice with
    occasional microsecond jitter and exact 1800-second gaps."""
    rng = random.Random(seed)
    base = dt.datetime(1969, 12, 31, 12, 0) if pre_epoch else dt.datetime(
        2021, 3, 1
    )
    rows = []
    for i in range(n_events):
        u = f"u{rng.randrange(n_users)}"
        # coarse lattice -> plenty of exact ties and exact-gap pairs
        secs = rng.choice([0, 1, 2, 1800, 1801, 3600, 86400]) * rng.randrange(4)
        us = rng.choice([0, 0, 0, 1, 999_999])
        ts = base + dt.timedelta(seconds=secs, microseconds=us)
        typ = rng.choice(["view", "cart", "purchase", "click"])
        val = None if rng.random() < 0.2 else round(rng.uniform(0, 50), 2)
        rows.append((f"e{i:04d}", u, typ, ts, val))
    # a user whose entire timeline is one tie, and a single-event user
    tie = base + dt.timedelta(seconds=42)
    rows += [(f"t{k}", "u_tie", t, tie, 1.0 * k)
             for k, t in enumerate(["view", "cart", "purchase"])]
    rows.append(("solo", "u_solo", "view", base, 7.5))
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    )


def _spark_df(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(
        pdf, "event_id string, user_id string, event_type string, "
        "ts timestamp, value double"
    )


# ---------------------------------------------------------------- sessionize


def _sessionize_model(pdf: pd.DataFrame, gap_s: int) -> pd.DataFrame:
    out = []
    for u, g in pdf.sort_values(["user_id", "ts"]).groupby("user_id"):
        seq, prev = 0, None
        cur = []
        for ts in g["ts"]:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                if cur:
                    out.append((u, seq, min(cur), max(cur), len(cur)))
                seq += 1
                cur = []
            cur.append(ts)
            prev = ts
        if cur:
            out.append((u, seq, min(cur), max(cur), len(cur)))
    return pd.DataFrame(
        out, columns=["user_id", "session_seq", "session_start",
                      "session_end", "n_events"],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sessionize_differential(spark, seed):
    from dask_sql_spark.operators.events import sessionize

    pdf = _gen_events(seed)
    got = (
        sessionize(_spark_df(spark, pdf), gap_seconds=1800)
        .toPandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    want = _sessionize_model(pdf, 1800)
    # session boundaries depend only on ts (ties share a session), so the
    # per-session tuples are deterministic even with duplicate timestamps
    assert len(got) == len(want)
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["session_start"].tolist() == want["session_start"].tolist()
    assert got["session_end"].tolist() == want["session_end"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    dur = (want["session_end"] - want["session_start"]).dt.total_seconds()
    assert got["duration_secs"].tolist() == pytest.approx(dur.tolist())


# ---------------------------------------------------------------- funnel


def _funnel_model(pdf: pd.DataFrame, steps: list[str]) -> pd.DataFrame:
    out = []
    for u, g in pdf.groupby("user_id"):
        times = [None] * len(steps)
        s0 = g.loc[g["event_type"] == steps[0], "ts"]
        if s0.empty:
            continue
        times[0] = s0.min()
        for k in range(1, len(steps)):
            later = g.loc[
                (g["event_type"] == steps[k]) & (g["ts"] > times[k - 1]), "ts"
            ]
            if later.empty:
                break
            times[k] = later.min()
        depth = sum(t is not None for t in times)
        out.append((u, *times, depth))
    cols = ["user_id"] + [f"step_{k}_ts" for k in range(1, len(steps) + 1)]
    return pd.DataFrame(out, columns=cols + ["funnel_depth"])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_funnel_steps_differential(spark, seed):
    from dask_sql_spark.operators.events import funnel_steps

    steps = ["view", "cart", "purchase"]
    pdf = _gen_events(seed)
    got = (
        funnel_steps(_spark_df(spark, pdf), steps)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = _funnel_model(pdf, steps).sort_values("user_id").reset_index(
        drop=True
    )
    assert len(got) == len(want)
    for col in want.columns:
        g, w = got[col].tolist(), want[col].tolist()
        assert [
            None if pd.isna(x) else x for x in g
        ] == [None if pd.isna(x) else x for x in w], col


def test_funnel_repeated_step_type(spark):
    """steps may repeat a type: the second 'view' must bind to the first
    view strictly AFTER the first one, not the same event."""
    from dask_sql_spark.operators.events import funnel_steps

    t0 = dt.datetime(2021, 1, 1)
    pdf = pd.DataFrame(
        [("e1", "u1", "view", t0, 1.0),
         ("e2", "u1", "view", t0 + dt.timedelta(seconds=5), 1.0),
         ("e3", "u2", "view", t0, 1.0)],
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    got = (
        funnel_steps(_spark_df(spark, pdf), ["view", "view"])
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got.loc[0, "funnel_depth"] == 2
    assert got.loc[0, "step_2_ts"] == t0 + dt.timedelta(seconds=5)
    assert got.loc[1, "funnel_depth"] == 1
    assert pd.isna(got.loc[1, "step_2_ts"])


# ------------------------------------------------------------- transitions


def _transitions_model(pdf: pd.DataFrame) -> pd.DataFrame:
    pairs: dict[tuple, int] = {}
    for _, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:] + [None]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pd.DataFrame(
        [(a, b, n) for (a, b), n in pairs.items()],
        columns=["from_type", "to_type", "n"],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_event_transitions_differential_with_tiebreak(spark, seed):
    from dask_sql_spark.operators.events import event_transitions

    pdf = _gen_events(seed)
    got = (
        event_transitions(_spark_df(spark, pdf), tiebreak_col="event_id")
        .toPandas()
        .fillna({"to_type": "∅"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    want = (
        _transitions_model(pdf)
        .fillna({"to_type": "∅"})
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_like=True
    )


# --------------------------------------------------------------- retention


def _retention_model(pdf: pd.DataFrame, period_days: int) -> pd.DataFrame:
    day = lambda ts: int(ts.timestamp()) // 86400  # noqa: E731
    firsts = pdf.groupby("user_id")["ts"].min()
    seen = set()
    for _, r in pdf.iterrows():
        f = firsts[r["user_id"]]
        seen.add(
            (r["user_id"], day(f) // period_days,
             (day(r["ts"]) - day(f)) // period_days)
        )
    cnt: dict[tuple, int] = {}
    for _, c, p in seen:
        cnt[(c, p)] = cnt.get((c, p), 0) + 1
    return pd.DataFrame(
        [(c, p, n) for (c, p), n in cnt.items()],
        columns=["cohort_period", "periods_later", "n_users"],
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_retention_cohorts_differential(spark, seed):
    from dask_sql_spark.operators.events import retention_cohorts

    pdf = _gen_events(seed)  # post-epoch only: unix_timestamp trunc model
    got = (
        retention_cohorts(_spark_df(spark, pdf), period_days=7)
        .toPandas()
        .sort_values(["cohort_period", "periods_later"])
        .reset_index(drop=True)
    )
    want = (
        _retention_model(pdf, 7)
        .sort_values(["cohort_period", "periods_later"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------- resample_fill


def _resample_model(pdf: pd.DataFrame, step_s: int) -> pd.DataFrame:
    step_us = step_s * 1_000_000
    us = lambda ts: int(  # noqa: E731
        (ts - EPOCH) / dt.timedelta(microseconds=1)
    )
    bucket = lambda ts: EPOCH + dt.timedelta(  # noqa: E731
        microseconds=(us(ts) // step_us) * step_us  # floor, pre-epoch too
    )
    out = []
    for u, g in pdf.dropna(subset=["ts"]).groupby("user_id"):
        byb: dict[dt.datetime, list] = {}
        for _, r in g.iterrows():
            byb.setdefault(bucket(r["ts"]), []).append((r["ts"], r["value"]))
        lo, hi = min(byb), max(byb)
        fill = None
        b = lo
        while b <= hi:
            if b in byb:
                n = len(byb[b])
                last_v = max(byb[b], key=lambda p: p[0])[1]
                if last_v is not None and not pd.isna(last_v):
                    fill = last_v
            else:
                n = 0
            out.append((u, b, n, fill))
            b += dt.timedelta(seconds=step_s)
    return pd.DataFrame(
        out, columns=["user_id", "bucket", "n_events", "filled_value"]
    )


@pytest.mark.parametrize("seed,pre_epoch", [(0, False), (1, False),
                                            (2, True), (3, True)])
def test_resample_fill_differential(spark, seed, pre_epoch):
    from dask_sql_spark.operators.events import resample_fill

    pdf = _gen_events(seed, pre_epoch=pre_epoch)
    # unique ts per user: max_by(value, ts) is otherwise tie-ambiguous
    pdf = pdf[~pdf.duplicated(["user_id", "ts"], keep="first")]
    got = (
        resample_fill(_spark_df(spark, pdf), "1 hour")
        .toPandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        _resample_model(pdf, 3600)
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_resample_fill_pre_epoch_floor_bucket(spark):
    """Pinned round-9 finding: 1969-12-31 22:30 belongs to the 22:00
    bucket (date_trunc parity), not 23:00 as sign-of-dividend % gave."""
    from dask_sql_spark.operators.events import resample_fill

    pdf = pd.DataFrame(
        [("e1", "u", "view", dt.datetime(1969, 12, 31, 22, 30), 1.0)],
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    got = resample_fill(_spark_df(spark, pdf), "1 hour").toPandas()
    assert got["bucket"].tolist() == [dt.datetime(1969, 12, 31, 22, 0)]


# ------------------------------------------------------- touch_attribution


def _attribution_model(pdf: pd.DataFrame, conv: str, touch: str,
                       max_lag_s: int) -> pd.DataFrame:
    out = []
    for _, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        first_id, last_id, last_ts = None, None, None
        for _, r in g.iterrows():
            if r["event_type"] == touch:
                if first_id is None:
                    first_id = r["event_id"]
                last_id, last_ts = r["event_id"], r["ts"]
            if r["event_type"] == conv:
                # integer micros / 1e6, matching the operator exactly
                # (total_seconds() rounds differently in the last ulp)
                lag = (
                    ((r["ts"] - last_ts) // dt.timedelta(microseconds=1))
                    / 1_000_000
                    if last_ts is not None else None
                )
                ok = lag is not None and lag <= max_lag_s
                out.append(
                    (r["event_id"], r["user_id"], r["ts"], r["value"],
                     first_id, last_id if ok else None,
                     lag if ok else None)
                )
    return pd.DataFrame(
        out, columns=["event_id", "user_id", "ts", "value",
                      "first_touch_id", "last_touch_id", "last_touch_lag_s"],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_touch_attribution_differential(spark, seed):
    from dask_sql_spark.operators.events import touch_attribution

    pdf = _gen_events(seed)
    got = (
        touch_attribution(
            _spark_df(spark, pdf), conversion="purchase", touch="click",
            max_lag_s=3600,
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        _attribution_model(pdf, "purchase", "click", 3600)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in want.columns:
        g = [None if pd.isna(x) else x for x in got[col]]
        w = [None if pd.isna(x) else x for x in want[col]]
        assert g == w, col


# --------------------------------------------------- NULL-ts pinned behavior


def test_sessionize_null_ts_singleton_sessions(spark):
    """Documented quirk, pinned: NULL-ts events sort first (Spark ASC
    NULLS FIRST), every NULL gap starts a new session, so each NULL-ts
    event is its own session with NULL start/end — and the first real
    event after them also opens a fresh session."""
    from dask_sql_spark.operators.events import sessionize

    t0 = dt.datetime(2021, 1, 1)
    pdf = pd.DataFrame(
        [("e1", "u", "view", None, 1.0),
         ("e2", "u", "view", None, 1.0),
         ("e3", "u", "view", t0, 1.0)],
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    got = sessionize(_spark_df(spark, pdf)).toPandas()
    assert len(got) == 3
    real = got[got["session_start"].notna()]
    assert len(real) == 1 and real.iloc[0]["n_events"] == 1
