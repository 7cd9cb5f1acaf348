"""Event-sequence analytics: funnels and retention cohorts.

Companions to the sessionization query (SURVEY §7 M6 events coverage) —
the two reports every product-analytics workload runs over an events
table. Both are compositions of aggregates and key joins (shuffle on
user_id only), expressible identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: Column | str) -> Column:
    """Integer microseconds since epoch, tolerant of TIMESTAMP_NTZ input
    (parquet nano-timestamp columns surface as NTZ): cast to session-TZ
    timestamp first — a no-op for plain TIMESTAMP, and exact under the
    Context's pinned UTC session zone (context.py:77)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion per user: for step k, the earliest event
    of type ``steps[k]`` strictly after the user's step-k-1 time.

    Output: (user, step_1_ts … step_n_ts, funnel_depth). ONE events scan
    and ONE user_col shuffle for ANY number of steps: each later step's
    timestamps collect into a per-user array (bounded by per-user
    activity) in a single aggregate, and the sequential
    min-strictly-after chain becomes array min-over-filter projections.
    The join-per-step form scanned events k times (2k−1 counting the
    chain joins) — a fact-table multiplier that has no business
    surviving at 100 TB.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    aggs = [
        F.min(F.when(F.col(type_col) == steps[0], F.col(ts_col))).alias(
            "step_1_ts"
        )
    ]
    for k, step in enumerate(steps[1:], start=2):
        aggs.append(
            F.collect_list(
                F.when(F.col(type_col) == step, F.col(ts_col))
            ).alias(f"_a{k}")
        )
    cur = (
        events.where(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(*aggs)
        .where(F.col("step_1_ts").isNotNull())
    )
    for k in range(2, len(steps) + 1):
        prev = F.col(f"step_{k - 1}_ts")
        cur = cur.withColumn(
            f"step_{k}_ts",
            F.array_min(F.filter(F.col(f"_a{k}"), lambda x: x > prev)),
        ).drop(f"_a{k}")
    depth = F.lit(0)
    for k in range(1, len(steps) + 1):
        depth = depth + F.when(
            F.col(f"step_{k}_ts").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.withColumn("funnel_depth", depth.cast("int"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    since their previous event exceeds ``gap_seconds``. Returns one row
    per session: (user, session_seq, session_start, session_end,
    n_events, duration_secs).

    Plan shape: ONE shuffle on ``user_col``; the lag + cumulative-sum
    windows and the session aggregate all reuse that partitioning
    (Catalyst collapses them into a single sort within the exchange).
    Gaps are computed in integer microseconds (``unix_micros``) so the
    boundary test is exact and engine-portable — float epoch seconds
    would make borderline gaps nondeterministic.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = _epoch_us(ts_col)
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > F.lit(int(gap_seconds) * 1_000_000)), 1
    ).otherwise(0)
    tagged = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return tagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (_epoch_us(F.max(ts_col)) - _epoch_us(F.min(ts_col)))
            / 1_000_000.0
        ).alias("duration_secs"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order transition counts (Markov edges) between consecutive
    event types within each user's timeline: (from_type, to_type, n).
    The terminal event of each user maps to to_type NULL, kept so the
    out-degree of every type sums to its event count.

    With duplicate (user, ts) pairs the within-tie order — hence the
    edge counts — is engine-dependent; pass ``tiebreak_col`` (e.g. the
    event id) to make the timeline total-ordered and the counts
    deterministic (round-9 events audit; the default stays ts-only so
    existing plans are unchanged — the bundled events tables have no
    (user, ts) duplicates).

    One shuffle on ``user_col`` for the lead window, then a count
    aggregate on the (from, to) pair — map-side partial agg applies.
    """
    from pyspark.sql.window import Window

    order = [ts_col] if tiebreak_col is None else [ts_col, tiebreak_col]
    w = Window.partitionBy(user_col).orderBy(*order)
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohorted retention: users grouped by first-activity period, counted
    by how many periods later they return.

    Output: (cohort_period, periods_later, n_users). Two shuffles total:
    first-activity per user, then the (cohort, offset) count.
    """
    firsts = events.groupBy(user_col).agg(F.min(ts_col).alias("first_ts"))
    joined = events.select(user_col, ts_col).join(firsts, user_col)
    day = lambda c: F.floor(F.unix_timestamp(c) / 86400)  # noqa: E731
    return (
        joined.select(
            user_col,
            F.floor(day(F.col("first_ts")) / period_days).alias("cohort_period"),
            F.floor(
                (day(F.col(ts_col)) - day(F.col("first_ts"))) / period_days
            ).alias("periods_later"),
        )
        .distinct()
        .groupBy("cohort_period", "periods_later")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_INTERVAL_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


def parse_interval_seconds(every: str) -> int:
    """'15 minutes' / '1 hour' / '2 days' → whole seconds. Sub-second and
    calendar (month/year) steps are rejected: months are variable-length,
    so an epoch-aligned bucket grid cannot represent them."""
    parts = every.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"interval must be '<n> <unit>', got {every!r}")
    n_str, unit = parts
    unit = unit.rstrip("s")
    if unit not in _INTERVAL_UNIT_SECONDS:
        raise ValueError(
            f"unsupported interval unit {unit!r}; one of "
            f"{sorted(_INTERVAL_UNIT_SECONDS)}"
        )
    n = int(n_str)
    if n <= 0:
        raise ValueError(f"interval count must be positive, got {n}")
    return n * _INTERVAL_UNIT_SECONDS[unit]


def resample_fill(
    events: DataFrame,
    every: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key time-series resampling with forward fill: build a dense
    bucket spine from each key's first to last event, attach the latest
    observed value per bucket, and forward-fill the gaps. Buckets before
    a key's first observation keep NULL. Output: (key, bucket, n_events,
    filled_value).

    ``every`` is any whole-second interval ('30 seconds', '15 minutes',
    '1 hour', '1 day', …); buckets are epoch-aligned FLOOR buckets
    (``ts - pmod(ts, step)``), which coincides with ``date_trunc`` for
    the usual steps that divide a day evenly — including pre-1970
    timestamps, where a plain ``%`` (sign-of-dividend in both Spark and
    DuckDB) would round toward zero and shift events one bucket late
    (round-9 audit finding: 1969-12-31 22:30 bucketed to 23:00 instead
    of 22:00 under ``%``).

    Spark has no native resample/gap-fill; this is the gap-explode
    composition: ONE groupBy to per-(key, bucket) aggregates, one window
    over those (compact — one row per PRESENT bucket) computing the
    forward-fill and each bucket's successor, then each present bucket
    ``sequence``+``explode``s itself plus its trailing gap buckets,
    carrying its fill value with it. The dense output — the largest
    relation by far, time-range/step rows per key — is born AFTER the
    last shuffle and flows straight to the consumer. The previous
    spine-join form (dense spine LEFT JOIN aggregates, then a
    forward-fill window over the DENSE rows) shuffled and sorted the
    output-sized relation twice; at sf1/15-min (41M output rows) that
    measured 25.0 s vs 0.97 s for this plan, bitwise-equal results.
    """
    step = parse_interval_seconds(every)
    step_us = step * 1_000_000

    def to_bucket(c: Column) -> Column:
        us = _epoch_us(c)
        # pmod, not %: floor-aligned buckets for negative (pre-epoch) us
        return F.timestamp_micros(us - F.pmod(us, F.lit(step_us)))

    from pyspark.sql.window import Window

    # NULL-ts events are excluded up front: the spine-join form this
    # plan replaced could never match them (no NULL bucket in a
    # sequence-built spine), while here a NULL bucket would sort FIRST
    # in the forward-fill window and could seed later buckets' fill
    bucketed = events.where(F.col(ts_col).isNotNull()).groupBy(
        user_col, to_bucket(F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by(value_col, ts_col).alias("__last_v"),
    )
    # both windows share (partition, order) → one physical sort
    w_cum = (
        Window.partitionBy(user_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy(user_col).orderBy("bucket")
    iv = F.expr(f"INTERVAL {step} SECOND")
    with_gaps = bucketed.select(
        user_col,
        F.col("bucket").alias("__b0"),
        "n_events",
        # ignorenulls: a present bucket whose last value is NULL inherits
        # the previous fill, exactly like the spine-window form
        F.last("__last_v", ignorenulls=True).over(w_cum).alias("__fill"),
        F.lead("bucket").over(w_lead).alias("__next"),
    )
    return with_gaps.select(
        user_col,
        "__b0",
        "n_events",
        "__fill",
        F.explode(
            F.sequence(
                F.col("__b0"),
                F.coalesce(F.col("__next") - iv, F.col("__b0")),
                iv,
            )
        ).alias("bucket"),
    ).select(
        user_col,
        "bucket",
        F.when(F.col("bucket") == F.col("__b0"), F.col("n_events"))
        .otherwise(F.lit(0))
        .alias("n_events"),
        F.col("__fill").alias("filled_value"),
    )


def session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k user-journey paths: sessionize (same gap logic as
    :func:`sessionize`), serialize each session's ordered event types
    into a '>'-joined path, count identical journeys, keep the ``k``
    most common (ties → path asc).

    Path order is (ts, id) — the id tiebreak makes simultaneous events
    deterministic, so the path strings are engine-portable (DuckDB
    string_agg ORDER BY twin). Plan: the sessionize shuffle on user,
    one hash aggregate on path (map-side combined), top-k. The path
    build uses collect_list of (ts, id, type) structs + array_sort —
    per-session data only, never a global sort.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _epoch_us(ts_col)
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > F.lit(int(gap_seconds) * 1_000_000)), 1
    ).otherwise(0)
    tagged = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = tagged.groupBy(user_col, "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(id_col).alias("i"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ),
                lambda s: s["e"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(k)
    )


def touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touch: str = "click",
    max_lag_s: int = 7 * 86400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing attribution for conversion events: per ``conversion``
    event, the user's lifetime FIRST ``touch`` event and the LAST touch
    at-or-before the conversion, the latter credited only when it falls
    within ``max_lag_s`` seconds (the attribution window).

    Plan shape: ONE shuffle on ``user_col`` serves a single running
    window (ROWS UNBOUNDED PRECEDING .. CURRENT ROW) carrying
    first/last touch id and timestamp with IGNORE NULLS — no
    self-join of the events table, no per-conversion range scan. Lag
    math is integer microseconds (``unix_micros`` / DuckDB
    ``epoch_us``), exact on sub-second timestamps where seconds-level
    ``unix_timestamp`` truncation would diverge cross-engine.

    Output: (event_id, user_id, ts, value, first_touch_id,
    last_touch_id, last_touch_lag_s) — touch columns NULL when the user
    has no prior touch / none within the window.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col(type_col) == touch
    touch_id = F.when(is_touch, F.col(id_col))
    touch_ts = F.when(is_touch, F.col(ts_col))
    lag_us = _epoch_us(ts_col) - _epoch_us(F.col("last_ts"))
    in_window = F.col("last_ts").isNotNull() & (
        lag_us <= max_lag_s * 1_000_000
    )
    return (
        events.withColumn("first_touch_id", F.first(touch_id, True).over(w))
        .withColumn("last_id", F.last(touch_id, True).over(w))
        .withColumn("last_ts", F.last(touch_ts, True).over(w))
        .where(F.col(type_col) == conversion)
        .withColumn(
            "last_touch_id", F.when(in_window, F.col("last_id"))
        )
        .withColumn(
            "last_touch_lag_s",
            F.when(in_window, (lag_us / F.lit(1_000_000)).cast("double")),
        )
        .select(
            id_col, user_col, ts_col, value_col,
            "first_touch_id", "last_touch_id", "last_touch_lag_s",
        )
    )
