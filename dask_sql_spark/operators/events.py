"""Event-sequence analytics: funnels and retention cohorts.

Companions to the sessionization query (SURVEY §7 M6 events coverage) —
the two reports every product-analytics workload runs over an events
table. Both are compositions of aggregates and key joins (shuffle on
user_id only), expressible identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel completion per user: for step k, the earliest event
    of type ``steps[k]`` strictly after the user's step-k-1 time.

    Output: (user, step_1_ts … step_n_ts, funnel_depth). One aggregate per
    step over a join back to the events table keyed on the user — at scale
    each stage is a shuffle on ``user_col`` only, and AQE broadcasts the
    (users × 1 row) step frame against the events scan.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(cur.select(user_col, f"step_{k - 1}_ts"), user_col)
            .where(F.col(ts_col) > F.col(f"step_{k - 1}_ts"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step_{k}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
    depth = F.lit(0)
    for k in range(1, len(steps) + 1):
        depth = depth + F.when(
            F.col(f"step_{k}_ts").isNotNull(), F.lit(1)
        ).otherwise(F.lit(0))
    return cur.withColumn("funnel_depth", depth.cast("int"))


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
