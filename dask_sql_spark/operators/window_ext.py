"""Window-frame extensions beyond Spark's native ROWS/RANGE.

GROUPS frames (SQL:2011 — frame bounds count *peer groups*, i.e. distinct
ORDER BY values, not rows or value ranges) are unsupported by Spark's
window exec. They are exactly expressible as a composition:

    dense_rank() over the same (partition, order)   →  integer group index
    RANGE frame over that integer index             →  peer-group bounds

because consecutive dense ranks are consecutive integers, an integer RANGE
of ``[-p, f]`` over dense_rank covers exactly p preceding and f following
peer groups, with all rows of a peer group sharing one rank (RANGE is
tie-inclusive). Two window passes over the SAME partitioning/order — one
shuffle, the second pass reuses the sort.
"""

from __future__ import annotations

import sys

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

UNBOUNDED = sys.maxsize


def groups_frame(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    agg: Column,
    preceding: int = UNBOUNDED,
    following: int = 0,
    out_col: str = "groups_agg",
) -> DataFrame:
    """Append ``out_col`` = ``agg`` over a GROUPS frame of
    ``[preceding PRECEDING, following FOLLOWING]`` peer groups.

    ``agg`` is any aggregate Column (e.g. ``F.sum("x")``). ``preceding`` /
    ``following`` take group counts or UNBOUNDED. The ascending-order,
    nulls-default semantics match the SQL standard's GROUPS mode.
    """
    rank_window = Window.partitionBy(*partition_by).orderBy(order_by)
    grouped = df.withColumn("__peer_group__", F.dense_rank().over(rank_window))
    lo = Window.unboundedPreceding if preceding == UNBOUNDED else -preceding
    hi = Window.unboundedFollowing if following == UNBOUNDED else following
    frame: WindowSpec = (
        Window.partitionBy(*partition_by)
        .orderBy("__peer_group__")
        .rangeBetween(lo, hi)
    )
    return grouped.withColumn(out_col, agg.over(frame)).drop("__peer_group__")
