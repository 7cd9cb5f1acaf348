"""Slowly-changing-dimension maintenance (SCD Type 2).

The warehouse pattern MERGE INTO cannot express in one statement: when a
dimension attribute changes, CLOSE the current row (stamp its
``valid_to``) and APPEND a new current version — so facts can always
join the attribute values that were true at event time.

Spark-first shape: one equi-join between the current slice and the
latest update per key (broadcast when the update batch is small — the
normal case: daily deltas vs a full dimension), null-safe change
detection with ``<=>`` so NULL→value and value→NULL transitions count
as changes, and a union of four disjoint row sets. No window over the
dimension, no driver round-trips; at 100 TB the only shuffle is the
update-batch dedup and (if too big to broadcast) the key join.

Additive capability: the reference engine has INSERT/DROP only
(dask_sql/physical/rel/custom — no upsert, no history tracking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    broadcast_updates: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension and return the new
    dimension state.

    ``dim`` carries (key, tracked attrs, valid_from, valid_to) with
    ``valid_to IS NULL`` marking current rows — at most ONE current row
    per key (the SCD2 invariant; duplicates would cross-multiply the
    join). ``updates`` carries (key, tracked attrs, ts). Per key, only
    the LATEST update (max ts) is applied — intra-batch history is
    collapsed, the standard daily-delta semantics. With duplicate
    (key, ts) pairs in the batch the winner is engine-dependent; pass
    ``tiebreak_col`` (e.g. a change-log sequence number) to make it
    total-ordered. Updates are assumed to postdate the current rows
    they close (``ts >= valid_from``) — an out-of-order ts would stamp
    a ``valid_to`` before its row's ``valid_from``, which this function
    does not detect.

    ``broadcast_updates=True`` fits the normal shape (daily deltas vs a
    full dimension): the close join broadcasts the batch directly, and
    the insert join — whose preserved side is the batch and therefore
    can never be the broadcast build side — first shrinks the dimension
    side to batch size with a broadcast semi-join on the update keys,
    then broadcasts the shrunk side. Set it False when the batch is too
    large for a broadcast hash join — both joins then shuffle
    (round-9 audit: the broadcast was previously unconditional, an OOM
    hazard for backfill-sized batches).

    Row sets in the result:
    - history rows: unchanged, passed through
    - current rows whose attrs differ from their update: closed with
      ``valid_to = update ts``
    - current rows without an update or with an identical update: kept
    - one new current row per changed or brand-new key
    """
    upd_cols = [key_col, *tracked_cols, ts_col]
    order = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    sel = upd_cols if tiebreak_col is None or tiebreak_col in upd_cols else (
        upd_cols + [tiebreak_col]
    )
    latest = (
        updates.select(*sel)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*upd_cols)
    )

    hist = dim.where(F.col(valid_to).isNotNull())
    cur = dim.where(F.col(valid_to).isNull())

    u = latest.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
    )
    if broadcast_updates:
        u = F.broadcast(u)
    joined = cur.join(u, cur[key_col] == F.col("__k"), "left")
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_update = F.col("__k").isNotNull()

    dim_cols = dim.columns
    # kept-current and closed rows are the SAME relation with valid_to
    # conditionally stamped — one projection of `joined`, not two
    # filtered branches (each branch re-ran the dim scan + update join
    # under plan inlining; with the insert branch the old shape read the
    # dimension source nine times)
    merged_cur = joined.select(
        *[
            F.when(has_update & changed, F.col("__ts"))
            .otherwise(F.col(valid_to))
            .alias(valid_to)
            if c == valid_to
            else F.col(c)
            for c in dim_cols
        ]
    )

    # new current versions, computed directly at the BATCH grain: a
    # latest-batch row inserts when its key has no current row or its
    # tracked attrs differ from the current row
    c2 = cur.select(
        F.col(key_col).alias("__k2"),
        *[F.col(c).alias(f"__c_{c}") for c in tracked_cols],
    )
    if broadcast_updates:
        # `latest` is the PRESERVED side of the outer join below, and
        # Spark never builds/broadcasts the preserved side — a
        # broadcast hint on it is silently ignored (round-9 advisor).
        # Make the join broadcastable from the other direction: shrink
        # the dimension side to batch size with a broadcast semi-join
        # on the update keys (LeftSemi supports BuildRight), then
        # broadcast the shrunk side (RightOuter supports BuildLeft).
        # Brand-new keys still null-extend through the right join.
        c2 = F.broadcast(
            c2.join(
                F.broadcast(latest.select(F.col(key_col).alias("__k2"))),
                on="__k2",
                how="semi",
            )
        )
    cj = c2.join(latest, F.col("__k2") == latest[key_col], "right")
    changed2 = F.lit(False)
    for c in tracked_cols:
        changed2 = changed2 | ~F.col(f"__c_{c}").eqNullSafe(F.col(c))
    inserts = (
        cj.where(F.col("__k2").isNull() | changed2)
        .withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(dim.schema[valid_to].dataType))
        .select(*dim_cols)
    )

    return hist.unionByName(merged_cur).unionByName(inserts)
