"""Snapshot reconciliation and incremental aggregate maintenance.

Two table-maintenance operators every warehouse runs nightly:

- :func:`snapshot_diff` — what changed between two snapshots of a
  keyed table: inserted / deleted / changed / unchanged per key. One
  full outer join on the key; change detection is null-safe struct
  comparison in codegen. At 100 TB both sides shuffle once on the key
  (or co-located bucketed tables make it shuffle-free).
- :func:`refresh_aggregate` — incremental materialized-view update:
  fold a delta batch into an existing SUM/COUNT aggregate table
  without rescanning the base. union → ONE re-aggregate keyed shuffle
  over (old aggregate rows + delta partials); cost scales with the
  delta + aggregate size, never the base table.

Additive capability (the reference materializes CREATE TABLE AS once
and has no refresh path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key…, change) with change ∈ insert | delete | change | same.

    ``compare_cols`` defaults to every shared non-key column. NULL-safe
    throughout: a value flipping to/from NULL counts as a change, and
    NULL keys pair up across snapshots (the join is ``<=>``); presence
    on each side is tracked with explicit marker columns, not key
    NULL-ness — an all-NULL key present in both snapshots classifies
    same/change, not insert (round-9 audit finding). Keys are assumed
    unique per snapshot (a keyed table); duplicate keys would
    cross-multiply in the full outer join.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in key_cols
        ]
    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    cond = [F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}")) for c in key_cols]
    joined = o.join(n, on=cond, how="full_outer")

    # full-outer leaves the absent side entirely NULL, so the marker
    # column is the presence test — key NULL-ness is not (NULL keys are
    # legitimate row identities under the <=> join)
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(same, F.lit("same"))
        .otherwise(F.lit("change"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c)
            for c in key_cols
        ],
        change.alias("change"),
    )


def refresh_aggregate(
    agg: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold ``delta`` (raw rows) into ``agg`` (an existing per-key
    SUM/COUNT rollup with columns ``key_cols + sum_cols + count_col``)
    and return the refreshed rollup.

    Works because SUM and COUNT are commutative monoids: aggregate the
    delta to partials, union with the old rollup, re-aggregate. AVG and
    friends derive from SUM/COUNT downstream; MIN/MAX fold the same way
    (not implemented here — deletions would break their monoid).
    """
    delta_partial = delta.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).cast("long").alias(count_col),
    )
    unioned = agg.select(*key_cols, *sum_cols, count_col).unionByName(
        delta_partial
    )
    return unioned.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).cast("long").alias(count_col),
    )
