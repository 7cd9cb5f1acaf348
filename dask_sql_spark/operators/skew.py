"""Skew- and shuffle-management operators for 100 TB joins.

AQE's skew-join splitting (on by default in this engine) handles most skew
at runtime; these operators cover the cases AQE cannot:

- :func:`salted_join` — explicit key salting for extreme hot keys (one key
  = majority of rows). The small side is replicated ``salt`` ways, the big
  side scatters each hot key across ``salt`` sub-partitions. AQE splits
  skewed *partitions*, but a single key's rows always hash to one reducer
  without salting.
- :func:`create_bucketed_table` — persist a table bucketed by join key so
  repeated joins on that key are shuffle-free (SortMergeJoin with no
  Exchange on either side). The classic warehouse co-location strategy;
  at 100 TB this turns every fact-fact join on the bucket key from a
  full-network shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``big``'s join key is extremely hot.

    big gets a random salt in [0, salt); small is exploded ``salt``× so
    every (key, salt) bucket finds its match. Correct for inner/left joins
    on a unique-keyed small side. The random salt is per-row and does not
    affect results — only reducer placement.

    Other join types are rejected: a right/full join over the exploded
    small side would emit every unmatched small row ``salt`` times, and
    semi/anti joins project the wrong side (round-9 audit guard).
    """
    # normalize before guarding — Spark itself accepts any casing and
    # underscore spelling ("INNER", "Left_Outer"), so the guard must too
    if how.lower().replace("_", "") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "the salt-exploded small side would duplicate unmatched "
            "rows under right/full semantics"
        )
    salted_big = big.withColumn(
        "__salt__", (F.rand() * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, on=[on, "__salt__"], how=how)
    return out.drop("__salt__")


def create_bucketed_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (and optionally sorted) managed table and
    return it. Two tables bucketed identically on the join key join
    WITHOUT a shuffle (no Exchange in the plan) — verify with
    ``df.explain()``."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return spark.table(name)


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase COUNT(DISTINCT x) GROUP BY k for skewed group keys.

    A plain count-distinct shuffles every (k, x) pair to k's single
    reducer — a hot key (one user = 40% of events) serializes on one
    task. Salting by ``hash(x) % buckets`` keeps correctness because a
    given x always lands in the same bucket, so per-bucket distinct
    counts are additive:

      phase 1: groupBy(k, hash(x)%B) → count(distinct x)   [B-way spread]
      phase 2: groupBy(k) → sum(partial)                   [B rows/key]

    Same result as COUNT(DISTINCT), hot key now B-way parallel. (This is
    what AQE skew handling cannot do — a single key's rows always hash
    to one reducer without re-keying.)
    """
    bucket = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    partial = (
        df.groupBy(*group_cols, bucket.alias("__bucket__"))
        .agg(F.count_distinct(F.col(distinct_col)).alias("__partial__"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial__").alias(f"n_distinct_{distinct_col}")
    )
