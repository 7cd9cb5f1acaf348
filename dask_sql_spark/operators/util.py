"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    cluster can use.

    Data-amplifying operators (shingle/token/bit explodes multiply rows
    10-100×) inherit the scan's partitioning; a compact input (one parquet
    row group → one task) would serialize the whole pipeline. The shuffle
    cost of repartitioning the *pre-explosion* rows is tiny compared to the
    exploded work it parallelizes. No-op when the input is already well
    partitioned (the 100 TB case, where scans carry hundreds of tasks).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
