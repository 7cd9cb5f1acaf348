"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# analyzed-plan semanticHash -> partition count. df.rdd.getNumPartitions()
# forces a full physical planning pass (~50-60 ms per call even warm, r12
# measurement) that the subsequent action simply repeats; the count is a
# PARALLELISM HEURISTIC, not a correctness input, so memoizing it on the
# analyzed plan is safe — a stale entry merely repartitions (or skips
# repartitioning) a frame the heuristic would have treated identically.
# Bounded (r13): evict oldest entries past _PARTS_CACHE_MAX so a
# long-lived driver session cannot grow it without limit, and a stale
# hit (same semanticHash, rewritten files) ages out instead of living
# forever.  dicts preserve insertion order, so popping the first key is
# FIFO eviction — adequate for a heuristic cache.
_PARTS_CACHE: dict[int, int] = {}
_PARTS_CACHE_MAX = 4096


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
    try:
        key = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # Spark Connect or API drift: probe uncached
        key = None
    if key is not None and key in _PARTS_CACHE:
        n = _PARTS_CACHE[key]
    else:
        n = df.rdd.getNumPartitions()
        if key is not None:
            while len(_PARTS_CACHE) >= _PARTS_CACHE_MAX:
                _PARTS_CACHE.pop(next(iter(_PARTS_CACHE)))
            _PARTS_CACHE[key] = n
    if n >= target:
        return df
    return df.repartition(target)
