"""Table-maintenance operations: small-file compaction.

Long-running ingestion (streaming sinks, micro-batch appends, per-task
writes) leaves thousands of small parquet files; at 100 TB the scan's
task-scheduling and footer-reading overhead dominates. Compaction
rewrites a location into ~target-sized files — the `OPTIMIZE` of
Delta/Iceberg re-expressed with plain Spark primitives.

File sizes are read through the Hadoop FileSystem API (works for HDFS /
S3A / local alike), the row data never touches the driver, and the
rewrite is a single ``repartition(n)`` — one round-robin shuffle sized
so each output file lands near the target.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _total_bytes(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_files) under ``path`` via the Hadoop FS API."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = 0
    n = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        total += st.getLen()
        n += 1
    return total, n


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet location ``path`` into ``out_path`` with
    ~``target_file_mb``-sized files, optionally re-clustering rows with
    ``sort_by`` (restores row-group skipping that appends destroyed).
    Returns {files_before, files_after, bytes, target_files}.

    Deliberately writes to a NEW location: an in-place rewrite that
    fails mid-way would lose data; callers swap paths atomically in
    their catalog (exactly how lakehouse OPTIMIZE commits).
    """
    total, before = _total_bytes(spark, path)
    target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(path)
    out = df.repartition(target)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(out_path)
    _, after = _total_bytes(spark, out_path)
    return {
        "files_before": before,
        "files_after": after,
        "bytes": total,
        "target_files": target,
    }
