"""Runtime filtering plan audits — the two optimizations that decide
whether a 100 TB fact scan reads 100 TB or one partition's worth:

- Dynamic partition pruning (DPP): a selective dim filter turns into a
  runtime IN-subquery on the fact's partition column, so only matching
  partition directories are listed/read.
- Bloom-filter runtime join filtering: the build side's join keys are
  sketched into a bloom filter pushed into the probe side's scan,
  discarding non-joining rows before the shuffle.

Both are Catalyst features this engine inherits by keeping tables as
file-source scans (SURVEY §0); these tests pin that they actually fire
on our session configuration."""

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_path = str(tmp_path / "fact_part")
    (
        spark.range(0, 20000)
        .select(
            (F.col("id") % 10).alias("part_key"),
            F.col("id").alias("value"),
        )
        .write.partitionBy("part_key")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    dim = spark.range(0, 10).select(
        F.col("id").alias("d_key"),
        F.when(F.col("id") < 2, "pick").otherwise("skip").alias("flag"),
    )
    joined = fact.join(dim, fact.part_key == dim.d_key).where(
        F.col("flag") == "pick"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.agg(F.count(F.lit(1))).collect()[0][0] == 4000


def test_bloom_filter_join_pruning_fires(spark, tmp_path):
    """With the application-side size gate lowered (local data is tiny),
    a selective dim join injects might_contain on the fact scan side."""
    fact_path = str(tmp_path / "fact_flat")
    spark.range(0, 50000).select(
        (F.col("id") % 1000).alias("join_key"), F.col("id").alias("value")
    ).write.parquet(fact_path)
    dim_path = str(tmp_path / "dim")
    spark.range(0, 1000).select(
        F.col("id").alias("d_key"),
        (F.col("id") % 100).alias("sel"),
    ).write.parquet(dim_path)

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtimeFilter.number.threshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # runtime bloom filters only pay off (and only inject) on shuffle
        # joins — a broadcast join already filters at the probe; force the
        # shuffle path since local test data is far under the threshold
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(F.col("sel") == F.lit(3))
        joined = fact.join(dim, fact.join_key == dim.d_key)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
        assert joined.agg(F.count(F.lit(1))).collect()[0][0] == 500
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    conf.unset(k)
                except Exception:
                    pass
            else:
                conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """With thresholds lowered to local scale, AQE marks the skewed
    sort-merge join (isSkew=true) and splits the hot partition — the
    runtime behavior the salted_join operator complements for
    single-key hotspots."""
    import pyspark.sql.functions as F

    fact_path = str(tmp_path / "skew_fact")
    # 95% of rows on key 0, the rest uniform
    spark.range(0, 200000).select(
        F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    ).write.parquet(fact_path)
    dim_path = str(tmp_path / "skew_dim")
    spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").alias("attr")
    ).write.parquet(dim_path)

    conf = spark.conf
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)
        # a GLOBAL aggregate has no distribution requirement, so the
        # skew split is legal; keep payload+attr in flight so the hot
        # partition carries real bytes
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("payload") + F.col("attr")).alias("s"),
        )
        rows = joined.collect()  # finalizes THIS df's AQE plan
        assert rows[0]["n"] == 200000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan.lower(), plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    conf.unset(k)
                except Exception:
                    pass
            else:
                conf.set(k, v)
