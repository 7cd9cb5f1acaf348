"""Hive metastore integration (reference input_utils/hive.py:27-316).

Runs in a subprocess: the shared test session is not Hive-enabled, and
catalogImplementation is fixed at session build. The embedded Derby
metastore lands in the test's tmp cwd. This exercises the real path a
cluster uses — Spark's native metastore integration replaces the
reference's DESCRIBE-FORMATTED location scraping wholesale."""

import subprocess
import sys
import textwrap


def test_hive_metastore_roundtrip(tmp_path):
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("hive_it")
            .enableHiveSupport()
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("DROP TABLE IF EXISTS hive_t")
        spark.sql("CREATE TABLE hive_t (x INT, y STRING) USING parquet")
        spark.sql("INSERT INTO hive_t VALUES (1, 'a'), (2, 'b')")

        from dask_sql_spark.sources.catalogs import read_hive_table

        df = read_hive_table(spark, "hive_t", database="default")
        assert df.count() == 2

        from dask_sql_spark import Context

        c = Context(spark=spark)
        n = c.sql("SELECT COUNT(*) AS n FROM hive_t").collect()[0].n
        assert n == 2
        c.sql("ANALYZE TABLE hive_t COMPUTE STATISTICS FOR ALL COLUMNS").collect()
        d = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE EXTENDED hive_t").collect()
        }
        assert "Statistics" in d, d
        spark.sql("DROP TABLE hive_t")
        print("HIVE_ROUNDTRIP_OK")
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "HIVE_ROUNDTRIP_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
