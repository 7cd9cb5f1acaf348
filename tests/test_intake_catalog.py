"""Native intake-catalog reading: file-driver entries resolve straight to
distributed Spark file-source scans (reference input_utils/intake.py parity
without the intake dependency)."""

import pytest


@pytest.fixture()
def catalog(spark, tmp_path):
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "pq"))
    spark.range(0, 50).selectExpr("id", "id + 1 AS w").write.mode(
        "overwrite"
    ).option("header", True).option("sep", ";").csv(str(tmp_path / "csvd"))
    cat = tmp_path / "catalog.yml"
    cat.write_text(
        f"""
sources:
  facts:
    driver: parquet
    args:
      urlpath: "{tmp_path / 'pq'}"
  dims:
    driver: csv
    args:
      urlpath: "{tmp_path / 'csvd'}"
      csv_kwargs:
        sep: ";"
  exotic:
    driver: sql
    args:
      uri: "postgresql://nope"
"""
    )
    return str(cat)


def test_intake_parquet_entry_is_native_scan(spark, catalog):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, catalog, "facts")
    assert df.count() == 100
    assert dict(df.dtypes)["v"] == "bigint"
    # distributed file source, not a pandas collect
    assert "FileScan parquet" in df._jdf.queryExecution().executedPlan().toString()


def test_intake_csv_entry_passes_reader_kwargs(spark, catalog):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, catalog, "dims")
    assert df.count() == 50
    assert set(df.columns) == {"id", "w"}


def test_intake_entry_via_context(context, catalog):
    context.create_table("cat_t", catalog, format="intake", entry="facts")
    row = context.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM cat_t").collect()[0]
    assert (row.n, row.s) == (100, 9900)


def test_intake_unknown_entry_and_exotic_driver(spark, catalog):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    with pytest.raises(KeyError, match="available"):
        read_intake_catalog(spark, catalog, "no_such_entry")
    try:
        import intake  # noqa: F401

        has_intake = True
    except ImportError:
        has_intake = False
    if not has_intake:
        with pytest.raises(RuntimeError, match="intake"):
            read_intake_catalog(spark, catalog, "exotic")
