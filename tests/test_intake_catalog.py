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


@pytest.fixture()
def templated_catalog(spark, tmp_path):
    """A catalog exercising the round-10 audit shapes: CATALOG_DIR
    templating, parameter defaults, list urlpath, fully-qualified
    driver class names, and pandas-style header=None csv_kwargs."""
    spark.range(0, 30).selectExpr("id", "id * 3 AS v").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "t1"))
    spark.range(30, 40).selectExpr("id", "id * 3 AS v").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "t2"))
    (tmp_path / "raw.csv").write_text("1,alpha\n2,beta\n")
    cat = tmp_path / "catalog.yml"
    cat.write_text(
        """
sources:
  rel:
    driver: intake.source.parquet.ParquetSource
    args:
      urlpath: "{{ CATALOG_DIR }}/t1"
  sharded:
    driver: parquet
    args:
      urlpath:
        - "{{ CATALOG_DIR }}/t1"
        - "{{ CATALOG_DIR }}/t2"
  parm:
    driver: parquet
    parameters:
      shard:
        description: which shard
        type: str
        default: t2
    args:
      urlpath: "{{ CATALOG_DIR }}/{{ shard }}"
  headerless:
    driver: csv
    args:
      urlpath: "{{ CATALOG_DIR }}/raw.csv"
      csv_kwargs:
        header: null
"""
    )
    return str(cat)


def test_intake_catalog_dir_templating(spark, templated_catalog):
    """{{ CATALOG_DIR }} resolves to the catalog file's directory and
    a fully-qualified driver class name still takes the native path."""
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, templated_catalog, "rel")
    assert df.count() == 30
    assert "FileScan parquet" in df._jdf.queryExecution().executedPlan().toString()


def test_intake_list_urlpath_unions_shards(spark, templated_catalog):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, templated_catalog, "sharded")
    assert df.count() == 40
    assert df.selectExpr("max(id) AS m").collect()[0].m == 39


def test_intake_parameter_defaults_substitute(spark, templated_catalog):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, templated_catalog, "parm")
    assert df.count() == 10


def test_intake_csv_header_none_not_dropped(spark, templated_catalog):
    """pandas-style header=None must map to Spark header=false — the old
    code silently dropped it and consumed the first DATA row as column
    names."""
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    df = read_intake_catalog(spark, templated_catalog, "headerless")
    assert df.count() == 2  # both rows are data, none eaten as a header


def test_intake_unresolved_parameter_raises(spark, tmp_path):
    """Round-10 advisor, pinned: a template parameter with no declared
    default must raise a clear error naming the parameter — not reach
    the file scanner as a literal '{{ name }}' path."""
    import pytest

    from dask_sql_spark.sources.catalogs import read_intake_catalog

    cat = tmp_path / "nodefault.yml"
    cat.write_text(
        """
sources:
  nodef:
    driver: parquet
    parameters:
      shard:
        description: which shard (no default)
        type: str
    args:
      urlpath: "{{ CATALOG_DIR }}/{{ shard }}"
"""
    )
    with pytest.raises(ValueError, match="shard"):
        read_intake_catalog(spark, str(cat), "nodef")


def test_intake_untranslatable_csv_kwargs_warn(spark, tmp_path):
    from dask_sql_spark.sources.catalogs import read_intake_catalog

    (tmp_path / "d.csv").write_text("a,b\n1,2\n")
    cat = tmp_path / "c.yml"
    cat.write_text(
        """
sources:
  d:
    driver: csv
    args:
      urlpath: "{{ CATALOG_DIR }}/d.csv"
      csv_kwargs:
        dtype: {a: int64}
"""
    )
    with pytest.warns(UserWarning, match="no Spark reader translation"):
        df = read_intake_catalog(spark, str(cat), "d")
    assert df.count() == 1
