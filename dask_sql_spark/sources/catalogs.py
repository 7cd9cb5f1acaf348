"""Catalog-backed inputs: Hive metastore tables and Intake catalogs.

Parity with the reference's input plugin chain (input_utils/hive.py:27-316
scrapes DESCRIBE FORMATTED to find storage locations; input_utils/intake.py
opens intake catalogs). Spark-first: Hive goes through the session's
metastore support (``enableHiveSupport()``) — no location scraping needed,
partition pruning and statistics come from the metastore natively. Intake
file-driver catalogs (csv/parquet/json/orc) are parsed natively from the
YAML and read as distributed Spark file sources; only exotic drivers
(sql/zarr/plugins) are gated on the optional intake package.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_hive_table(
    spark: SparkSession, table: str, database: str | None = None
) -> DataFrame:
    """Read a Hive metastore table (reference hive.py:27-316 reimplemented
    as a catalog lookup — Spark's Hive integration replaces the
    DESCRIBE-FORMATTED scraping wholesale)."""
    qualified = f"{database}.{table}" if database else table
    try:
        return spark.table(qualified)
    except Exception as e:
        raise RuntimeError(
            f"Cannot read Hive table {qualified!r}. Build the session with "
            "SparkSession.builder.enableHiveSupport() and a configured "
            "metastore."
        ) from e


def read_intake_catalog(
    spark: SparkSession, catalog_path: str, entry: str, **kwargs: Any
) -> DataFrame:
    """Load an intake catalog entry as a Spark DataFrame (reference
    input_utils/intake.py).

    File-driver entries (csv/parquet/json/orc — the dominant catalog
    shape) are resolved NATIVELY: the YAML is parsed directly and the
    ``urlpath`` goes through ``read_location``, so the scan stays a
    distributed Spark file source with pushdown — no intake dependency
    and no pandas materialization. Exotic drivers (sql, zarr, plugins)
    fall back to the real intake package when installed.
    """
    import os
    import re

    import yaml

    with open(catalog_path) as f:
        cat = yaml.safe_load(f) or {}
    src = (cat.get("sources") or {}).get(entry)
    if src is None:
        raise KeyError(
            f"entry {entry!r} not in catalog {catalog_path!r}; "
            f"available: {sorted((cat.get('sources') or {}))}"
        )
    # fully-qualified driver class names ("intake.source.csv.CSVSource")
    # name the same file drivers — normalize to the short form so they
    # take the native distributed path too (round-10 audit)
    driver = str(src.get("driver", "")).rsplit(".", 1)[-1].lower()
    if driver.endswith("source") and driver != "source":
        driver = driver[: -len("source")]
    args = dict(src.get("args") or {})
    urlpath = args.pop("urlpath", None)

    def _template(path: str) -> str:
        # intake's Jinja-lite templating: {{ CATALOG_DIR }} is the
        # catalog file's directory; user parameters substitute their
        # declared defaults (round-10 audit: raw "{{ CATALOG_DIR }}"
        # used to reach the file scan as a literal path)
        params = {"CATALOG_DIR": os.path.dirname(os.path.abspath(catalog_path))}
        for scope in (cat.get("metadata") or {}, src):
            for p in scope.get("parameters") or {}:
                spec = (scope.get("parameters") or {})[p]
                if isinstance(spec, dict) and "default" in spec:
                    params[p] = spec["default"]
        out = re.sub(
            r"\{\{\s*(\w+)\s*\}\}",
            lambda m: str(params.get(m.group(1), m.group(0))),
            path,
        )
        # a parameter with no declared default would otherwise reach
        # the file scanner as literal "{{ name }}" text — fail loudly,
        # naming what's unresolved (round-10 advisor). Keyed off the
        # findall itself, not a raw "{{" scan: a substituted parameter
        # VALUE legitimately containing "{{" must not re-trip the check,
        # and a non-identifier template like "{{ a-b }}" deserves a
        # message naming the malformed text, not an empty list (r11
        # advice)
        unresolved = sorted(set(re.findall(r"\{\{\s*(\w+)\s*\}\}", out)))
        if unresolved:
            raise ValueError(
                f"catalog entry {entry!r}: unresolved template "
                f"parameter(s) {unresolved} in urlpath {path!r}; declare "
                "a default in the catalog's parameters block"
            )
        # a malformed expression in the TEMPLATE text itself (e.g.
        # "{{ a-b }}" — not the {{ identifier }} form) would silently
        # reach the file scanner as a literal path; check the original
        # path, never `out`, so a substituted parameter VALUE that
        # legitimately contains "{{" can't false-positive
        malformed = [
            m
            for m in re.findall(r"\{\{.*?\}\}", path)
            if not re.fullmatch(r"\{\{\s*\w+\s*\}\}", m)
        ]
        if malformed:
            raise ValueError(
                f"catalog entry {entry!r}: malformed template "
                f"expression(s) {malformed} in urlpath {path!r}; only "
                "{{ identifier }} substitutions are supported"
            )
        return out

    if driver in ("csv", "parquet", "json", "orc", "textfiles") and urlpath:
        from functools import reduce

        from dask_sql_spark.sources.location import read_location

        fmt = "text" if driver == "textfiles" else driver
        # intake's pandas-reader kwargs that translate to Spark options
        options = dict(kwargs)
        csv_kwargs = dict(args.pop("csv_kwargs", {}) or {})
        if "sep" in csv_kwargs:
            options.setdefault("sep", csv_kwargs.pop("sep"))
        if "header" in csv_kwargs:
            # pandas/dask header=None means "no header row"; 0/True means
            # the first row is the header — silently dropping this used
            # to read the first data row as column names (round-10 audit)
            h = csv_kwargs.pop("header")
            options.setdefault("header", h is not None and h is not False)
        if csv_kwargs:
            import warnings

            warnings.warn(
                f"catalog entry {entry!r}: csv_kwargs "
                f"{sorted(csv_kwargs)} have no Spark reader translation "
                "and were ignored",
                stacklevel=2,
            )
        # urlpath may be a LIST of locations (legal in intake) — read
        # each and union; str() on the list used to produce a bogus
        # "['a', 'b']" path (round-10 audit)
        paths = urlpath if isinstance(urlpath, list) else [urlpath]
        frames = [
            read_location(spark, _template(str(p)), format=fmt, **options)
            for p in paths
        ]
        return reduce(lambda a, b: a.unionByName(b), frames)
    try:  # non-file drivers need the real package
        import intake  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"catalog entry {entry!r} uses driver {driver!r}, which needs "
            "the intake package (`pip install intake`); file drivers "
            "(csv/parquet/json/orc) are supported natively"
        ) from e
    catalog = intake.open_catalog(catalog_path)  # pragma: no cover
    pdf = catalog[entry].read()  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover
