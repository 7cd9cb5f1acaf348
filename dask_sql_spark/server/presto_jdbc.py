"""JDBC compatibility shim: answers the ``system.jdbc.*`` metadata queries
a Presto JDBC driver issues on connect (reference server/presto_jdbc.py:1-149
creates a `system` schema with tables/columns/schemas catalogs).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    from dask_sql_spark.context import Context

_JDBC_RE = re.compile(r"\bsystem\.jdbc\.(\w+)\b", re.IGNORECASE)


def maybe_jdbc_query(context: "Context", sql: str) -> DataFrame | None:
    """Return a metadata DataFrame for system.jdbc queries, else None."""
    m = _JDBC_RE.search(sql)
    if not m:
        return None
    what = m.group(1).lower()
    spark = context.spark
    if what == "schemas":
        rows = [(s, "dask_sql_spark") for s in sorted(context.schemas)]
        return spark.createDataFrame(
            rows, "TABLE_SCHEM string, TABLE_CATALOG string"
        )
    if what == "tables":
        rows = [
            ("dask_sql_spark", schema_name, t, "TABLE", "")
            for schema_name, schema in sorted(context.schemas.items())
            for t in sorted(schema.tables)
        ]
        return spark.createDataFrame(
            rows,
            "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string, "
            "TABLE_TYPE string, REMARKS string",
        )
    if what == "columns":
        from dask_sql_spark.mappings import spark_type_to_sql_name

        rows = []
        for schema_name, schema in sorted(context.schemas.items()):
            for t, df in sorted(schema.tables.items()):
                for i, f in enumerate(df.schema.fields):
                    rows.append(
                        (
                            "dask_sql_spark",
                            schema_name,
                            t,
                            f.name,
                            spark_type_to_sql_name(f.dataType),
                            "YES" if f.nullable else "NO",
                            i + 1,
                        )
                    )
        return spark.createDataFrame(
            rows,
            "TABLE_CAT string, TABLE_SCHEM string, TABLE_NAME string, "
            "COLUMN_NAME string, TYPE_NAME string, IS_NULLABLE string, "
            "ORDINAL_POSITION int",
        )
    if what == "catalogs":
        return spark.createDataFrame(
            [("dask_sql_spark",)], "TABLE_CAT string"
        )
    if what in ("types", "table_types"):
        return spark.createDataFrame([("TABLE",)], "TABLE_TYPE string")
    return None
