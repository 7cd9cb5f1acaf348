"""Type-mapping unit tests (reference tests/unit/test_mapping.py)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from dask_sql_spark.mappings import python_to_spark_type, spark_type_to_sql_name


def test_numpy_types():
    assert python_to_spark_type(np.float64) == T.DoubleType()
    assert python_to_spark_type(np.float32) == T.FloatType()
    assert python_to_spark_type(np.int64) == T.LongType()
    assert python_to_spark_type(np.int8) == T.ByteType()
    # unsigned collapses into same-width signed (reference mappings.py:32-39)
    assert python_to_spark_type(np.uint64) == T.LongType()
    assert python_to_spark_type(np.bool_) == T.BooleanType()


def test_python_types():
    assert python_to_spark_type(int) == T.LongType()
    assert python_to_spark_type(float) == T.DoubleType()
    assert python_to_spark_type(str) == T.StringType()


def test_sql_names():
    assert python_to_spark_type("BIGINT") == T.LongType()
    assert python_to_spark_type("varchar") == T.StringType()
    assert python_to_spark_type("timestamp") == T.TimestampType()


def test_decimal_native():
    # the reference degrades DECIMAL to float64 on CPU (mappings.py:70);
    # we keep it exact
    t = python_to_spark_type("DECIMAL(12,3)")
    assert t == T.DecimalType(12, 3)


def test_pandas_dtype_strings():
    assert python_to_spark_type("Int64") == T.LongType()
    assert python_to_spark_type("datetime64[ns]") == T.TimestampType()


def test_unknown_raises():
    with pytest.raises(NotImplementedError):
        python_to_spark_type("NOT_A_TYPE")


def test_sql_name_roundtrip():
    assert spark_type_to_sql_name(T.LongType()) == "BIGINT"
    assert spark_type_to_sql_name(T.StringType()) == "STRING"


def test_sql_name_nested_preserves_field_case():
    """r9 probe fix: struct FIELD names are identifiers and keep their
    case; only type words uppercase — recursively through arrays/maps."""
    dt = T.StructType(
        [
            T.StructField("myField", T.IntegerType()),
            T.StructField(
                "tags", T.ArrayType(T.MapType(T.StringType(), T.DoubleType()))
            ),
        ]
    )
    assert (
        spark_type_to_sql_name(dt)
        == "STRUCT<myField:INT,tags:ARRAY<MAP<STRING,DOUBLE>>>"
    )
    assert spark_type_to_sql_name(T.ArrayType(T.TimestampType())) == (
        "ARRAY<TIMESTAMP>"
    )
    assert spark_type_to_sql_name(T.DecimalType(12, 3)) == "DECIMAL(12,3)"


def test_python_to_spark_type_ddl_fallback(spark):
    """r9 probe gaps: compound/parameterized SQL type strings resolve
    through Spark's own DDL parser, and pandas 'category' maps to
    string. Unknown names still raise."""
    assert python_to_spark_type("array<int>") == T.ArrayType(T.IntegerType())
    assert python_to_spark_type("map<string,double>") == T.MapType(
        T.StringType(), T.DoubleType()
    )
    assert python_to_spark_type("struct<a:int,b:string>") == T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ]
    )
    assert python_to_spark_type("varchar(255)") == T.VarcharType(255)
    assert python_to_spark_type("numeric(10,2)") == T.DecimalType(10, 2)
    assert python_to_spark_type("category") == T.StringType()
    with pytest.raises(NotImplementedError):
        python_to_spark_type("NOT_A_TYPE")
