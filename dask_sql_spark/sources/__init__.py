from dask_sql_spark.sources.location import read_location, to_spark_dataframe

__all__ = ["read_location", "to_spark_dataframe"]
