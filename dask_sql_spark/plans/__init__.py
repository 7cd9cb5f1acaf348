from dask_sql_spark.plans.statements import maybe_handle_custom_statement

__all__ = ["maybe_handle_custom_statement"]
