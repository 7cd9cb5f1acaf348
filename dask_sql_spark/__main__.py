"""``python -m dask_sql_spark`` → interactive REPL (parity with the
reference's ``dask-sql`` console entry point, cmd.py)."""

from dask_sql_spark.cmd import cmd_loop

if __name__ == "__main__":
    cmd_loop()
