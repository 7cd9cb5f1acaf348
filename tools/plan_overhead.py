"""Driver-side cost probe: for each named query, time (a) building the
DataFrame (Python + analysis), (b) explain("cost") forcing full
optimization, vs (c) one executed noop pass. The (a)+(b) share of (c)
is planning/driver overhead that tasks never see.

Usage: python tools/plan_overhead.py name [name ...]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dask_sql_spark.context import default_spark_session

    spark = default_spark_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        **{"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    print(f"{'query':34}{'build_s':>9}{'optimize_s':>11}{'exec_s':>9}")
    for name in names:
        # warm pass first (codegen, cache effects comparable to bench)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        with redirect_stdout(io.StringIO()):
            df.explain("cost")
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        spark.catalog.clearCache()
        print(f"{name:34}{t1 - t0:9.3f}{t2 - t1:11.3f}{t3 - t2:9.3f}")


if __name__ == "__main__":
    main()
