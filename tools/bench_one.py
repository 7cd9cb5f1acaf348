"""Isolated per-query bench: run named queries under the exact bench.py
harness conditions (local[$SPARK_GRAFT_CPUS], shuffle=cpus, 16g heap,
60s periodic GC, noop sink, clearCache between runs) but in a fresh
session with ONE warm pass + N timed passes per query, reporting min and
all samples.  Used for A/B plan experiments and for confirming bench
watch items without full-suite session aging.

Usage: python tools/bench_one.py [-n 4] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n = 4
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")

    from dask_sql_spark.context import default_spark_session

    spark = default_spark_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        **{
            "spark.driver.memory": mem,
            "spark.cleaner.periodicGC.interval": "60s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm pool

    out = {}
    for name in names:
        samples = []
        for i in range(n + 1):  # pass 0 is the untimed warm pass
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            if i:
                samples.append(dt)
        out[name] = {"min": min(samples), "samples": samples}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
