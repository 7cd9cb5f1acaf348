"""Per-query stage profile: run named queries under bench.py harness
conditions and report, per query, wall seconds plus per-stage metrics
pulled from the local Spark UI REST API (task counts, executor run time,
shuffle read/write bytes, input bytes) and the job count.

Usage: python tools/profile_query.py [-n 2] name [name ...]

The stage table tells you WHERE each second goes: many tiny stages =
scheduling overhead / too many actions; one fat stage = per-task work;
big shuffle bytes = exchange-bound. Offline companion to the Spark UI.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    n = 1
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
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm pool

    for name in names:
        # warm pass (codegen compile, page cache)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

        jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
        stages_before = {s["stageId"] for s in _api(base, "/stages")}
        best = None
        for _ in range(n):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            if best is None or dt < best:
                best = dt
        jobs_after = [
            j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before
        ]
        stages_after = [
            s
            for s in _api(base, "/stages")
            if s["stageId"] not in stages_before
        ]
        stages_after.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: {best:.3f}s min of {n} | "
              f"{len(jobs_after)} jobs, {len(stages_after)} stages "
              f"(over {n} timed passes)")
        print(f"{'stage':>6} {'tasks':>6} {'runtime_ms':>10} {'cpu_ms':>9} "
              f"{'gc_ms':>7} {'fetchw':>7} {'deser':>7} "
              f"{'input':>9} {'sh_read':>9} {'sh_write':>9}  name")
        for s in stages_after[:14]:
            print(
                f"{s['stageId']:>6} {s.get('numCompleteTasks', 0):>6} "
                f"{s.get('executorRunTime', 0):>10} "
                f"{(s.get('executorCpuTime', 0) or 0)//1000000:>9} "
                f"{s.get('jvmGcTime', 0):>7} "
                f"{s.get('shuffleFetchWaitTime', 0):>7} "
                f"{s.get('executorDeserializeTime', 0):>7} "
                f"{s.get('inputBytes', 0):>9} "
                f"{s.get('shuffleReadBytes', 0):>9} "
                f"{s.get('shuffleWriteBytes', 0):>9}  "
                f"{(s.get('name') or '')[:40]}"
            )


if __name__ == "__main__":
    main()
