import time, cProfile, pstats, sys
sys.path.insert(0, "/root/repo")
from dask_sql_spark.context import default_spark_session
spark = default_spark_session(master="local[32]", shuffle_partitions=32, **{"spark.driver.memory": "16g"})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
sf = "/root/testdata/sf0.1"
for name in sys.argv[1:]:
    fn = qs[name]
    fn(spark, sf)  # cold build
    times = []
    for i in range(3):
        t0=time.time(); fn(spark, sf); times.append(time.time()-t0)
    pr = cProfile.Profile(); pr.enable(); fn(spark, sf); pr.disable()
    st = pstats.Stats(pr)
    ncalls = 0
    for (f, ln, nm), (cc, nc, tt, ct, callers) in st.stats.items():
        if nm == "send_command" and "java_gateway" in f:
            ncalls = nc
    print(f"BUILD {name}: min {min(times):.3f}s  py4j_calls {ncalls}", flush=True)
