"""A/B: minhash permutation mins as interpreted in-row HOF folds (the
r12 form) vs an Arrow mapInArrow batch kernel (guide §4 — vectorized
numpy over the flattened hash arrays), r13 verdict item 7.

Both forms consume the SAME JVM tokenize→gram→md5 pipeline and must
produce bit-identical signatures (checksummed here before timing).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_minhash_arrow.py [-n 4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = 4
    args = sys.argv[1:]
    if args and args[0] == "-n":
        n = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from dask_sql_spark.context import default_spark_session
    from dask_sql_spark.operators.dedup import minhash_signatures
    from dask_sql_spark.operators.hashing import MINHASH_PERMS, MINHASH_PRIME
    from dask_sql_spark.operators.text import tokens, word_ngrams
    from dask_sql_spark.operators.hashing import portable_hash64
    from dask_sql_spark.operators.util import ensure_parallelism

    spark = default_spark_session(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        **{"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.count()  # warm

    num_perm, shingle_n = 16, 3

    def hs_frame():
        df2 = ensure_parallelism(
            df.select(F.col("doc_id"), tokens(F.col("text")).alias("_t")).where(
                F.size("_t") > 0
            )
        )
        grams = word_ngrams(F.col("_t"), shingle_n, keep_short=True)
        arr = F.filter(F.array_distinct(grams), lambda g: g != F.lit(""))
        hs = F.transform(arr, lambda s: portable_hash64(s) % MINHASH_PRIME)
        return df2.select(F.col("doc_id"), hs.alias("_hs"))

    def arrow_form():
        import pyarrow as pa

        perms = MINHASH_PERMS[:num_perm]
        p = MINHASH_PRIME
        base = hs_frame()
        id_ddl = dict(base.dtypes)["doc_id"]
        ddl = ", ".join(
            [f"doc_id {id_ddl}"] + [f"mh{i} BIGINT" for i in range(num_perm)]
        )

        def kernel(it):
            import numpy as np

            A = np.array([a for a, _ in perms], dtype=np.int64).reshape(-1, 1)
            B = np.array([b for _, b in perms], dtype=np.int64).reshape(-1, 1)
            for batch in it:
                ids = batch.column(0)
                hs = batch.column(1)
                if len(ids) == 0:
                    continue
                # ListArray: contiguous int64 value buffer + offsets
                vals = np.asarray(hs.values, dtype=np.int64)
                offs = np.asarray(hs.offsets)[: len(ids) + 1]
                X = (A * vals + B) % p  # (num_perm, total) — fits int64
                mins = np.minimum.reduceat(X, offs[:-1], axis=1)
                cols = [ids] + [
                    pa.array(mins[i], type=pa.int64())
                    for i in range(num_perm)
                ]
                names = ["doc_id"] + [f"mh{i}" for i in range(num_perm)]
                yield pa.RecordBatch.from_arrays(cols, names=names)

        return base.mapInArrow(kernel, ddl)

    hof = minhash_signatures(df, "doc_id", "text", num_perm, shingle_n)
    arw = arrow_form()

    # equivalence first: order-insensitive checksum of every signature
    def checksum(sig):
        cs = sig.select(
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in sig.columns)
                + "))"
            ).alias("cs"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (cs["cs"], cs["n"])

    c1, c2 = checksum(hof), checksum(arw)
    print("checksum hof", c1, "arrow", c2, "MATCH" if c1 == c2 else "DIFFER")
    if c1 != c2:
        sys.exit(1)

    def timeit(make):
        samples = []
        make().write.format("noop").mode("overwrite").save()  # warm
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        return samples

    s_hof = timeit(lambda: hof)
    s_arw = timeit(lambda: arw)
    print(
        {
            "sf_dir": sf_dir,
            "hof_min": min(s_hof),
            "hof": s_hof,
            "arrow_min": min(s_arw),
            "arrow": s_arw,
        }
    )


if __name__ == "__main__":
    main()
