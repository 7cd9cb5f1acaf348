"""Tile sf0.1 into an sf1-scale dataset for weak-scaling measurement.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md, read-only).  The
scaling study (SCALING.md) needs one point an order of magnitude up, so
this tool writes a 10x tiling of sf0.1 under .localdata/sf1 (gitignored):

- fact/entity tables replicate 10x with key-column offsets so referential
  joins (orders->customer, lineitem->part/supplier, ...) keep their
  fan-out instead of growing cross products;
- `documents.text` is token-salted per copy ("tok" -> "tok_k"), so the
  shingle/minhash/jaccard operators see 10 independent corpora — the
  honest weak-scaling shape — rather than artificial 10-clone cliques
  that no real corpus growth would produce;
- `embeddings.embedding` is rotated by k positions per copy (norm
  preserved, vectors decorrelated) for the same reason.

Scaling-measurement data ONLY: correctness gates keep running against
the driver's pristine sf0.01.

Usage: python tools/make_sf1.py [dest_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SF_SRC", "/root/testdata/sf0.1")
COPIES = 10

# key columns to offset per table (offset = k * (global max over all
# offset columns + 1), one shared stride keeps cross-table references
# consistent)
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> int:
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    from pyspark.sql import functions as F

    from dask_sql_spark.context import default_spark_session

    # tiling sf10 -> sf100 needs a bigger heap than the sf0.1 -> sf1
    # default (the source is itself 100x); driver memory is a JVM-startup
    # option, so it comes in via env, not a second getOrCreate
    spark = default_spark_session(
        shuffle_partitions=int(os.environ.get("MAKE_SF_PARTS", "32")),
        **{"spark.driver.memory": os.environ.get("MAKE_SF_MEM", "8g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one shared stride across every offset column keeps l_orderkey ==
    # o_orderkey within each copy
    stride = 0
    for t, cols in OFFSET_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        stride = max([stride] + [int(v) for v in row if v is not None])
    stride += 1

    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")
        print(f"copied {t}")

    for t, cols in OFFSET_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            d = df
            for c in cols:
                d = d.withColumn(c, (F.col(c) + F.lit(k * stride)).cast(df.schema[c].dataType))
            if t == "documents" and k > 0:
                # salt every token: copies share no shingles -> 10
                # independent corpora, not 10-clone cliques
                d = d.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda tok: F.concat(tok, F.lit(f"_{k}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and k > 0:
                # rotate by k: norm preserved, cross-copy cosine decorrelated
                n = F.size(F.col("embedding"))
                d = d.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), k + 1, 10_000),
                        F.slice(F.col("embedding"), 1, k),
                    ),
                )
                _ = n
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(f"tiled {t} x{COPIES}")
    print("done:", dest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
