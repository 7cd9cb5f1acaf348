"""Candidate-volume A/B for the jaccard prefix filter (round-12 scale
measurement, VERDICT r11 #1).

For a given sf_dir + threshold + max_df, reports the candidate-PAIR row
count each plan materializes into its quadratic stage:

- legacy: sum over shingle buckets of c*(c-1)/2 (post max_df) — exactly
  the rows the in-row pair explode emits into the groupBy(id_a,id_b)
  shuffle (SCALING.md's measured 26 GB stage at sf100);
- prefix: the same count over PREFIX-token buckets, after the length
  filter — the rows the pruned plan emits into its distinct.

Counting evaluates the explode but aggregates in place (no pair
shuffle), so this measures volume without paying the reduce side.
Optionally (--wall) also runs each full path end-to-end and reports
wall-clock; use on SFs where both are feasible.

Usage:
  python tools/jaccard_candidates.py <sf_dir> <parts> <mem> <threshold> \
      [max_df|none] [--wall] [--prefix-only]
e.g.
  python tools/jaccard_candidates.py .localdata/sf10 128 48g 0.12 1000 --wall
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    wall = "--wall" in sys.argv
    prefix_only = "--prefix-only" in sys.argv
    sf_dir, parts, mem, threshold = (
        args[0],
        int(args[1]),
        args[2],
        float(args[3]),
    )
    max_df = None
    if len(args) > 4 and args[4].lower() != "none":
        max_df = int(args[4])

    from pyspark.sql import functions as F

    import dask_sql_spark.operators.dedup as dd
    from dask_sql_spark.context import default_spark_session

    spark = default_spark_session(
        shuffle_partitions=parts,
        **{
            "spark.driver.memory": mem,
            "spark.driver.maxResultSize": "4g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {
        "sf_dir": sf_dir,
        "threshold": threshold,
        "max_df": max_df,
        "n_docs": docs_df.count(),
    }

    t_eff = max(threshold - dd._ROUND6_SLACK, 0.0)
    t0 = time.time()
    pdocs = dd._prefix_doc_sets(docs_df, "doc_id", "text", 3, t_eff, max_df)
    pdocs.persist()
    out["prefix_doc_build_sec"] = None  # filled after first action below

    def bucket_pairs(rows):
        return (
            rows.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("double"))
            )
            .collect()[0][0]
            or 0
        )

    if not prefix_only:
        out["legacy_pairs"] = int(
            bucket_pairs(
                pdocs.select("doc_id", F.explode("set_").alias("shingle"))
            )
        )
    out["prefix_doc_build_sec"] = round(time.time() - t0, 1)

    # prefix candidates WITH the length filter: evaluate the real pair
    # explode, aggregate to a count in place
    t0 = time.time()
    pre = pdocs.select(
        F.col("doc_id").alias("id"),
        "sz",
        F.posexplode(F.expr("slice(set_, 1, plen)")).alias("pos", "shingle"),
    )
    pair_structs = F.expr(
        "flatten(transform(m, (a, i) -> "
        "transform(slice(m, i + 2, size(m) - i - 1), "
        "b -> struct(a.sz AS sz_a, b.sz AS sz_b, "
        "a.pos AS pa, b.pos AS pb))))"
    )
    emitted = (
        pre.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("id"), F.col("sz"), F.col("pos"))
                )
            ).alias("m")
        )
        .where(F.size("m") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.*")
        .where(
            F.least("sz_a", "sz_b")
            >= F.greatest("sz_a", "sz_b") * F.lit(t_eff) - F.lit(1e-9)
        )
        .persist()
    )
    out["prefix_pairs"] = emitted.count()
    # after the PPJoin positional filter — the shipped emission
    req = F.ceil(
        (F.col("sz_a") + F.col("sz_b")) * F.lit(t_eff / (1.0 + t_eff))
        - F.lit(1e-9)
    )
    out["prefix_pairs_pos"] = (
        emitted.where(
            F.least("pa", "pb")
            + 1
            + F.least(
                F.col("sz_a") - F.col("pa") - 1,
                F.col("sz_b") - F.col("pb") - 1,
            )
            >= req
        ).count()
    )
    emitted.unpersist()
    out["prefix_count_sec"] = round(time.time() - t0, 1)
    if out.get("legacy_pairs"):
        out["reduction"] = round(out["legacy_pairs"] / max(out["prefix_pairs"], 1), 2)
    pdocs.unpersist()

    if wall:
        for name, flag in (("prefix", True), ("legacy", False)):
            if prefix_only and not flag:
                continue
            t0 = time.time()
            n = dd.ngram_jaccard_pairs(
                docs_df,
                threshold=threshold,
                max_df=max_df,
                prefix_filter=flag,
            ).count()
            out[f"{name}_wall_sec"] = round(time.time() - t0, 1)
            out[f"{name}_result_pairs"] = n
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
