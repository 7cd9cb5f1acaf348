"""End-to-end training-corpus cleaning pipeline.

Composes the §7 M6 operators into the canonical LLM-data-prep flow:

    quality filter → language filter → exact dedup → MinHash near-dedup

Everything is one lazy DataFrame program — Catalyst fuses the quality and
language column work into the scan projection, the dedups are the two
bucket-join shuffles, and nothing touches the driver. At 100 TB this runs
exactly as written (each stage's shuffle keys: content-hash, then LSH
bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_sql_spark.operators.dedup import minhash_lsh_pairs
from dask_sql_spark.operators.text import score_documents


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.6,
    lang: str | None = "en",
    num_perm: int = 16,
    bands: int = 8,
    materialize_kept: bool = False,
) -> DataFrame:
    """Return the cleaned corpus: (id, n_tokens, lang_guess) of documents
    that survive all four stages. Near-dup resolution keeps the lower id of
    every LSH candidate pair (greedy keeper rule).

    ``kept`` feeds BOTH the MinHash branch and the final anti join, and
    Catalyst compiles each consumer its own copy of the upstream
    (score + exact-dedup) subplan. ``materialize_kept=True`` cuts the
    lineage with a lazy localCheckpoint so the filtered corpus is
    computed once per job — the right call whenever the corpus is big
    relative to memory+disk of the cluster's block managers (i.e.
    always at scale); off by default to keep the program fully lazy."""
    # fused single-analysis scorer (see text.score_documents: the
    # chained add_* form spent ~2 s/call re-analyzing the stopword
    # literal trees before any execution)
    scored = score_documents(docs, text_col)
    kept = scored.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    if lang is not None:
        kept = kept.where(F.col("lang_guess") == lang)

    # exact dedup: keep min id per content hash — as ONE row_number
    # window over the hash, not groupBy(min)+semi-join: the window
    # shuffles the scored rows once by content hash, where the join form
    # scans+scores the corpus twice (keepers branch + probe branch) and
    # shuffles twice (hash aggregate, then the id semi join)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    kept = (
        kept.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )

    if materialize_kept:
        kept = kept.localCheckpoint(eager=False)

    # near-dup: drop the higher id of every LSH candidate pair
    pairs = minhash_lsh_pairs(kept, id_col, text_col, num_perm, bands)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    cleaned = kept.join(losers, on=id_col, how="left_anti")
    return cleaned.select(id_col, "n_tokens", "lang_guess")


def filter_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.6,
    lang: str | None = "en",
) -> DataFrame:
    """Per-stage attrition audit of :func:`clean_corpus`'s scan-stage
    filters — the report every curation run ships next to its output:
    how many documents survive each cumulative stage (all → token floor →
    stopword cap → language → exact-dedup keepers).

    ONE aggregate over the scored projection: each stage is a conditional
    count (exact-dedup survivors are a conditional COUNT(DISTINCT
    content-hash)), so the full funnel costs a single map-combined pass
    at any corpus size — no per-stage jobs, no materialization. The
    near-dup stage is deliberately absent: it needs the LSH band join
    (see clean_corpus); this audit covers everything computable in the
    scan.
    """
    # fused single-analysis scorer (see text.score_documents: the
    # chained add_* form spent ~2 s/call re-analyzing the stopword
    # literal trees before any execution)
    scored = score_documents(docs, text_col)
    s1 = F.col("n_tokens") >= min_tokens
    s2 = s1 & (F.col("stopword_ratio") <= max_stopword_ratio)
    s3 = s2 & (F.col("lang_guess") == lang) if lang is not None else s2
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(s1.cast("long")).alias("n_min_tokens"),
        F.sum(s2.cast("long")).alias("n_stopword"),
        F.sum(s3.cast("long")).alias("n_lang"),
        F.countDistinct(
            F.when(s3, F.md5(F.col(text_col)))
        ).alias("n_exact_dedup"),
    )
    # unpivot the single row into (stage_idx, stage, n_pass) — stack is a
    # projection, not a shuffle
    return agg.select(
        F.expr(
            "stack(5, "
            "0, 'all', n_all, "
            "1, 'min_tokens', n_min_tokens, "
            "2, 'stopword_ratio', n_stopword, "
            "3, 'lang', n_lang, "
            "4, 'exact_dedup', n_exact_dedup) "
            "AS (stage_idx, stage, n_pass)"
        )
    )


def training_prep(
    docs: DataFrame,
    max_tokens: int = 512,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize_kept: bool = True,
    **clean_kwargs,
) -> DataFrame:
    """The full corpus→training-batches flow as ONE lazy Spark program:

        clean_corpus (quality → langid → exact dedup → MinHash near-dedup)
        → assign_splits (deterministic hash-bucket train/val/test)
        → pack_documents per split (first-fit token packing)

    Output: (id, split, n_tokens, pack_id, pack_offset). Shuffle
    inventory at 100 TB: content-hash groupBy, LSH band join, and one
    per-split packing window — the split label is a scan-time
    expression, and packing partitions by split so no global sort
    exists anywhere in the plan.
    """
    from dask_sql_spark.operators.llmprep import assign_splits, pack_documents

    cleaned = clean_corpus(
        docs,
        id_col=id_col,
        text_col=text_col,
        materialize_kept=materialize_kept,
        **clean_kwargs,
    )
    labeled = assign_splits(cleaned, weights=split_weights, key_col=id_col)
    return pack_documents(
        labeled,
        max_tokens=max_tokens,
        id_col=id_col,
        token_count_col="n_tokens",
        partition_col="split",
    )
