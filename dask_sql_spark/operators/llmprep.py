"""LLM training-data preparation: sequence packing and document chunking.

Two operations every pretraining pipeline runs between "clean corpus" and
"training batches":

- :func:`pack_documents` — assign documents to fixed-token-budget packs
  (sequence packing). Exact bin packing is NP-hard and inherently
  sequential; the standard streaming form — walk documents in a
  deterministic order, cut a new pack when the running total crosses the
  budget — is expressible as ONE window cumulative sum, so it scales as a
  single sort-shuffle. A pack may overflow by at most one document (the
  straddler goes into the pack its first token lands in), matching the
  common "first-fit in stream order" semantics.

- :func:`chunk_documents` — split each document into ``chunk_tokens``-token
  windows advancing by ``chunk_tokens - overlap`` (sliding context
  windows). Pure array ops: tokenize once, slice per window, explode —
  narrow transform except the tokenize, no shuffle at all.

Both are deterministic and SQL-expressible, so they sit under the DuckDB
value-hash oracle like the relational operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    partition_col: str | None = None,
    shards: int | None = None,
) -> DataFrame:
    """(id, n_tokens, pack_id, pack_offset) — streaming first-fit packing
    in ``id_col`` order.

    ``pack_id`` = which budget window the document's FIRST token falls in
    under a running total; ``pack_offset`` = the document's token offset
    within the stream. With ``token_count_col`` the caller supplies counts
    (e.g. real BPE lengths); otherwise whitespace tokens are counted.

    ``partition_col`` packs independently per partition value (e.g. per
    split) — a partitioned window that shuffles once on that key instead
    of sorting globally. A cumulative window still funnels each
    partition value through ONE task, so with a handful of splits the
    cumsum stage caps at that many tasks. ``shards=N`` is the 100 TB
    form: documents land deterministically in ``xxhash64(id) mod N``
    sub-shards, packing runs per (partition, shard) — N-way parallel —
    and ``pack_id`` = ``shard * 2^40 + local_pack`` stays globally
    unique. Packs never need to be globally ordered, only internally
    budgeted, so sharded packing is exactly as valid a batch plan as the
    serial one (each pack still fills in id order within its shard).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    keep = [id_col] + ([partition_col] if partition_col else [])
    if token_count_col is None:
        counted = df.select(
            *keep, F.size(_tokens(text_col)).alias("n_tokens")
        )
    else:
        counted = df.select(
            *keep, F.col(token_count_col).alias("n_tokens")
        )
    part_cols = [partition_col] if partition_col else []
    if shards is not None:
        counted = counted.withColumn(
            "__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
        )
        part_cols = part_cols + ["__shard"]
    base = Window.partitionBy(*part_cols) if part_cols else Window
    w = base.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    local_pack = F.floor(
        (F.col("running") - F.col("n_tokens")) / max_tokens
    ).cast("long")
    pack_id = (
        (F.col("__shard") * F.lit(1 << 40) + local_pack)
        if shards is not None
        else local_pack
    )
    return (
        counted.withColumn("running", F.sum("n_tokens").over(w))
        .select(
            *keep,
            "n_tokens",
            pack_id.alias("pack_id"),
            (F.col("running") - F.col("n_tokens")).alias("pack_offset"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, chunk_len) — sliding token windows.

    Windows start every ``chunk_tokens - overlap`` tokens; the final
    partial window is kept (standard context-window chunking). Tokenize →
    per-start slice → explode: all array expressions, no Python, no
    shuffle.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tokens(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.size(toks) - F.lit(1)) / stride, F.lit(0)
        ).cast("int"),
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(
                F.slice(toks, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size(toks) - i * stride, F.lit(chunk_tokens)
            ).alias("chunk_len"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.chunk_len").alias("chunk_len"),
        )
        .where(F.col("chunk_len") > 0)
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Reproducible Bernoulli-style sample: keep rows whose md5-derived
    hash bucket of (salt, key) falls under ``fraction``. No RNG — the same
    rows are selected on every run, on every engine (the DuckDB oracle
    reproduces the bucket math), and changing ``salt`` draws an independent
    sample. Pure codegen filter: at 100 TB this is a scan-time predicate,
    no shuffle."""
    from dask_sql_spark.operators.hashing import portable_hash64

    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = portable_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ) % 1_000_000
    return df.where(bucket < int(round(fraction * 1_000_000)))


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Dataset mixing for training runs: union of deterministic samples of
    each source at its configured fraction, tagged with ``source_id``.
    Each source keeps its own salt stream (salt + index), so per-source
    fractions are independent. Schemas must be union-compatible."""
    if not sources:
        raise ValueError("sources must be non-empty")
    parts = []
    for i, (df, fraction) in enumerate(sources):
        parts.append(
            deterministic_sample(
                df, fraction, key_col=key_col, salt=f"{salt}{i}"
            ).withColumn("source_id", F.lit(i))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quota_sample(
    df: DataFrame,
    quota: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Cap each group at ``quota`` rows, chosen by a deterministic
    md5-derived shuffle of the keys (no RNG — reproducible on every run
    and engine). The standard over-represented-domain downsampler in
    corpus curation: one shuffle on ``group_col`` for the rank window.

    Skew note: a single giant group serializes into one window task at
    scale; for pathological domains pre-filter with
    ``deterministic_sample`` to approach the quota before exact ranking.
    """
    from pyspark.sql.window import Window

    from dask_sql_spark.operators.hashing import portable_hash64

    order_key = portable_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row's
    md5-derived hash bucket of (salt, key) indexes into cumulative
    weight thresholds. Adds a ``split`` column.

    The properties a training pipeline needs and RNG splits lack:
    stable under re-runs and row reordering (hash of the key, not of
    position), stable under corpus growth (an existing doc never changes
    split when new docs arrive), and engine-portable (the DuckDB oracle
    reproduces every assignment). Pure codegen expression — scan-time
    label, no shuffle at any scale.
    """
    from dask_sql_spark.operators.hashing import portable_hash64

    weights = weights or {"train": 0.98, "validation": 0.01, "test": 0.01}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = portable_hash64(
        F.concat(F.lit(salt), F.col(key_col).cast("string"))
    ) % 1_000_000
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * 1_000_000))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(names[-1])
    return df.withColumn(
        "split", last if expr is None else expr.otherwise(last)
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: str = "shuffle-0",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard assignment:
    adds (shuffle_key, shard, shard_pos) where ``shard = hash % n_shards``
    and ``shard_pos`` is the hash-order rank within the shard.

    The properties a training run needs that RNG shuffles lack:
    reproducible across re-runs and engines (md5 of seed:key, no RNG
    state), hash-uniform shard sizes, and a new ``seed`` gives an
    independent epoch order without rewriting data. Cost model: ONE
    shuffle on the shard key; the within-shard rank is a sort inside that
    exchange, never a global sort. At 100 TB follow with
    ``.repartition(n_shards, "shard")`` + ``partitionBy("shard")`` on the
    sink so the window and the write share the exchange.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql.window import Window

    from dask_sql_spark.operators.hashing import portable_hash64

    h = portable_hash64(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", key_col)
    return (
        df.withColumn("shuffle_key", h)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w))
    )


def pack_stats(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing-efficiency audit over :func:`pack_documents`: per pack,
    the document count, token fill, and fill ratio vs the budget. The
    fill-ratio distribution is THE quality metric for a packing policy —
    mean fill below ~0.95 means the stream order wastes context windows.
    One extra aggregate on pack_id after the packing window."""
    packed = pack_documents(
        df, max_tokens=max_tokens, id_col=id_col, text_col=text_col
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("n_tokens") / F.lit(float(max_tokens)), 4),
        )
    )


def deterministic_topk_sample(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    salt: str = "evalset",
) -> DataFrame:
    """Exactly-k uniform-ish sample: rank every row by its md5-derived
    hash of (salt, key) and keep the k smallest — the reproducible way
    to carve a fixed-size eval set from a corpus of unknown size
    (fraction-based sampling can't hit an exact count).

    Plans as TakeOrderedAndProject: each partition keeps its local
    top-k, the driver merges k·partitions candidates — no full sort,
    no full shuffle, scales to any corpus size.
    """
    from dask_sql_spark.operators.hashing import portable_hash64

    h = portable_hash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h"), F.col(key_col))
        .limit(k)
        .drop("__h")
    )


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly-``k`` rows allocated across strata by the largest-remainder
    (Hamilton) method, proportional to stratum size — the eval-set /
    curriculum sampler that keeps every language (or source) represented
    at its corpus share, with a deterministic pseudo-random pick inside
    each stratum.

    Allocation is pure INTEGER arithmetic — ``base_g = (k·n_g) div N``,
    remainders ranked by ``(k·n_g) mod N`` — so the per-stratum quotas
    are bit-identical across engines (no float floor edge cases). The
    leftover ``k - Σ base_g`` seats go to the largest remainders
    (stratum name breaks ties).

    Plan: one groupBy builds the tiny strata relation; quotas are window
    functions over it (rows = #strata, negligible); the quota table
    broadcast-joins back; within a stratum rows are ranked by the
    md5-derived hash of (salt, key) — reproducible, uniform-ish — and
    ``row_number ≤ alloc`` keeps the sample. One corpus shuffle total
    (the per-stratum rank); no driver-side state. Requires k ≤ N (the
    Hamilton quota then never exceeds the stratum size).

    Output: the sampled rows (strata_col, key_col), plus the stratum's
    final allocation for auditability.
    """
    from pyspark.sql.window import Window

    from dask_sql_spark.operators.hashing import portable_hash64

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_g"))
    wall = Window.partitionBy()
    quota = (
        counts.withColumn("total", F.sum("n_g").over(wall))
        .withColumn("base", F.expr(f"({k} * n_g) DIV total"))
        .withColumn("rem", F.expr(f"({k} * n_g) % total"))
        .withColumn("leftover", F.lit(k) - F.sum("base").over(wall))
        .withColumn(
            "rem_rank",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.col("rem").desc(), F.col(strata_col).asc()
                )
            ),
        )
        .withColumn(
            "alloc",
            F.col("base")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0),
        )
        .select(strata_col, "alloc")
    )
    h = portable_hash64(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(F.col("__h"), F.col(key_col))
    return (
        df.join(F.broadcast(quota), strata_col)
        .withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("alloc"))
        .select(strata_col, key_col, "alloc")
    )


def dataset_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str | None = "source",
) -> DataFrame:
    """One-row dataset card — the summary table every training-corpus
    release ships: document/distinct-content counts and exact-dup rate,
    token totals and distribution (mean/p50/p95), English share by the
    stopword language-ID, and source fan-out.

    Cost model: a narrow projection (token count, lang score, content
    hash are all scan-time expressions) into ONE global aggregate —
    map-side partials collapse each partition to a single row, so the
    shuffle is ~n_partitions rows at any corpus size. The exact
    percentiles are the only memory-heavy part at 100 TB; swap
    ``percentile`` for ``approx_percentile`` there (documented knob, the
    card loses oracle-exactness but nothing else).
    """
    from dask_sql_spark.operators.text import STOPWORDS, tokens

    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    is_en = (best > 0) & (scores["en"] == best)  # en wins ties (priority)
    proj = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__h"),
        F.size(toks).alias("__nt"),
        is_en.cast("int").alias("__en"),
        *( [F.col(source_col)] if source_col else [] ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__h").alias("n_distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct("__h") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.sum("__nt").cast("bigint").alias("total_tokens"),
        F.round(F.avg("__nt"), 6).alias("mean_tokens"),
        F.round(F.expr("percentile(__nt, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__nt, 0.95)"), 6).alias("p95_tokens"),
        F.round(F.avg("__en"), 6).alias("pct_en"),
    ]
    if source_col:
        aggs.append(F.countDistinct(source_col).alias("n_sources"))
    return proj.agg(*aggs)


def source_quality_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source slice of :func:`dataset_card` — the mixing table every
    multi-source corpus release ships: doc/distinct counts and dup rate,
    token totals and p50/p95, English share, all keyed by source.

    Same cost shape as the card: one narrow scan projection (token count,
    en-flag and content hash are scan-time expressions) into a single
    groupBy(source) — map-side partials mean the shuffle carries one row
    per (partition, source). Exact percentiles are the documented memory
    knob at 100 TB (swap for ``approx_percentile`` and lose only
    oracle-exactness).
    """
    from dask_sql_spark.operators.text import STOPWORDS, tokens

    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    is_en = (best > 0) & (scores["en"] == best)  # en wins ties (priority)
    proj = df.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("__h"),
        F.size(toks).alias("__nt"),
        is_en.cast("int").alias("__en"),
    )
    return proj.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__h").alias("n_distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct("__h") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.sum("__nt").cast("bigint").alias("total_tokens"),
        F.round(F.avg("__nt"), 6).alias("mean_tokens"),
        F.round(F.expr("percentile(__nt, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__nt, 0.95)"), 6).alias("p95_tokens"),
        F.round(F.avg("__en"), 6).alias("pct_en"),
    )


def curriculum_order(
    df: DataFrame,
    n_stages: int = 4,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "curriculum-0",
) -> DataFrame:
    """Curriculum-learning training order: documents staged easy→hard by
    token-count quantile, deterministically shuffled *within* each stage.
    Training loops that warm up on short documents before long ones read
    shards in (stage, shard, shard_pos) order.

    Scale design: staging does NOT use NTILE — a global NTILE is an
    all-rows window over one ORDER BY (single-partition at 100 TB).
    Instead the exact stage thresholds come from ONE map-combinable
    ``percentile`` scalar aggregate, broadcast back as a 1-row cross
    join, and each doc's stage is a threshold count. The within-stage
    shuffle reuses the :func:`shuffle_shards` discipline (md5 order,
    bounded (stage, shard) window partitions — never one global sort).
    Dyadic quantiles (k/n_stages with n_stages a power of 2) interpolate
    IEEE-exactly over integer token counts, so stage assignment
    reproduces bit-for-bit in the DuckDB oracle.

    Output: (id, difficulty, stage 1..n_stages, shard, shard_pos).
    """
    if n_stages < 2 or (n_stages & (n_stages - 1)) != 0:
        raise ValueError("n_stages must be a power of two >= 2")
    from dask_sql_spark.operators.hashing import portable_hash64
    from dask_sql_spark.operators.text import token_count
    from dask_sql_spark.operators.util import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col), token_count(F.col(text_col)).alias("difficulty")
    )
    qs = [i / n_stages for i in range(1, n_stages)]
    th = base.agg(
        F.percentile("difficulty", F.array(*[F.lit(q) for q in qs])).alias(
            "th"
        )
    )
    h = portable_hash64(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("stage", "shard").orderBy("shuffle_key", id_col)
    return (
        base.join(F.broadcast(th))
        .withColumn(
            "stage",
            (
                F.size(
                    F.filter("th", lambda t: F.col("difficulty") >= t)
                )
                + 1
            ).cast("int"),
        )
        .withColumn("shuffle_key", h)
        .withColumn(
            "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w))
        .select(id_col, "difficulty", "stage", "shard", "shard_pos")
    )
