"""Pinned equivalence: AllPairs/PPJoin prefix-filtered jaccard/containment
vs the legacy bucket-count plan vs an independent pure-Python oracle.

The prefix filter (dedup.ngram_jaccard_pairs prefix_filter=True) must be
LOSSLESS — identical final pair sets and similarity values at every
threshold — while emitting strictly fewer candidate pairs at selective
thresholds (that reduction is the point: SCALING.md's measured 26 GB
candidate shuffle at 5M docs is the operator's scale driver).

The corpus is adversarial by construction: exact dups, planted near-dups
at several edit distances, excerpt/containment pairs, a stopword token in
every doc (hot-shingle path), size-ratio boundary pairs, and short docs
(< n tokens, single-gram semantics).
"""

from __future__ import annotations

import random
import re

import pytest

import dask_sql_spark.operators.dedup as dedup_mod
from dask_sql_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


# --------------------------------------------------------------------- #
# pure-Python oracle (replicates text.tokens / word_ngrams keep_short)   #
# --------------------------------------------------------------------- #
def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in re.split(r"[ \t\n\r\f\v]+", text.strip().lower()) if t]
    hi = max(len(toks) - n, 0)
    grams = {" ".join(toks[i : i + n]) for i in range(hi + 1)}
    return {g for g in grams if g}


def _py_pairs(corpus, threshold, max_df=None, n=3, mode="jaccard"):
    sh = {i: _py_shingles(t, n) for i, t in corpus}
    if max_df is not None:
        df_count: dict[str, int] = {}
        for s in sh.values():
            for g in s:
                df_count[g] = df_count.get(g, 0) + 1
        sh = {
            i: {g for g in s if df_count[g] <= max_df} for i, s in sh.items()
        }
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sh[a] or not sh[b]:
                continue
            common = len(sh[a] & sh[b])
            if common == 0:
                continue
            if mode == "jaccard":
                val = round(common / (len(sh[a]) + len(sh[b]) - common), 6)
                if val >= threshold:
                    out[(a, b)] = val
            else:
                c_ab = round(common / len(sh[a]), 6)
                c_ba = round(common / len(sh[b]), 6)
                val = max(c_ab, c_ba)
                if val >= threshold:
                    direction = (
                        "mutual"
                        if c_ab == c_ba
                        else ("a_in_b" if c_ab > c_ba else "b_in_a")
                    )
                    out[(a, b)] = (val, direction)
    return out


# --------------------------------------------------------------------- #
# adversarial corpus                                                    #
# --------------------------------------------------------------------- #
def _corpus():
    rng = random.Random(0xA11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    i = 0

    def add(text):
        nonlocal i
        docs.append((i, text))
        i += 1

    # random base docs — every doc carries the stopword 'the' (hot shingle)
    for _ in range(30):
        length = rng.randint(3, 22)
        toks = ["the"] + [vocab[rng.randrange(len(vocab))] for _ in range(length)]
        add(" ".join(toks))
    # exact dups + near-dups at several distances
    for src in (0, 3, 7, 11):
        base = docs[src][1].split()
        add(" ".join(base))  # exact
        for k in (1, 2, 4):
            mut = list(base)
            for _ in range(min(k, len(mut))):
                mut[rng.randrange(len(mut))] = vocab[rng.randrange(len(vocab))]
            add(" ".join(mut))
    # containment: excerpts wrapped in long pages
    for src in (1, 5):
        base = docs[src][1].split()
        page = (
            [vocab[rng.randrange(len(vocab))] for _ in range(15)]
            + base
            + [vocab[rng.randrange(len(vocab))] for _ in range(15)]
        )
        add(" ".join(page))
    # short docs (< n tokens → single-gram semantics)
    add("w1 w2")
    add("w1 w2")
    add("w3")
    # size-ratio boundary: small doc vs its 5x repetition-padded twin
    small = "w5 w6 w7 w8 w9"
    add(small)
    add(small + " " + " ".join(f"w{10 + j}" for j in range(25)))
    return docs


@pytest.fixture(scope="module")
def corpus_df(spark):
    corpus = _corpus()
    return corpus, spark.createDataFrame(corpus, ["doc_id", "text"])


THRESHOLDS = [0.12, 1 / 3, 0.5, 0.8, 0.95]


@pytest.mark.parametrize("threshold", THRESHOLDS)
@pytest.mark.parametrize("max_df", [None, 8])
def test_jaccard_prefix_equals_legacy_and_oracle(corpus_df, threshold, max_df):
    corpus, df = corpus_df
    expected = _py_pairs(corpus, threshold, max_df, mode="jaccard")
    got_prefix = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, threshold=threshold, max_df=max_df, prefix_filter=True
        ).collect()
    }
    got_legacy = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, threshold=threshold, max_df=max_df, prefix_filter=False
        ).collect()
    }
    assert got_prefix == got_legacy == expected


@pytest.mark.parametrize("threshold", [0.3, 0.8, 0.95])
@pytest.mark.parametrize("max_df", [None, 8])
def test_containment_prefix_equals_legacy_and_oracle(
    corpus_df, threshold, max_df
):
    corpus, df = corpus_df
    expected = _py_pairs(corpus, threshold, max_df, mode="containment")
    got_prefix = {
        (r.id_a, r.id_b): (r.containment, r.direction)
        for r in containment_pairs(
            df, threshold=threshold, max_df=max_df, prefix_filter=True
        ).collect()
    }
    got_legacy = {
        (r.id_a, r.id_b): (r.containment, r.direction)
        for r in containment_pairs(
            df, threshold=threshold, max_df=max_df, prefix_filter=False
        ).collect()
    }
    assert got_prefix == got_legacy == expected


def test_prefix_emission_is_a_strict_reduction(corpus_df, spark):
    """At a selective threshold the prefix stage must emit strictly fewer
    candidate rows AND strictly fewer candidate pairs than the full
    bucket explode — the measured scale win, pinned as an inequality so
    a silent regression to full emission fails loudly."""
    from pyspark.sql import functions as F

    corpus, df = corpus_df
    t = 0.8
    docs = dedup_mod._prefix_doc_sets(df, "doc_id", "text", 3, t - 1e-6, None)
    full_rows = docs.select(F.explode("set_")).count()
    prefix_rows = docs.select(
        F.explode(F.expr("slice(set_, 1, plen)"))
    ).count()
    assert prefix_rows < full_rows
    # candidate pairs: prefix-bucket pairs vs full-bucket pairs
    def bucket_pairs(rows_df):
        return (
            rows_df.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.sum(F.col("c") * (F.col("c") - 1) / 2))
            .collect()[0][0]
        )

    full = bucket_pairs(
        docs.select("doc_id", F.explode("set_").alias("shingle"))
    )
    pruned = bucket_pairs(
        docs.select(
            "doc_id", F.explode(F.expr("slice(set_, 1, plen)")).alias("shingle")
        )
    )
    assert pruned < full
    # sanity: the reduction is material on this stopword-heavy corpus
    assert pruned <= full * 0.75


def test_prefix_auto_selection_by_threshold(corpus_df):
    """prefix_filter=None resolves by the measured volume model:
    jaccard ≥ 0.5 / containment ≥ 0.75 run the prefix plan (its verify
    stage shows array_intersect in the optimized plan), lower thresholds
    run the legacy bucket-count plan. Explicit True/False still force."""
    _, df = corpus_df

    def plan(q):
        return q._jdf.queryExecution().optimizedPlan().toString()

    assert "array_intersect" in plan(ngram_jaccard_pairs(df, threshold=0.5))
    assert "array_intersect" not in plan(
        ngram_jaccard_pairs(df, threshold=0.12)
    )
    assert "array_intersect" in plan(
        ngram_jaccard_pairs(df, threshold=0.12, prefix_filter=True)
    )
    assert "array_intersect" in plan(containment_pairs(df, threshold=0.75))
    assert "array_intersect" not in plan(containment_pairs(df, threshold=0.3))
    assert "array_intersect" in plan(
        containment_pairs(df, threshold=0.3, prefix_filter=True)
    )


def test_positional_filter_prunes_candidates(corpus_df, spark):
    """The PPJoin positional filter must strictly shrink the
    post-length-filter candidate set at a selective threshold on this
    corpus (it contains excerpt pairs whose only shared prefix tokens sit
    late in the larger doc), while the final pair set stays equal — the
    equality half is already pinned by the oracle tests above, so this
    pins the pruning half as an inequality."""
    from pyspark.sql import functions as F

    corpus, df = corpus_df
    t = 0.8
    t_eff = t - 1e-6
    docs = dedup_mod._prefix_doc_sets(df, "doc_id", "text", 3, t_eff, None)
    pre = docs.select(
        F.col("doc_id").alias("id"),
        "sz",
        F.posexplode(F.expr("slice(set_, 1, plen)")).alias("pos", "shingle"),
    )
    pair_structs = F.expr(
        "flatten(transform(m, (a, i) -> "
        "transform(slice(m, i + 2, size(m) - i - 1), "
        "b -> struct(a.id AS id_a, b.id AS id_b, a.sz AS sz_a, "
        "b.sz AS sz_b, a.pos AS pa, b.pos AS pb))))"
    )
    emitted = (
        pre.groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("id"), F.col("sz"), F.col("pos")))
            ).alias("m")
        )
        .where(F.size("m") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.*")
        .where(
            F.least("sz_a", "sz_b")
            >= F.greatest("sz_a", "sz_b") * F.lit(t_eff) - F.lit(1e-9)
        )
    )
    without_pos = emitted.select("id_a", "id_b").distinct().count()
    req = F.ceil(
        (F.col("sz_a") + F.col("sz_b")) * F.lit(t_eff / (1.0 + t_eff))
        - F.lit(1e-9)
    )
    with_pos = (
        emitted.where(
            F.least("pa", "pb")
            + 1
            + F.least(
                F.col("sz_a") - F.col("pa") - 1,
                F.col("sz_b") - F.col("pb") - 1,
            )
            >= req
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert with_pos < without_pos


def test_prefix_random_fuzz(spark):
    """Seeded fuzz across 5 fresh corpora: prefix path == python oracle
    at a mid threshold (the regime where off-by-one prefix lengths or a
    wrong ceil direction would drop borderline pairs)."""
    for seed in range(5):
        rng = random.Random(1000 + seed)
        vocab = [f"t{i}" for i in range(25)]
        corpus = []
        for i in range(24):
            length = rng.randint(2, 15)
            corpus.append(
                (i, " ".join(vocab[rng.randrange(len(vocab))] for _ in range(length)))
            )
        # clone half with light mutations to create borderline pairs
        for j in range(12):
            base = corpus[j][1].split()
            if base:
                base[rng.randrange(len(base))] = vocab[rng.randrange(len(vocab))]
            corpus.append((24 + j, " ".join(base)))
        df = spark.createDataFrame(corpus, ["doc_id", "text"])
        expected = _py_pairs(corpus, 0.4, None, mode="jaccard")
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                df, threshold=0.4, prefix_filter=True
            ).collect()
        }
        assert got == expected, f"seed {seed}"
