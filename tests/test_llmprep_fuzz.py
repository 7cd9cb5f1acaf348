"""Round-9 audit of the deterministic-sampling layer: every
hash-routed llmprep decision (sample membership, split assignment,
quota winners, shard/epoch order, corpus mixing) recomputed by an
independent pure-Python md5 model and compared row-for-row.

The operators promise determinism ACROSS engines and runs; these
sweeps verify the promise against the hash definition itself
(portable_hash64 = first 15 md5 hex digits as a base-16 integer), not
against a second Spark run — so a silent change to the hash or the
bucket arithmetic fails loudly here.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest


def _h64(s: str) -> int:
    """Pure-Python twin of hashing.portable_hash64 (15 hex digits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(n: int = 500) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "source": [f"s{i % 7}" for i in range(n)],
            "text": [f"doc {i}" for i in range(n)],
        }
    )


@pytest.mark.parametrize("fraction,salt", [(0.25, "mix"), (0.8, "other"),
                                           (0.0, "z"), (1.0, "z")])
def test_deterministic_sample_matches_md5_model(spark, fraction, salt):
    from dask_sql_spark.operators.llmprep import deterministic_sample

    pdf = _docs()
    got = sorted(
        r["doc_id"]
        for r in deterministic_sample(
            spark.createDataFrame(pdf), fraction, salt=salt
        ).collect()
    )
    want = sorted(
        i for i in pdf["doc_id"]
        if _h64(f"{salt}{i}") % 1_000_000 < round(fraction * 1_000_000)
    )
    assert got == want
    if fraction == 0.0:
        assert got == []
    if fraction == 1.0:
        assert len(got) == len(pdf)


def test_assign_splits_matches_md5_model_and_is_growth_stable(spark):
    from dask_sql_spark.operators.llmprep import assign_splits

    weights = {"train": 0.9, "validation": 0.06, "test": 0.04}
    pdf = _docs(400)
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            spark.createDataFrame(pdf), weights=weights
        ).collect()
    }

    def model(i):
        b = _h64(f"split{i}") % 1_000_000
        if b < round(0.9 * 1_000_000):
            return "train"
        if b < round(0.96 * 1_000_000):
            return "validation"
        return "test"

    assert got == {i: model(i) for i in pdf["doc_id"]}
    # growth stability: adding rows never reassigns an existing doc
    bigger = assign_splits(
        spark.createDataFrame(_docs(800)), weights=weights
    )
    got2 = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(got2[i] == s for i, s in got.items())


def test_quota_sample_matches_md5_model(spark):
    from dask_sql_spark.operators.llmprep import quota_sample

    pdf = _docs(300)
    quota = 12
    got = sorted(
        (r["source"], r["doc_id"])
        for r in quota_sample(
            spark.createDataFrame(pdf), quota, group_col="source"
        ).collect()
    )
    want = []
    for s, g in pdf.groupby("source"):
        ranked = sorted(g["doc_id"], key=lambda i: (_h64(f"quota{i}"), i))
        want += [(s, i) for i in ranked[:quota]]
    assert got == sorted(want)


def test_shuffle_shards_matches_md5_model(spark):
    from dask_sql_spark.operators.llmprep import shuffle_shards

    pdf = _docs(200)
    n_shards = 5
    rows = shuffle_shards(
        spark.createDataFrame(pdf), n_shards, seed="ep1"
    ).collect()
    got = {
        r["doc_id"]: (r["shuffle_key"], r["shard"], r["shard_pos"])
        for r in rows
    }
    by_shard: dict[int, list] = {}
    for i in pdf["doc_id"]:
        h = _h64(f"ep1:{i}")
        by_shard.setdefault(h % n_shards, []).append((h, i))
    want = {}
    for shard, members in by_shard.items():
        for pos, (h, i) in enumerate(sorted(members), start=1):
            want[i] = (h, shard, pos)
    assert got == want
    # a different seed produces a different epoch order (overwhelmingly)
    rows2 = shuffle_shards(
        spark.createDataFrame(pdf), n_shards, seed="ep2"
    ).collect()
    order1 = sorted((r["shard"], r["shard_pos"], r["doc_id"]) for r in rows)
    order2 = sorted((r["shard"], r["shard_pos"], r["doc_id"]) for r in rows2)
    assert [x[2] for x in order1] != [x[2] for x in order2]


def test_mix_corpora_matches_md5_model(spark):
    from dask_sql_spark.operators.llmprep import mix_corpora

    a, b = _docs(150), _docs(150)
    got = sorted(
        (r["source_id"], r["doc_id"])
        for r in mix_corpora(
            [(spark.createDataFrame(a), 0.5),
             (spark.createDataFrame(b), 0.2)],
        ).collect()
    )
    want = sorted(
        [(0, i) for i in a["doc_id"]
         if _h64(f"mix0{i}") % 1_000_000 < 500_000]
        + [(1, i) for i in b["doc_id"]
           if _h64(f"mix1{i}") % 1_000_000 < 200_000]
    )
    assert got == want
