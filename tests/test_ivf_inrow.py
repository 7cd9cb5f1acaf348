"""Focused equivalence tests for the r13 in-row IVF cell assignment /
query-cell ranking (similarity._assign_cells / _rank_query_cells):
the array_max / sort_array struct ordering must reproduce the old
``row_number() OVER (ORDER BY acos DESC, cell ASC)`` decisions,
including cosine ties and NULL (zero-norm) cosines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_sql_spark.operators.similarity import (
    _assign_cells,
    _rank_query_cells,
)


@pytest.fixture(scope="module")
def cents(spark):
    # cell 2 and cell 0 are IDENTICAL centroids → every vector's cosine
    # ties between them; the tie must break toward the smaller cell id
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.0]),
        ],
        "cell INT, centroid ARRAY<DOUBLE>",
    )


def test_assign_max_cosine_and_tie_break(spark, cents):
    c = spark.createDataFrame(
        [
            (10, [2.0, 0.1]),   # closest to x-axis → tie cells 0/2 → 0
            (11, [0.1, 3.0]),   # closest to y-axis → cell 1
            (12, [0.0, 0.0]),   # zero norm: every cosine NULL → cell 0
        ],
        "id_b BIGINT, vb ARRAY<DOUBLE>",
    )
    out = {
        r["id_b"]: r["cell"] for r in _assign_cells(c, cents).collect()
    }
    assert out == {10: 0, 11: 1, 12: 0}


def test_rank_query_cells_order_and_ties(spark, cents):
    q = spark.createDataFrame(
        [(1, [1.0, 1.0])], "query_id BIGINT, vq ARRAY<DOUBLE>"
    )
    # cos equal against all three centroids → order purely by cell asc
    rows = _rank_query_cells(q, cents, 2).orderBy("cell").collect()
    assert [r["cell"] for r in rows] == [0, 1]
    # n_probe beyond n_cells returns all cells, never duplicates
    rows = _rank_query_cells(q, cents, 10).orderBy("cell").collect()
    assert [r["cell"] for r in rows] == [0, 1, 2]


def test_zero_norm_query_ranks_by_cell(spark, cents):
    q = spark.createDataFrame(
        [(7, [0.0, 0.0])], "query_id BIGINT, vq ARRAY<DOUBLE>"
    )
    rows = _rank_query_cells(q, cents, 2).orderBy("cell").collect()
    # all cosines NULL → the old DESC NULLS LAST window ranked by cell
    assert [r["cell"] for r in rows] == [0, 1]


def test_empty_codebook_and_zero_probe(spark, cents):
    c = spark.createDataFrame(
        [(1, [1.0, 0.0])], "id_b BIGINT, vb ARRAY<DOUBLE>"
    )
    empty = cents.where(F.lit(False))
    assert _assign_cells(c, empty).count() == 0
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id BIGINT, vq ARRAY<DOUBLE>"
    )
    assert _rank_query_cells(q, cents, 0).count() == 0
