"""Property-based check of the SIMILAR TO → regex transpiler against
DuckDB's native SIMILAR TO (hypothesis fuzz; mirrors the spirit of the
reference's randomized compatibility corpus at the unit level)."""

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dask_sql_spark.dialect import sql_similar_to_regex

# pattern alphabet: literals + regex metacharacters. NOTE: %/_ are
# excluded — DuckDB's SIMILAR TO is plain full-match regex and does NOT
# expand SQL wildcards (Postgres/Calcite, which the reference follows,
# does). The wildcard translation is pinned by unit tests in
# test_dialect.py instead; this fuzz covers passthrough + anchoring.
_PATTERN_CHARS = st.sampled_from(list("abc|*+()"))
_TARGET_CHARS = st.sampled_from(list("abc"))


def _valid_pattern(p: str) -> bool:
    """Keep only patterns DuckDB accepts (balanced parens etc.)."""
    try:
        duckdb.execute(f"SELECT 'x' SIMILAR TO '{p}'").fetchone()
        return True
    except Exception:
        return False


@settings(max_examples=150, deadline=None)
@given(
    pattern=st.text(_PATTERN_CHARS, min_size=1, max_size=8),
    target=st.text(_TARGET_CHARS, min_size=0, max_size=6),
)
def test_similar_to_matches_duckdb(pattern, target):
    if not _valid_pattern(pattern):
        return
    expected = duckdb.execute(
        "SELECT ? SIMILAR TO ?", [target, pattern]
    ).fetchone()[0]
    regex = sql_similar_to_regex(pattern)
    try:
        actual = re.match(regex, target) is not None
    except re.error:
        pytest.fail(f"transpiled regex invalid: {pattern!r} -> {regex!r}")
    assert actual == expected, (
        f"pattern={pattern!r} target={target!r} regex={regex!r}"
    )
