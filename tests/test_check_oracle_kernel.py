"""Unit tests for the local correctness-gate comparison kernel
(tools/check_oracle.py norm/compare/value_hash).

Every local certification claim routes through these three functions, so
a regression here would MASK gate bugs rather than cause one.  The tests
pin the properties the round-6 incident taught us to demand:

- a 1-ulp float divergence (Spark BigDecimal-HALF_UP vs DuckDB
  multiply-round-divide on `ROUND(epoch, 6)`) must be DETECTED, both by
  compare()'s exact pass and by value_hash inequality — the tolerant
  isclose() alone is exactly how that defect shipped local-green;
- int64-vs-float64 with equal values must fail (the driver hashes raw
  values, so DuckDB HUGEINT→float64 reads as a different byte stream);
- value_hash must be invariant to row order and column order (the driver
  sorts both) but sensitive to any value change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tools.check_oracle import compare, norm, value_hash


def test_one_ulp_float_divergence_detected():
    # epoch-scale value where the two engines' ROUND(x, 6) can differ by
    # exactly one ulp — the round-6 scalar_extract_units red
    x = 1717171717.123456
    a = pd.DataFrame({"ep": [x]})
    b = pd.DataFrame({"ep": [np.nextafter(x, np.inf)]})
    diff = compare(a, b)
    assert diff is not None and "INEXACT" in diff
    assert value_hash(a) != value_hash(b)


def test_tolerant_close_values_still_compare_exact():
    # within 1e-9 relative but not bit-equal: must NOT pass
    a = pd.DataFrame({"v": [1.0]})
    b = pd.DataFrame({"v": [1.0 + 1e-12]})
    assert compare(a, b) is not None


def test_int_vs_float_dtype_kind_mismatch():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
    diff = compare(a, b)
    assert diff is not None and "DTYPE KIND" in diff
    assert value_hash(a) != value_hash(b)


def test_value_hash_row_and_column_order_invariant():
    a = pd.DataFrame({"k": [2, 1], "v": ["b", "a"]})
    b = pd.DataFrame({"v": ["a", "b"], "k": [1, 2]})
    assert value_hash(a) == value_hash(b)
    assert compare(a, b) is None


def test_value_hash_sensitive_to_single_cell():
    a = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    b = pd.DataFrame({"k": [1, 2], "v": [10, 21]})
    assert value_hash(a) != value_hash(b)
    assert compare(a, b) is not None


def test_null_vs_value_not_conflated():
    a = pd.DataFrame({"v": [1.5, None]})
    b = pd.DataFrame({"v": [1.5, 0.0]})
    assert compare(a, b) is not None
    assert value_hash(a) != value_hash(b)
    # NaN == NaN for gate purposes (both engines emit NULL/NaN there)
    c = pd.DataFrame({"v": [1.5, np.nan]})
    assert compare(a.copy(), c.copy()) is None
    assert value_hash(a) == value_hash(c)


def test_tz_aware_normalizes_to_naive_utc():
    aware = pd.DataFrame(
        {"ts": pd.to_datetime(["2026-01-01 05:30:00"]).tz_localize(
            "Asia/Kolkata"
        )}
    )
    naive = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01 00:00:00"])})
    assert compare(aware.copy(), naive.copy()) is None
    assert value_hash(aware) == value_hash(naive)


def test_row_count_and_column_set_diffs_reported():
    a = pd.DataFrame({"x": [1, 2]})
    assert "row count" in compare(a, pd.DataFrame({"x": [1]}))
    assert "columns" in compare(a, pd.DataFrame({"y": [1, 2]}))


def test_norm_integer_widths_unify():
    # Spark int32 vs DuckDB int64 must compare equal after norm (same
    # KIND, same values) — width is a pandas artifact, not a value diff
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert compare(a, b) is None
    assert value_hash(a) == value_hash(b)
    assert str(norm(a.copy())["n"].dtype) == "Int64"


def test_negative_zero_caught_by_hash_not_compare():
    """-0.0 vs 0.0: numpy == passes (compare() is blind to it) but the
    driver's repr-based raw hash differs — exactly the class only the
    value_hash/bitwise layer can catch.  Pins why hostile_check and
    --bitwise both hash even after compare() passes."""
    a = pd.DataFrame({"v": [0.0]})
    b = pd.DataFrame({"v": [-0.0]})
    assert compare(a.copy(), b.copy()) is None
    assert value_hash(a) != value_hash(b)
