"""Static oracle-schema sweep: no DuckDB oracle may output HUGEINT.

DuckDB types SUM(<integer>) as HUGEINT; `.df()` converts that to float64
while Spark emits int64, so the driver's strict value-hash mismatches even
when values are identical (the round-2 `events_sessionize` red row).  Every
such column must be wrapped in CAST(... AS BIGINT) in the oracle text.
This test runs DESCRIBE over all ~200 oracles (no Spark needed, <10s) so
the class can never reappear.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_no_hugeint_oracle_columns():
    from tools.type_sweep import sweep

    flagged = sweep()
    assert flagged == {}, (
        "oracles with HUGEINT/UHUGEINT output columns (wrap in CAST(... AS "
        f"BIGINT)) or DESCRIBE errors: {flagged}"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_no_engine_divergent_round_double_columns():
    """Class 3 (round-6 `scalar_extract_units` red): a ROUND(x, d>0) that
    stays double in a gate's hashed output diverges between Spark's
    BigDecimal-HALF_UP and DuckDB's multiply-round-divide by 1 ulp once
    |x|*10^d reaches the 2^53 ulp range (epoch scale).  The sweep flags
    epoch-source ROUNDs statically and probes direct ROUND output
    columns' observed magnitude."""
    from tools.type_sweep import round_double_sweep

    flagged = round_double_sweep()
    assert flagged == {}, (
        f"ROUND(x, d>0) staying double at engine-divergent magnitude "
        f"(gate in integer units instead): {flagged}"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_round_double_sweep_catches_the_r6_red_form():
    """The exact gate text that shipped local-green and died driver-red
    in round 6 must be flagged by both triggers."""
    from tools.type_sweep import round_double_sweep

    static_form = {
        "old": "SELECT ROUND(EXTRACT(EPOCH FROM ts), 6) AS ep FROM events"
    }
    assert "old" in round_double_sweep(static_form)
    dynamic_form = {
        "dyn": "SELECT ROUND(x * 1.0, 6) AS ep "
               "FROM (SELECT 1700000000.5::DOUBLE AS x)"
    }
    assert "dyn" in round_double_sweep(dynamic_form)
