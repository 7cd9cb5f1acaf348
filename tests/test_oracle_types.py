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
