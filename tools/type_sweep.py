"""DESCRIBE-based type sweep over every oracle_sql() entry.

DuckDB types SUM(<integer>) as HUGEINT, which pandas `.df()` converts to
float64 while Spark returns int64 — the driver's strict value-hash then
mismatches even when the values are identical (round-2 `events_sessionize`
red row).  This sweep catches the whole class statically: any oracle whose
DESCRIBE output contains HUGEINT/UHUGEINT (or any other type pandas maps
to float while Spark would emit an integer) is flagged.

Usage: python tools/type_sweep.py   (exit 1 if any flagged)
Also imported by tests/test_oracle_types.py so the class can never return.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose pandas conversion loses exactness vs Spark's integer output.
BAD_TYPES = ("HUGEINT", "UHUGEINT")


def sweep() -> dict[str, list[tuple[str, str]]]:
    """Return {query_name: [(column, duckdb_type), ...]} for every oracle
    whose output schema contains a BAD_TYPES column."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    flagged: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # DESCRIBE should work on every SELECT
            errors[name] = str(exc).splitlines()[0]
            continue
        bad = [
            (col, typ) for col, typ, *_ in desc
            if any(b in typ.upper() for b in BAD_TYPES)
        ]
        if bad:
            flagged[name] = bad
    if errors:
        flagged["__describe_errors__"] = sorted(errors.items())
    return flagged


def main() -> int:
    flagged = sweep()
    if not flagged:
        print("type sweep clean: no HUGEINT/UHUGEINT oracle columns")
        return 0
    for name, cols in sorted(flagged.items()):
        print(f"FLAG  {name}: {cols}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
