"""Static type sweeps over every oracle_sql() entry.

Two red-row classes are caught here so they can never return:

1. HUGEINT (round-2 `events_sessionize`): DuckDB types SUM(<integer>) as
   HUGEINT, which pandas `.df()` converts to float64 while Spark returns
   int64 — the driver's strict value-hash then mismatches even when the
   values are identical.  Any oracle whose DESCRIBE output contains
   HUGEINT/UHUGEINT is flagged.

2. double→DECIMAL casts (round-3 `stmt_merge_into` / `join_salted`):
   casting a DOUBLE to DECIMAL rounds at the target scale, and that
   rounding proved engine-BUILD-dependent — the builder's local DuckDB
   matched Spark bitwise while the driver's DuckDB did not.  The
   rounding-neutral form is CAST(ROUND(x * 10^s) AS BIGINT) integer
   units (plain IEEE ops, identical everywhere).  Any CAST(expr AS
   DECIMAL) in an oracle where expr types as DOUBLE/FLOAT is flagged;
   integer→DECIMAL casts (exact, used for wide products) are fine.

Usage: python tools/type_sweep.py   (exit 1 if any flagged)
Also imported by tests/test_oracle_types.py so the classes can't return.
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


_CAST_RE = None


def _decimal_cast_args(sql: str) -> list[str]:
    """Inner expressions of every ``CAST(<expr> AS DECIMAL...)`` in sql,
    extracted with paren balancing (regex alone can't nest)."""
    import re

    out = []
    for m in re.finditer(r"CAST\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[m.end(): i - 1]
        # the cast's own "AS <type>" sits at paren-depth 0 of inner;
        # nested casts' AS keywords are at depth > 0 and must not match
        depth = 0
        for am in re.finditer(r"\sAS\s+DECIMAL\s*\(", inner, re.IGNORECASE):
            if inner[: am.start()].count("(") == inner[: am.start()].count(")"):
                out.append(inner[: am.start()].strip())
                break
    return out


def decimal_cast_sweep() -> dict[str, list[str]]:
    """{query_name: [risky cast argument, ...]} for every oracle that
    casts a possibly-non-integer expression to DECIMAL.

    The check is PURELY LEXICAL (no DuckDB typing — cast arguments often
    reference CTE-local names that no standalone probe can resolve): an
    argument passes only if it is a ``ROUND(...)``-wrapped expression
    (rounding makes the cast exact) or one of the fully-enumerated
    integer-valued names the audited oracles actually use — ``gap_us``
    (epoch-microsecond difference, BIGINT in both engines) and ``r_m``
    (micro-unit revenue, already ``CAST(ROUND(..*1e6) AS BIGINT)`` at its
    definition), bare or under a single SUM. ANY other shape — including
    a bare identifier that merely looks integer-ish — is flagged and must
    either be rewritten to integer units or added here with a comment
    proving its integer provenance."""
    import re

    import __spark_entry__ as entrymod

    flagged: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        risky = []
        for arg in _decimal_cast_args(sql):
            # ROUND(...)-wrapped args are exact at the cast
            if re.fullmatch(r"ROUND\s*\(.*\)", arg, re.IGNORECASE | re.DOTALL):
                continue
            if re.fullmatch(
                r"(gap_us|r_m|SUM\s*\(\s*(r_m|gap_us)\s*\))",
                arg,
                re.IGNORECASE,
            ):
                continue
            risky.append(arg)
        if risky:
            flagged[name] = risky
    return flagged


_DOUBLE_COLS = (
    "l_quantity|l_extendedprice|l_discount|l_tax|o_totalprice"
    "|c_acctbal|s_acctbal|value|p_retailprice"
)
# raw double aggregates that are deterministic anyway, reviewed by hand:
# integer-valued quantities (sums exact below 2^53), window prefix sums
# (ROWS frames are order-defined so both engines add in the same
# sequence), and the MeanRegressor replay (model-side mean, ROUND(,4)
# masked on both sides by construction).
_DOUBLE_AGG_REVIEWED = {
    "q17_small_quantity", "q18_large_orders", "window_named_clause",
    "ml_predict_mean",
}


def double_agg_sweep() -> dict[str, list[str]]:
    """INFORMATIONAL: {query: [agg args]} where an oracle SUMs/AVGs a
    raw double column with no integer scaling — order-dependent float
    summation that two engines (or two builds) may disagree on in the
    last ulp. Acceptable only when a final ROUND collapses the noise or
    the value feeds a far-from-boundary comparison; the preferred form
    is the integer-scaled sum (see decimal_cast_sweep docstring)."""
    import re

    import __spark_entry__ as entrymod

    flagged: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        if name in _DOUBLE_AGG_REVIEWED:
            continue
        hits = []
        for mt in re.finditer(r"(SUM|AVG)\s*\(", sql, re.IGNORECASE):
            depth, i = 1, mt.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            arg = sql[mt.end(): i - 1]
            if (
                re.search(_DOUBLE_COLS, arg)
                and not re.search(r"ROUND|BIGINT|DECIMAL", arg, re.IGNORECASE)
            ):
                hits.append(arg.strip()[:60])
        if hits:
            flagged[name] = hits
    return flagged


# ------------------------------------------------------------------ #
# Class 3 (round-6 `scalar_extract_units`): ROUND(x, d>0) that STAYS  #
# double in the hashed output.                                        #
# ------------------------------------------------------------------ #
# Rounding x to d decimal digits is engine-stable only while the
# rounding quantum dwarfs the argument's ulp: both engines then pick the
# same integer n = round(x*10^d) and IEEE division / decimal→double
# conversion both yield the identical nearest double to n/10^d.  At
# epoch scale (|x|·10^d ~ 1.7e15) ulp(x·10^d) is 0.25 — Spark's
# BigDecimal-HALF_UP and DuckDB's multiply-round-divide can pick
# integers 1 apart, which is exactly how `scalar_extract_units` shipped
# local-green (1e-9-tolerant checker) and died driver-red (raw-value
# hash).  Two triggers:
#   (a) STATIC: the ROUND argument references an epoch-scale source
#       (EXTRACT(EPOCH), epoch_us/ms/ns, unix_micros/millis/seconds) —
#       flagged unconditionally; gate such columns in integer units.
#   (b) DYNAMIC: the site is a direct output column (`ROUND(...) AS c`)
#       and the observed max|c|·10^d reaches ulp ≥ 1e-3 of 0.5 — i.e.
#       max|c|·10^d ≥ 2^53·1e-3 ≈ 9.0e12 (500× safety margin on the
#       0.5 flip boundary).
_EPOCH_SOURCE_RE = None  # built lazily; module stays import-light


def _round_sites(sql: str) -> list[tuple[str, int, int, str | None]]:
    """Every ``ROUND(<arg>, <d>)`` with literal d>0 NOT enclosed in a
    CAST(... AS <integer type>), as (arg, d, position, alias-or-None);
    alias is captured when the site is immediately ``AS <name>``."""
    import re

    sites = []
    for m in re.finditer(r"\bROUND\s*\(", sql, re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[m.end(): i - 1]
        d0, last = 0, None
        for j, ch in enumerate(inner):
            if ch == "(":
                d0 += 1
            elif ch == ")":
                d0 -= 1
            elif ch == "," and d0 == 0:
                last = j
        if last is None:
            continue  # ROUND(x): integer-valued, exact under the r4 rule
        scale = inner[last + 1:].strip()
        if not re.fullmatch(r"\d+", scale) or int(scale) == 0:
            continue
        # enclosed in an integer CAST → never double in the output
        in_int_cast = False
        for cm in re.finditer(r"\bCAST\s*\(", sql[: m.start()], re.IGNORECASE):
            depth, k = 1, cm.end()
            while k < len(sql) and depth:
                if sql[k] == "(":
                    depth += 1
                elif sql[k] == ")":
                    depth -= 1
                k += 1
            if k > i and re.search(
                r"\sAS\s+(BIGINT|INT(EGER)?|SMALLINT|TINYINT)\s*$",
                sql[cm.end(): k - 1].strip(),
                re.IGNORECASE,
            ):
                in_int_cast = True
                break
        if in_int_cast:
            continue
        am = re.match(r"\s+AS\s+(\w+)", sql[i:], re.IGNORECASE)
        sites.append(
            (inner[:last].strip(), int(scale), m.start(), am.group(1) if am else None)
        )
    return sites


def round_double_sweep(
    oracles: dict[str, str] | None = None,
) -> dict[str, list[str]]:
    """{query_name: [reason, ...]} for oracles where a ROUND(x, d>0)
    stays double in the hashed output at engine-divergent magnitude."""
    import re

    if oracles is None:
        import __spark_entry__ as entrymod

        oracles = entrymod.oracle_sql()
    epoch_re = re.compile(
        r"EXTRACT\s*\(\s*EPOCH|epoch_(us|ms|ns|s)\s*\(|"
        r"unix_(micros|millis|seconds)\s*\(",
        re.IGNORECASE,
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    flagged: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        reasons: list[str] = []
        probes: list[tuple[str, int]] = []
        for arg, d, _pos, alias in _round_sites(sql):
            if epoch_re.search(arg):
                reasons.append(
                    f"ROUND({arg[:60]}, {d}) over an epoch-scale source "
                    "stays double — gate in integer units"
                )
            elif alias is not None:
                probes.append((alias, d))
        if probes:
            try:
                desc = {
                    col: typ
                    for col, typ, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
                }
                todo = [
                    (a, d) for a, d in probes
                    if desc.get(a, "").upper() in ("DOUBLE", "FLOAT", "REAL")
                ]
                if todo:
                    exprs = ", ".join(
                        f'max(abs("{a}")) AS "m_{i}"' for i, (a, _) in enumerate(todo)
                    )
                    row = con.execute(
                        f"SELECT {exprs} FROM ({sql}) __t"
                    ).fetchone()
                    for (a, d), mx in zip(todo, row):
                        if mx is not None and float(mx) * (10 ** d) >= 2**53 * 1e-3:
                            reasons.append(
                                f"ROUND(..., {d}) AS {a}: max|x|={float(mx):.3g} "
                                f"puts x*10^{d} at ulp >= 1e-3 — engines may "
                                "round to different integers; gate in integer "
                                "units"
                            )
            except Exception as exc:
                reasons.append(f"probe error: {str(exc).splitlines()[0][:120]}")
        if reasons:
            flagged[name] = reasons
    return flagged


def main() -> int:
    flagged = sweep()
    dec = decimal_cast_sweep()
    rnd = round_double_sweep()
    for name, args in sorted(double_agg_sweep().items()):
        print(f"WARN-DOUBLE-AGG  {name}: {args}")
    if not flagged and not dec and not rnd:
        print(
            "type sweep clean: no HUGEINT/UHUGEINT oracle columns, "
            "no double→DECIMAL casts, no engine-divergent ROUND-double "
            "output columns"
        )
        return 0
    for name, cols in sorted(flagged.items()):
        print(f"FLAG  {name}: {cols}")
    for name, args in sorted(dec.items()):
        print(f"FLAG-DECIMAL  {name}: {args}")
    for name, args in sorted(rnd.items()):
        print(f"FLAG-ROUND-DOUBLE  {name}: {args}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
