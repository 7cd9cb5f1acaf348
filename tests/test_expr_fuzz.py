"""Property-based differential fuzz of the scalar expression layer.

Hypothesis composes random expressions from a grammar with known
Spark/DuckDB parity (integer arithmetic, comparisons, CASE, LEAST/
GREATEST, ABS, string concat/case/substr/length) and evaluates
``SELECT <expr> AS v`` on both engines. Integer-only arithmetic keeps
results bit-exact; division uses Spark's DIV (truncating) against
DuckDB's ``//`` which matches (truncation toward zero, pinned in
round-1 memory and int_division's oracle).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st


def _eval_pair(context, duck, spark_sql, duck_sql):
    """Run the same scalar expression on both engines, capturing errors.

    Both engines run in strict/ANSI mode here, so a random expression can
    legitimately raise (e.g. INT32 overflow: Spark ANSI raises
    ARITHMETIC_OVERFLOW and DuckDB raises OutOfRange on the identical
    input). An exception is only a fuzz failure when the engines
    DISAGREE — one raises while the other returns a value. Returns
    ``(spark_value, spark_raised, duck_value, duck_raised)``.
    """
    got = want = None
    spark_raised = duck_raised = False
    try:
        got = context.sql(f"SELECT {spark_sql} AS v").collect()[0].v
    except Exception:
        spark_raised = True
    try:
        want = duck.execute(f"SELECT {duck_sql} AS v").fetchone()[0]
    except Exception:
        duck_raised = True
    return got, spark_raised, want, duck_raised


def _assert_parity(context, duck, spark_sql, duck_sql):
    got, spark_raised, want, duck_raised = _eval_pair(
        context, duck, spark_sql, duck_sql
    )
    if spark_raised or duck_raised:
        assert spark_raised and duck_raised, (
            f"error-parity mismatch: {spark_sql!r} -> "
            f"{'raised' if spark_raised else got!r} vs {duck_sql!r} -> "
            f"{'raised' if duck_raised else want!r}"
        )
        return
    assert got == want, f"{spark_sql!r} -> {got} vs {duck_sql!r} -> {want}"


@st.composite
def int_expr(draw, depth=0):
    """Returns (spark_sql, duck_sql) for an integer-valued expression."""
    if depth >= 3 or draw(st.booleans()):
        n = draw(st.integers(min_value=-99, max_value=99))
        return str(n), str(n)
    kind = draw(
        st.sampled_from(["add", "sub", "mul", "div", "abs", "least", "greatest", "case"])
    )
    a_s, a_d = draw(int_expr(depth=depth + 1))
    b_s, b_d = draw(int_expr(depth=depth + 1))
    if kind == "add":
        return f"({a_s} + {b_s})", f"({a_d} + {b_d})"
    if kind == "sub":
        return f"({a_s} - {b_s})", f"({a_d} - {b_d})"
    if kind == "mul":
        return f"({a_s} * {b_s})", f"({a_d} * {b_d})"
    if kind == "div":
        # truncating integer division; both engines raise on /0 so guard
        return (
            f"({a_s} DIV CASE WHEN {b_s} = 0 THEN 1 ELSE {b_s} END)",
            f"({a_d} // CASE WHEN {b_d} = 0 THEN 1 ELSE {b_d} END)",
        )
    if kind == "abs":
        return f"ABS({a_s})", f"ABS({a_d})"
    if kind == "least":
        return f"LEAST({a_s}, {b_s})", f"LEAST({a_d}, {b_d})"
    if kind == "greatest":
        return f"GREATEST({a_s}, {b_s})", f"GREATEST({a_d}, {b_d})"
    return (
        f"(CASE WHEN {a_s} > {b_s} THEN {a_s} ELSE {b_s} END)",
        f"(CASE WHEN {a_d} > {b_d} THEN {a_d} ELSE {b_d} END)",
    )


@st.composite
def str_expr(draw, depth=0):
    """Returns (spark_sql, duck_sql) for a string-valued expression."""
    if depth >= 2 or draw(st.booleans()):
        s = draw(st.text(st.sampled_from(list("abcXYZ 09_")), min_size=0, max_size=6))
        lit = "'" + s.replace("'", "''") + "'"
        return lit, lit
    kind = draw(st.sampled_from(["concat", "upper", "lower", "substr", "trim"]))
    a_s, a_d = draw(str_expr(depth=depth + 1))
    if kind == "concat":
        b_s, b_d = draw(str_expr(depth=depth + 1))
        return f"({a_s} || {b_s})", f"({a_d} || {b_d})"
    if kind == "upper":
        return f"UPPER({a_s})", f"UPPER({a_d})"
    if kind == "lower":
        return f"LOWER({a_s})", f"LOWER({a_d})"
    if kind == "substr":
        start = draw(st.integers(min_value=1, max_value=4))
        ln = draw(st.integers(min_value=0, max_value=4))
        return (
            f"SUBSTR({a_s}, {start}, {ln})",
            f"SUBSTR({a_d}, {start}, {ln})",
        )
    return f"TRIM({a_s})", f"TRIM({a_d})"


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(expr=int_expr())
@example(
    # Hypothesis-found INT32 overflow: 2,147,785,500 > INT32_MAX. Both
    # Spark (ANSI) and DuckDB raise on it — the assertion is error
    # PARITY, not value equality. Note the reference (DataFusion) plans
    # integer literals as Int64 and would return the value; this engine
    # keeps Spark's INT32 literal typing, and the DuckDB oracle agrees
    # (documented in dask_sql_spark/dialect.py module docstring).
    expr=(
        "(((0 + 67) * 70) * (71 * (75 * 86)))",
        "(((0 + 67) * 70) * (71 * (75 * 86)))",
    )
)
def test_int_expr_matches_duckdb(context, duck, expr):
    spark_sql, duck_sql = expr
    _assert_parity(context, duck, spark_sql, duck_sql)


@settings(max_examples=60, deadline=None)
@given(expr=str_expr())
def test_str_expr_matches_duckdb(context, duck, expr):
    spark_sql, duck_sql = expr
    _assert_parity(context, duck, spark_sql, duck_sql)


@settings(max_examples=80, deadline=None)
@given(
    cents=st.integers(min_value=-(10**13), max_value=10**13),
    scale=st.sampled_from([100.0, 10000.0, 1000000.0]),
)
def test_round_integer_scaling_matches_duckdb(context, duck, cents, scale):
    """The rounding-neutral gate primitive: CAST(ROUND(x * s) AS BIGINT)
    must be bit-identical across engines for every money-like double —
    including values that sit EXACTLY on .5 ties after scaling (both
    engines round ties away from zero) and values a few ULPs off a
    boundary. x is constructed as cents/100.0 so the scaled product
    sweeps near-integer, exact-tie, and far-from-tie regimes."""
    x = cents / 100.0
    spark_sql = f"SELECT CAST(ROUND(CAST({x!r} AS DOUBLE) * {scale}) AS BIGINT) AS v"
    duck_sql = spark_sql
    got = context.sql(spark_sql).collect()[0].v
    want = duck.execute(duck_sql).fetchone()[0]
    assert got == want, f"x={x!r} scale={scale}: spark {got} vs duck {want}"


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=8,
    )
)
def test_round_scaling_arbitrary_doubles_match(context, duck, vals):
    """Same primitive over ARBITRARY doubles (not cent-aligned): both
    engines must agree on ROUND(x * 1e6) for any representable double,
    because the scaled product is the identical IEEE result and ROUND
    ties go away from zero in both."""
    exprs = ", ".join(
        f"CAST(ROUND(CAST({v!r} AS DOUBLE) * 1000000) AS BIGINT) AS v{i}"
        for i, v in enumerate(vals)
    )
    got = list(context.sql(f"SELECT {exprs}").collect()[0])
    want = list(duck.execute(f"SELECT {exprs}").fetchone())
    assert got == want
