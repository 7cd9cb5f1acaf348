"""Data-quality validation checks: the audit layer run after every
large-scale ingest and before every training run.

Each check is a lazy one-row DataFrame ``(check, n_bad)``;
:func:`dq_report` unions them into a single report that executes as one
Spark job. Design for 100 TB:

- every check is a single aggregate over one scan (count-based, no
  collect); Catalyst fuses the predicate into the scan projection
- uniqueness is ``count - count(distinct …)`` — one hash aggregate,
  no self-join
- referential integrity is a LEFT ANTI join counted — broadcastable
  when the parent is a dimension, the usual case

Additive capability (the reference has no validation layer); the
DuckDB oracle replays each check as a scalar subquery.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(name: str, value: Column, df: DataFrame) -> DataFrame:
    return df.agg(value.cast("long").alias("n_bad")).select(
        F.lit(name).alias("check"), "n_bad"
    )


def null_count(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Rows where ``col`` IS NULL."""
    return _one(
        name or f"null:{col}",
        F.count(F.lit(1)) - F.count(F.col(col)),
        df,
    )


def duplicate_keys(
    df: DataFrame, cols: list[str], name: str | None = None
) -> DataFrame:
    """Rows beyond the first per key tuple (0 = the key is unique).
    NULL-keyed rows are not counted as duplicates of each other."""
    tup = F.struct(*[F.col(c) for c in cols])
    non_null = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in cols]
    )
    return _one(
        name or f"dup_key:{','.join(cols)}",
        F.count(F.when(non_null, tup)) - F.count_distinct(
            F.when(non_null, tup)
        ),
        df,
    )


def orphan_keys(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose non-null foreign key has no parent row."""
    orphans = child.where(F.col(fk).isNotNull()).join(
        F.broadcast(parent.select(F.col(pk).alias(fk)).distinct()),
        on=fk,
        how="left_anti",
    )
    return _one(name or f"orphan:{fk}", F.count(F.lit(1)), orphans)


def range_violations(
    df: DataFrame,
    col: str,
    lo,
    hi,
    name: str | None = None,
) -> DataFrame:
    """Non-null values outside [lo, hi]."""
    c = F.col(col)
    return _one(
        name or f"range:{col}",
        F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1)),
        df,
    )


def accepted_values(
    df: DataFrame, col: str, allowed: list, name: str | None = None
) -> DataFrame:
    """Non-null values outside the allowed set.

    A ``None`` in ``allowed`` is dropped before the comparison: NULLs
    are never counted as violations anyway, and a literal NULL inside
    ``IN`` turns every negative answer into SQL NULL — silently
    counting zero violations (round-9 audit finding)."""
    c = F.col(col)
    allowed = [a for a in allowed if a is not None]
    return _one(
        name or f"accepted:{col}",
        F.count(F.when(c.isNotNull() & ~c.isin(allowed), 1)),
        df,
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the checks into one (check, n_bad) report — a single job;
    Spark runs the independent aggregates as parallel stages."""
    if not checks:
        raise ValueError("checks must be non-empty")
    return reduce(lambda a, b: a.unionByName(b), checks)


def fused_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """All of one table's row-level checks in ONE aggregate — ONE scan.
    ``checks`` maps check name → long-valued aggregate expression (the
    same expressions the standalone helpers use); the single result row
    unpivots to (check, n_bad) via stack, a projection. Unioning
    standalone one-check frames instead costs one full scan per check —
    at 100 TB a 5-rule suite reads the table five times for five
    numbers one reducer row can carry."""
    if not checks:
        raise ValueError("checks must be non-empty")
    names = list(checks)
    row = df.agg(
        *[
            checks[k].cast("long").alias(f"_c{i}")
            for i, k in enumerate(names)
        ]
    )
    # names travel as Column literals (F.lit), never as spliced SQL
    # string literals — quote-doubling alone left backslashes live under
    # Spark's default escapedStringLiterals=false, so a name ending in
    # '\' broke (or injected into) the stack() parse
    args: list[Column] = [F.lit(len(names))]
    for i, k in enumerate(names):
        args.append(F.lit(k))
        args.append(F.col(f"_c{i}"))
    return row.select(F.stack(*args)).toDF("check", "n_bad")


def key_skew_report(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Heavy-hitter profile of a join/partition key: the top-``k`` keys by
    row count with their share of the table — the report you run BEFORE a
    100 TB join to decide whether a key needs salting or an AQE skew
    split (operators/skew.py is the remediation; this is the diagnosis).

    Shape: one groupBy(key) count (map-side partials), the grand total as
    a 1-row broadcast cross join (never a single-partition window), and
    the top-k via orderBy+limit — Catalyst plans TakeOrderedAndProject,
    so only k rows ever leave the executors.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(k)
    )


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` and return observed data-quality metrics from the
    SAME pass — Spark's ``Observation`` API attaches aggregates to the
    write job, so a 100 TB sink gets row counts / null counts / sums
    with ZERO extra scans (the post-hoc dq_report pattern costs one).

    Default metrics: n_rows. Metric expressions must be aggregates over
    the written rows.
    """
    from pyspark.sql import Observation

    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    named = [expr.alias(name) for name, expr in metrics.items()]
    observed = df.observe(obs, *named)
    observed.write.format(format).mode(mode).save(path)
    return dict(obs.get)
