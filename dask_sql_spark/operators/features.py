"""Numeric feature preparation: winsorization and robust scaling.

The two standard outlier-taming transforms run before training on
tabular features. Both compute EXACT per-group percentiles (Spark's
``percentile``, linear interpolation — identical formula to DuckDB's
``quantile_cont``) with the small per-group bound table broadcast back
onto the fact rows.

100 TB shape: one aggregate shuffle keyed by the group column to build
the bounds (map-side partial percentile buffers), one broadcast join,
then pure codegen arithmetic. For extreme-cardinality groups swap the
exact percentile for ``approx_percentile`` — same plan, sketch
buffers; the operators take the percentile builder as a knob.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
    names: list[str],
    round_digits: int,
) -> DataFrame:
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), round_digits).alias(n)
        for p, n in zip(probs, names)
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    round_digits: int = 6,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [p_lo, p_hi] exact
    percentiles; adds ``{value_col}_w`` (NULL input stays NULL). Bounds
    are rounded before clipping so the engine-portable oracle sees
    identical cutoffs."""
    group_cols = group_cols or []
    b = _bounds(
        df, value_col, group_cols, [p_lo, p_hi], ["__lo", "__hi"], round_digits
    )
    joined = (
        df.join(F.broadcast(b), on=group_cols) if group_cols
        else df.crossJoin(F.broadcast(b))
    )
    # greatest/least SKIP NULLs (Postgres semantics), so without the
    # explicit passthrough a NULL feature silently became the LOWER
    # bound — a winsorized NULL must stay NULL (round-10 audit)
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col("__lo")),
            F.col("__hi"),
        ),
    )
    return joined.withColumn(f"{value_col}_w", clipped).drop("__lo", "__hi")


def robust_zscore(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Median/IQR standardization: ``(v - median) / (q3 - q1)`` per
    group; adds ``{value_col}_rz`` (NULL when the IQR is zero).
    Insensitive to the outliers that wreck mean/stddev scaling."""
    group_cols = group_cols or []
    b = _bounds(
        df,
        value_col,
        group_cols,
        [0.25, 0.5, 0.75],
        ["__q1", "__med", "__q3"],
        round_digits,
    )
    joined = (
        df.join(F.broadcast(b), on=group_cols) if group_cols
        else df.crossJoin(F.broadcast(b))
    )
    iqr = F.col("__q3") - F.col("__q1")
    z = F.when(
        iqr > 0,
        F.round(
            (F.col(value_col).cast("double") - F.col("__med")) / iqr,
            round_digits,
        ),
    )
    return joined.withColumn(f"{value_col}_rz", z).drop(
        "__q1", "__med", "__q3"
    )
