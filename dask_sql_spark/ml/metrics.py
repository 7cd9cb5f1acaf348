"""Distributed model-evaluation metrics over Spark DataFrames.

Parity target: the reference's ``physical/rel/custom/metrics.py``
(dask-ml-derived ``accuracy_score`` / ``log_loss`` over dask arrays,
used by CREATE EXPERIMENT scoring). Here each metric is ONE Spark
aggregate over (label, prediction) columns — a single scan, map-side
partial aggregation, no data ever collected; only the scalar metric
reaches the driver.

Prefer :func:`evaluate`: it fuses accuracy/mse/rmse/r2 (+log_loss) into
a single aggregate pass. The scalar helpers remain only as the
reference-parity API and are now thin wrappers over :func:`evaluate`
(one fused aggregate job each; calling several back-to-back still
re-scans once per call — batch reads through :func:`evaluate` directly).
The sole exception is the weighted/raw-count ``accuracy_score``
variants, whose extra parameters the fused pass doesn't carry.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-15


def accuracy_score(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    normalize: bool = True,
    sample_weight_col: str | None = None,
) -> float:
    """Fraction (or weighted fraction / raw count) of exact matches.

    The default (unweighted, normalized) read routes through the fused
    :func:`evaluate` aggregate; the weighted / raw-count variants keep a
    dedicated single aggregate (still one scan, one job)."""
    if sample_weight_col is None and normalize:
        return evaluate(df, label_col, pred_col)["accuracy"]
    hit = F.when(F.col(label_col) == F.col(pred_col), 1.0).otherwise(0.0)
    if sample_weight_col is not None:
        w = F.col(sample_weight_col)
        num = F.sum(hit * w)
        den = F.sum(w)
    else:
        num = F.sum(hit)
        den = F.count(F.lit(1))
    agg = num if not normalize else num / den
    return float(df.agg(agg.alias("m")).collect()[0]["m"])


def log_loss(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    eps: float = _EPS,
) -> float:
    """Binary cross-entropy: labels in {0,1}, ``prob_col`` = P(y=1);
    probabilities clipped to [eps, 1-eps] like sklearn. A wrapper over
    the fused :func:`evaluate` pass (prob_col stands in for the unused
    pred_col — same single aggregate job)."""
    return evaluate(df, label_col, prob_col, prob_col=prob_col, eps=eps)[
        "log_loss"
    ]


def mean_squared_error(
    df: DataFrame, label_col: str, pred_col: str, squared: bool = True
) -> float:
    """MSE (or RMSE with ``squared=False``) via the fused
    :func:`evaluate` aggregate."""
    m = evaluate(df, label_col, pred_col)
    return m["mse"] if squared else m["rmse"]


def evaluate(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    prob_col: str | None = None,
    eps: float = _EPS,
) -> dict[str, float]:
    """All metrics in ONE aggregate pass / ONE job: accuracy, mse, rmse,
    r2, and (when ``prob_col`` is given) log_loss. Use this instead of
    calling the scalar helpers back-to-back — each of those is its own
    scan+collect, which at corpus scale means re-reading the predictions
    four times for numbers one reducer row can carry.

    Edge behavior matches the scalar helpers: an empty frame raises
    ``ValueError`` (no metric is defined over zero rows), zero label
    variance yields ``r2 = 0.0`` like :func:`r2_score`, and both columns
    are cast to double so integer predictions type identically to
    :func:`mean_squared_error`.

    Non-numeric (e.g. string classification) labels/predictions are
    first-class for ``accuracy`` — the equality compare never casts —
    while the regression metrics (mse/rmse/r2, log_loss) come back as
    ``nan``: the casts are ``try_cast`` so they yield NULL rather than
    raising under ANSI mode, and all-NULL aggregate terms are mapped to
    ``nan`` instead of blowing up in ``float(None)``. This keeps the
    reference dask-ml ``accuracy_score`` parity (plain equality over any
    comparable dtype). On PARTIALLY numeric inputs, the regression
    metrics are computed over the valid pairs only (rows where both
    casts land), with one consistent population for SS_res and SS_tot."""
    y = F.col(label_col).try_cast("double")
    d = y - F.col(pred_col).try_cast("double")
    # regression stats all condition on the SAME row set — pairs where
    # both casts landed (d non-null). Mixing populations skewed r2 on
    # partial-NULL inputs: ss_res summed valid pairs while ss_tot used
    # the full row count (round-10 audit).
    yv = F.when(d.isNotNull(), y)
    aggs = [
        F.avg(
            F.when(F.col(label_col) == F.col(pred_col), 1.0).otherwise(0.0)
        ).alias("accuracy"),
        F.avg(d * d).alias("mse"),
        F.sum(d * d).alias("ss_res"),
        F.sum(yv * yv).alias("yy"),
        F.sum(yv).alias("ys"),
        F.count(d).alias("nv"),
        F.count(F.lit(1)).alias("n"),
    ]
    if prob_col is not None:
        p = F.least(
            F.greatest(F.col(prob_col).try_cast("double"), F.lit(eps)),
            F.lit(1.0 - eps),
        )
        aggs.append(
            F.avg(-(y * F.log(p) + (1.0 - y) * F.log(1.0 - p))).alias(
                "log_loss"
            )
        )
    row = df.agg(*aggs).collect()[0]
    if not row["n"]:
        raise ValueError("evaluate() requires at least one row")
    def _f(v):  # all-NULL aggregate (non-numeric labels) → nan, not crash
        return float(v) if v is not None else math.nan
    mse = _f(row["mse"])
    if row["yy"] is None or row["ys"] is None:
        r2 = math.nan
    else:
        ss_tot = row["yy"] - row["ys"] * row["ys"] / row["nv"]
        r2 = (
            0.0 if ss_tot == 0
            else 1.0 - (row["ss_res"] if row["ss_res"] is not None else math.nan) / ss_tot
        )
    out = {
        "accuracy": _f(row["accuracy"]),
        "mse": mse,
        "rmse": math.sqrt(mse),  # sqrt(nan) == nan
        "r2": r2,
    }
    if prob_col is not None:
        out["log_loss"] = _f(row["log_loss"])
    return out


def r2_score(df: DataFrame, label_col: str, pred_col: str) -> float:
    """1 - SS_res/SS_tot via the fused :func:`evaluate` aggregate
    (SS_tot from E[y²] - E[y]², so one pass; zero variance → 0.0)."""
    return evaluate(df, label_col, pred_col)["r2"]
