"""Deterministic rule-based estimators.

Small sklearn-protocol models whose predictions are closed-form SQL
expressions. Besides being useful baselines, they make the ML statement
path (CREATE MODEL → PREDICT) *oracle-checkable*: the DuckDB twin of a
``ThresholdClassifier`` prediction is a CASE expression, so the entire
fit → broadcast → mapInPandas-predict machinery gets a value-hash
correctness gate — which a real learned model (floating-point,
library-versioned) can never have.
"""

from __future__ import annotations


class MeanRegressor:
    """predict(X) = the training mean of the target — the zero-feature
    baseline regressor. With a ``target_column`` in CREATE MODEL the
    trainer passes y; the DuckDB oracle twin of PREDICT is a scalar
    ``AVG(target)`` subquery, so the statement path stays value-checkable.
    """

    def __init__(self, mean: float | str | None = None):
        # SQL WITH(...) kwargs arrive as strings
        self.mean_ = None if mean is None else float(mean)

    def fit(self, X, y=None):
        if y is None:
            raise ValueError("MeanRegressor requires target_column")
        if self.mean_ is None:
            self.mean_ = float(y.mean())
        return self

    def predict(self, X):
        import pandas as pd

        return pd.Series(
            [self.mean_] * len(X), index=X.index, dtype="float64"
        )

    def get_params(self, deep: bool = True) -> dict:
        return {"mean": self.mean_}


class ThresholdClassifier:
    """predict(X) = 1.0 where ``X[column] > threshold`` else 0.0.

    With ``threshold=None``, ``fit`` learns the training mean of
    ``column`` — deterministic given the data (computed through exact
    pandas sum over the collected training frame).
    """

    def __init__(self, column: str, threshold: float | str | None = None):
        self.column = column
        # SQL WITH(...) kwargs arrive as strings
        self.threshold = None if threshold is None else float(threshold)

    def fit(self, X, y=None):
        if self.threshold is None:
            self.threshold = float(X[self.column].mean())
        return self

    def predict(self, X):
        return (X[self.column] > self.threshold).astype("float64")

    def get_params(self, deep: bool = True) -> dict:
        return {"column": self.column, "threshold": self.threshold}
