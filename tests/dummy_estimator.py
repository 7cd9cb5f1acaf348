"""A minimal sklearn-style estimator for ML-statement tests (sklearn is not
installed in this environment; the ML layer only requires fit/predict)."""

from __future__ import annotations

import numpy as np


class MeanRegressor:
    """Predicts the training-target mean; supports get_params for
    DESCRIBE MODEL."""

    def __init__(self, shift: float = 0.0):
        self.shift = shift
        self.mean_: float | None = None

    def get_params(self, deep: bool = True):
        return {"shift": self.shift}

    def fit(self, X, y=None):
        self.mean_ = float(np.mean(y)) if y is not None else 0.0
        return self

    def partial_fit(self, X, y=None):
        return self.fit(X, y)

    def predict(self, X):
        return np.full(len(X), self.mean_ + self.shift)
