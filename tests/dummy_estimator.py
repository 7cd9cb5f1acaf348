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


class SGDLinearRegressor:
    """Plain-numpy linear model trained by gradient steps in partial_fit —
    a REAL sequential learner (sklearn SGDRegressor shape) so Incremental
    is exercised against genuine out-of-core convergence, not a stateless
    dummy. Each partial_fit call runs a few full-batch gradient-descent
    steps on that mini-batch."""

    def __init__(self, lr: float = 0.1, steps_per_batch: int = 25):
        self.lr = lr
        self.steps_per_batch = steps_per_batch
        self.coef_: np.ndarray | None = None
        self.intercept_ = 0.0

    def get_params(self, deep: bool = True):
        return {"lr": self.lr, "steps_per_batch": self.steps_per_batch}

    def partial_fit(self, X, y=None):
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        if self.coef_ is None:
            self.coef_ = np.zeros(X.shape[1])
        for _ in range(self.steps_per_batch):
            err = X @ self.coef_ + self.intercept_ - y
            self.coef_ -= self.lr * (X.T @ err) / len(y)
            self.intercept_ -= self.lr * float(err.mean())
        return self

    def predict(self, X):
        return np.asarray(X, dtype=float) @ self.coef_ + self.intercept_
