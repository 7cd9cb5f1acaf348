"""CREATE EXPERIMENT execution: hyperparameter search over any
sklearn-style estimator (reference create_experiment.py:17-232, which
wires GridSearchCV / RandomizedSearchCV / tune classes).

Two paths:
- ``experiment_class`` given (e.g. sklearn's GridSearchCV) and importable →
  instantiate it with the estimator + param grid and delegate (identical to
  the reference).
- otherwise → built-in grid search: every parameter combination is fit and
  scored with k-fold splits. Candidate fits are *distributed over the
  cluster* via a Spark RDD (one task per combination) when there are
  enough combinations — the equivalent of dask-ml's joblib parallelism,
  expressed Spark-natively. Scoring uses ``estimator.score`` when present,
  else negative MSE.
"""

from __future__ import annotations

import itertools
import pickle
from typing import TYPE_CHECKING, Any

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    from dask_sql_spark.context import Context

from dask_sql_spark.ml.model import _import_class


def _param_grid(tune_params: dict[str, list]) -> list[dict[str, Any]]:
    if not tune_params:
        return [{}]
    keys = sorted(tune_params)
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(tune_params[k] for k in keys))
    ]


def _score(model: Any, X: pd.DataFrame, y: pd.Series | None) -> float:
    if hasattr(model, "score") and y is not None:
        try:
            return float(model.score(X, y))
        except Exception:
            pass
    if y is None:
        return 0.0
    pred = np.asarray(model.predict(X), dtype="float64")
    return -float(np.mean((pred - np.asarray(y, dtype="float64")) ** 2))


def _fit_and_score(
    model_bytes: bytes, params: dict, X: pd.DataFrame, y: pd.Series | None, folds: int
) -> float:
    ModelClass, base_kwargs = pickle.loads(model_bytes)
    scores = []
    n = len(X)
    idx = np.arange(n)
    for k in range(folds):
        test_mask = idx % folds == k
        model = ModelClass(**{**base_kwargs, **params})
        ytr = y[~test_mask] if y is not None else None
        yte = y[test_mask] if y is not None else None
        model.fit(X[~test_mask], ytr)
        scores.append(_score(model, X[test_mask], yte))
    return float(np.mean(scores))


def create_experiment(
    context: "Context", name: str, kwargs: dict, select: str
) -> pd.DataFrame:
    model_class = kwargs.pop("model_class", None)
    if model_class is None:
        raise ValueError("CREATE EXPERIMENT requires model_class=...")
    experiment_class = kwargs.pop("experiment_class", None)
    target_column = kwargs.pop("target_column", "")
    folds = int(kwargs.pop("folds", 3))
    tune_params = {
        k[len("tune_parameters.") :]: v
        for k, v in list(kwargs.items())
        if k.startswith("tune_parameters.")
    }
    for k in list(kwargs):
        if k.startswith("tune_parameters."):
            del kwargs[k]
    # values may arrive as '(1, 2, 3)' strings from the WITH() parser
    for k, v in tune_params.items():
        if isinstance(v, str):
            tune_params[k] = [
                _coerce(x) for x in v.strip("()[]").split(",") if x.strip()
            ]

    from dask_sql_spark.ml.model import (
        DEFAULT_MAX_FIT_ROWS,
        collect_training_frame,
    )

    max_fit_rows = int(kwargs.pop("max_fit_rows", DEFAULT_MAX_FIT_ROWS))
    sample = kwargs.pop("sample", None)
    training_df = collect_training_frame(
        context.sql(select),
        max_fit_rows,
        float(sample) if sample is not None else None,
    )
    if target_column:
        X = training_df.drop(columns=[target_column])
        y = training_df[target_column]
    else:
        X, y = training_df, None

    ModelClass = _import_class(str(model_class))

    if experiment_class:
        # delegate to a sklearn-style search class (reference path)
        SearchClass = _import_class(str(experiment_class))
        search = SearchClass(ModelClass(**kwargs), tune_params)
        search.fit(X, y)
        best_model = search.best_estimator_
        results = pd.DataFrame(search.cv_results_)
        best_params = search.best_params_
    else:
        combos = _param_grid(tune_params)
        model_bytes = pickle.dumps((ModelClass, kwargs))
        if len(combos) >= 4:
            # distribute candidate fits across the cluster: one task per
            # parameter combination, data broadcast once
            sc = context.spark.sparkContext
            X_bc = sc.broadcast(pickle.dumps((X, y)))
            def eval_combo(params):
                Xl, yl = pickle.loads(X_bc.value)
                return params, _fit_and_score(model_bytes, params, Xl, yl, folds)
            scored = sc.parallelize(combos, len(combos)).map(eval_combo).collect()
        else:
            scored = [
                (params, _fit_and_score(model_bytes, params, X, y, folds))
                for params in combos
            ]
        results = pd.DataFrame(
            [{**params, "mean_test_score": s} for params, s in scored]
        )
        best_params = max(scored, key=lambda ps: ps[1])[0]
        best_model = ModelClass(**{**kwargs, **best_params})
        if y is not None:
            best_model.fit(X, y)
        else:
            best_model.fit(X)

    context.register_model(name, best_model, training_columns=list(X.columns))
    context.schemas[context.schema_name].experiments[name] = {
        "results": results,
        "best_params": best_params,
    }
    return results


def _coerce(x: str) -> Any:
    x = x.strip().strip("'\"")
    try:
        return int(x)
    except ValueError:
        try:
            return float(x)
        except ValueError:
            return x
