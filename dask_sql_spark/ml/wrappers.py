"""ML wrapper equivalents of the reference's wrappers.py:1-821:

- :class:`ParallelPostFit` — fit once (driver), predict distributed: the
  fitted estimator is broadcast and applied per Arrow batch with
  mapInPandas. The 100 TB path: inference streams through executors, no
  collect.
- :class:`Incremental` — out-of-core training via ``partial_fit`` over
  ``toLocalIterator`` partition batches (the reference's Incremental does
  the same over dask partitions). Training is sequential by nature of
  partial_fit; data never fully materializes on the driver.
"""

from __future__ import annotations

import pickle
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class ParallelPostFit:
    """Wrap a fitted sklearn-style estimator for distributed inference."""

    def __init__(self, estimator: Any):
        self.estimator = estimator

    def fit(self, X: pd.DataFrame, y=None, **kwargs) -> "ParallelPostFit":
        self.estimator.fit(X, y, **kwargs)
        return self

    def predict(
        self,
        df: DataFrame,
        feature_columns: list[str] | None = None,
        target_column: str = "target",
    ) -> DataFrame:
        """Append ``target_column`` = estimator.predict per Arrow batch."""
        cols = feature_columns or df.columns
        model_bc = df.sparkSession.sparkContext.broadcast(
            pickle.dumps(self.estimator)
        )
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(target_column, T.DoubleType())]
        )

        def _predict(batches):
            est = pickle.loads(model_bc.value)
            for pdf in batches:
                out = pdf.copy()
                out[target_column] = pd.Series(
                    est.predict(pdf[cols]), index=pdf.index
                ).astype("float64")
                yield out

        return df.mapInPandas(_predict, out_schema)


class Incremental:
    """Out-of-core training loop over partition batches.

    ``fit`` pulls one partition at a time to the driver via
    ``toLocalIterator`` and calls ``partial_fit`` — bounded driver memory
    regardless of table size (the reference's Incremental wrapper
    semantics, wrappers.py)."""

    def __init__(self, estimator: Any, epochs: int = 1):
        if not hasattr(estimator, "partial_fit"):
            raise TypeError("Incremental requires an estimator with partial_fit")
        self.estimator = estimator
        self.epochs = epochs

    BATCH_ROWS = 10_000

    def fit(
        self,
        df: DataFrame,
        feature_columns: list[str],
        target_column: str | None = None,
        **kwargs: Any,
    ) -> "Incremental":
        select_cols = list(feature_columns) + (
            [target_column] if target_column else []
        )
        projected = df.select(*select_cols)
        for _ in range(self.epochs):
            buffer: list = []
            for row in projected.toLocalIterator(prefetchPartitions=True):
                buffer.append(row)
                if len(buffer) >= self.BATCH_ROWS:
                    self._partial_fit_batch(buffer, feature_columns, target_column, kwargs)
                    buffer = []
            if buffer:
                self._partial_fit_batch(buffer, feature_columns, target_column, kwargs)
        return self

    def _partial_fit_batch(self, rows, feature_columns, target_column, kwargs):
        pdf = pd.DataFrame([r.asDict() for r in rows])
        X = pdf[feature_columns]
        y = pdf[target_column] if target_column else None
        self.estimator.partial_fit(X, y, **kwargs)

    def predict(self, df: DataFrame, feature_columns: list[str]) -> DataFrame:
        return ParallelPostFit(self.estimator).predict(df, feature_columns)
