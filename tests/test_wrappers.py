"""ML wrapper tests (reference wrappers.py: ParallelPostFit, Incremental)."""

import pandas as pd

from tests.dummy_estimator import MeanRegressor


def test_parallel_post_fit(context):
    from dask_sql_spark.ml.wrappers import ParallelPostFit

    est = ParallelPostFit(MeanRegressor())
    est.fit(pd.DataFrame({"a": [1.0, 2.0]}), pd.Series([10.0, 20.0]))
    df = context.sql("SELECT CAST(a AS DOUBLE) AS a FROM df_simple")
    out = est.predict(df, feature_columns=["a"]).collect()
    assert len(out) == 3
    assert all(r.target == 15.0 for r in out)


def test_incremental(context):
    from dask_sql_spark.ml.wrappers import Incremental

    inc = Incremental(MeanRegressor(), epochs=2)
    df = context.sql("SELECT CAST(a AS DOUBLE) AS a, b FROM df_simple")
    inc.fit(df, feature_columns=["a"], target_column="b")
    assert inc.estimator.mean_ is not None
    preds = inc.predict(df, ["a"]).collect()
    assert len(preds) == 3


def test_incremental_requires_partial_fit():
    import pytest

    from dask_sql_spark.ml.wrappers import Incremental

    class NoPartial:
        def fit(self, X, y=None):
            return self

    with pytest.raises(TypeError):
        Incremental(NoPartial())
