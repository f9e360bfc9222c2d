"""Optional xgboost backend seam (T7 warm-start continuation).

In environments without xgboost the seam must fail loudly (never
silently retrain from scratch when continuation was requested); with
xgboost installed, continuation trains true residual-fitting rounds.
"""

from __future__ import annotations

import pandas as pd
import pytest

from daxos_spark.ml.crossvalidate import incremental_fit
from daxos_spark.ml.train import HAS_XGBOOST, GBTParams, fit_gbt


@pytest.fixture()
def tiny(spark):
    pdf = pd.DataFrame(
        {
            "row_idx": range(40),
            "features": [[float(i % 3), float(i % 5)] for i in range(40)],
            "label": [float(i % 2) for i in range(40)],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.skipif(HAS_XGBOOST, reason="exercises the no-xgboost error path")
def test_init_model_without_xgboost_raises(tiny):
    params = GBTParams(n_boost_round=2, max_depth=2)
    with pytest.raises(NotImplementedError, match="warm-start"):
        fit_gbt(tiny, params, init_model=object())


@pytest.mark.skipif(HAS_XGBOOST, reason="exercises the no-xgboost error path")
def test_warm_start_without_xgboost_raises(tiny):
    params = GBTParams(n_boost_round=2, max_depth=2)
    with pytest.raises(ImportError, match="xgboost"):
        incremental_fit(tiny, params, n_rounds=2, sample_fraction=1.0, warm_start=True)


@pytest.mark.skipif(HAS_XGBOOST, reason="exercises the no-xgboost error path")
def test_explicit_xgboost_backend_without_dep_raises(tiny):
    with pytest.raises(ImportError, match="xgboost"):
        fit_gbt(tiny, GBTParams(n_boost_round=2), backend="xgboost")


@pytest.mark.skipif(not HAS_XGBOOST, reason="xgboost not installed")
def test_warm_start_continuation(tiny):
    params = GBTParams(n_boost_round=2, max_depth=2)
    models = incremental_fit(
        tiny, params, n_rounds=2, sample_fraction=1.0, warm_start=True
    )
    # each round's booster must extend the previous one's tree count
    n0 = len(models[0].get_booster().get_dump())
    n1 = len(models[1].get_booster().get_dump())
    assert n1 > n0


def test_mllib_path_unchanged(tiny):
    params = GBTParams(n_boost_round=2, max_depth=2)
    models = incremental_fit(tiny, params, n_rounds=2, sample_fraction=1.0)
    assert len(models) == 2
