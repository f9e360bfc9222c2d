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


# ---------------------------------------------------------------------------
# T7 continuation, executed: the sealed environment has no xgboost, so
# the tests below drive the REAL continuation code path
# (ml/train.py::_xgb_continue and the warm-start branch of
# incremental_fit) against tests/fake_pkgs/xgboost.py — a pure-numpy
# mini-GBT whose ``xgb_model`` continuation has xgboost's true
# semantics (new rounds boost on the prior ensemble's residuals), so
# continuation-vs-retrain genuinely changes the answer and the seam is
# verified end-to-end, not just its error paths. Reference semantics:
# daxos/crossvalidate.py:203-240.

import importlib.util
import os
import sys

import numpy as np


def _load_fake_xgb():
    path = os.path.join(os.path.dirname(__file__), "fake_pkgs", "xgboost.py")
    spec = importlib.util.spec_from_file_location("xgboost", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, path


@pytest.fixture()
def fake_xgb(monkeypatch):
    """Install the mini-xgboost at every seam ml/train.py touches."""
    # With a REAL xgboost installed the driver uses the monkeypatched
    # module but executors (addPyFile in the distributed tests) would
    # import the genuine package and fail to unpickle the fake Booster
    # (module-name collision). The real-xgboost variant covers the seam
    # in that environment; the mini-backend run is for the sealed one.
    # (addPyFile in the distributed test copies the fake into Spark's
    # userFiles dir and puts it on the driver's sys.path for the rest of
    # the session — don't let our own single-file fake masquerade as a
    # real installation. Real xgboost is a PACKAGE, so discriminate on
    # submodule_search_locations, not on the path.)
    spec = importlib.util.find_spec("xgboost")
    if spec is not None and spec.submodule_search_locations is not None:
        pytest.skip("real xgboost installed — mini-backend seam run not needed")
    import daxos_spark.ml.train as train_mod

    mod, path = _load_fake_xgb()
    monkeypatch.setitem(sys.modules, "xgboost", mod)
    monkeypatch.setattr(train_mod, "HAS_XGBOOST", True)
    monkeypatch.setattr(
        train_mod, "SparkXGBRegressor", mod.SparkXGBRegressor, raising=False
    )
    monkeypatch.setattr(
        train_mod, "SparkXGBClassifier", mod.SparkXGBClassifier, raising=False
    )
    mod.LAST_TRAIN_CALLS.clear()
    mod._path = path
    return mod


def test_mini_xgb_continuation_identity():
    """The backbone property: train(k+m) == train(k) then continue(m).
    Proves the fake's ``xgb_model`` continuation is true boosting
    continuation, so the seam tests below rest on real semantics."""
    xgb, _ = _load_fake_xgb()
    rng = np.random.default_rng(5)
    X = rng.normal(size=(60, 3))
    y = X[:, 0] * 1.5 - (X[:, 1] > 0) + rng.normal(scale=0.1, size=60)
    params = {"objective": "reg:squarederror", "eta": 0.4}
    full = xgb.train(params, xgb.DMatrix(X, label=y), num_boost_round=5)
    half = xgb.train(params, xgb.DMatrix(X, label=y), num_boost_round=2)
    cont = xgb.train(
        params, xgb.DMatrix(X, label=y), num_boost_round=3, xgb_model=half
    )
    assert cont.trees == full.trees
    # and continuation actually differs from retraining 3 rounds fresh
    fresh = xgb.train(params, xgb.DMatrix(X, label=y), num_boost_round=3)
    assert fresh.trees != cont.trees


def test_xgb_continue_params_and_equivalence(tiny, fake_xgb):
    """_xgb_continue line-for-line: booster unwrap, Arrow collect,
    float32 cast, exact native-param construction, xgb_model wiring."""
    from daxos_spark.ml.train import MAX_CONTINUE_ROWS, XGBBoosterModel, fit_gbt

    params = GBTParams(
        eta=0.5,
        max_depth=2,
        n_boost_round=3,
        objective="reg:squarederror",
        seed=9,
        extra={"tree_method": "hist"},
    )
    native = {
        "eta": 0.5,
        "max_depth": 2,
        "subsample": 1.0,
        "colsample_bytree": 1.0,
        "objective": "reg:squarederror",
        "seed": 9,
        "device": "cpu",
        "tree_method": "hist",
    }
    # replicate _xgb_continue's exact data path to build the expectation
    pdf = tiny.select("features", "label").limit(MAX_CONTINUE_ROWS + 1).toPandas()
    X = np.asarray(pdf["features"].tolist(), dtype=np.float32)
    y = pdf["label"].to_numpy(dtype="float64")
    prior = fake_xgb.train(native, fake_xgb.DMatrix(X, label=y), num_boost_round=2)
    expected = fake_xgb.train(native, fake_xgb.DMatrix(X, label=y), num_boost_round=5)

    model = fit_gbt(tiny, params, init_model=prior, backend="xgboost")
    assert isinstance(model, XGBBoosterModel)
    call = fake_xgb.LAST_TRAIN_CALLS[-1]
    assert call == {"params": native, "num_boost_round": 3, "continued": True}
    # 2 prior + 3 continued trees, and the ensemble equals one-shot 5
    assert len(model.get_booster().get_dump()) == 5
    assert model.get_booster().trees == expected.trees
    # the get_booster() unwrap branch: passing the wrapped model works too
    model2 = fit_gbt(tiny, params, init_model=model, backend="xgboost")
    assert len(model2.get_booster().get_dump()) == 8


def test_warm_start_continuation_mini_backend(tiny, fake_xgb):
    """The previously-skipped end-to-end warm-start test, executed:
    each incremental_fit round CONTINUES the prior booster."""
    params = GBTParams(n_boost_round=2, max_depth=2, objective="reg:squarederror")
    models = incremental_fit(
        tiny, params, n_rounds=3, sample_fraction=1.0, warm_start=True
    )
    counts = [len(m.get_booster().get_dump()) for m in models]
    assert counts == [2, 4, 6]
    # rounds 2-3 went through the continuation trainer, round 1 fresh
    flags = [c["continued"] for c in fake_xgb.LAST_TRAIN_CALLS]
    assert flags == [False, True, True]


def test_xgb_continue_distributed_predict(tiny, fake_xgb, spark):
    """XGBBoosterModel.predict_df: executors deserialize the broadcast
    booster (worker-side ``import xgboost`` via addPyFile) and must
    reproduce the driver-side predictions exactly."""
    from daxos_spark.ml.train import fit_gbt, predict_gbt

    spark.sparkContext.addPyFile(fake_xgb._path)
    params = GBTParams(n_boost_round=3, max_depth=2, objective="reg:squarederror")
    prior = fake_xgb.train(
        {"objective": "reg:squarederror", "eta": 0.1},
        fake_xgb.DMatrix([[0.0, 0.0], [1.0, 2.0]], label=[0.0, 1.0]),
        num_boost_round=1,
    )
    model = fit_gbt(tiny, params, init_model=prior, backend="xgboost")
    got = {r["row_idx"]: r["y_pred"] for r in predict_gbt(model, tiny).collect()}
    rows = tiny.select("row_idx", "features").collect()
    Xl = np.asarray([r["features"] for r in rows], dtype=np.float32)
    want = model.get_booster().inplace_predict(Xl)
    for r, w in zip(rows, want):
        assert abs(got[r["row_idx"]] - float(w)) < 1e-12


def test_device_param_surface(tiny, fake_xgb):
    """O12 GPU config surface (reference daxos/distribute.py:50-71,
    config_gpu.yaml): GBTParams.device is validated, passed through to
    the xgboost backend, and raises loudly on the MLlib path."""
    from daxos_spark.ml.train import fit_gbt

    with pytest.raises(ValueError, match="device must be"):
        GBTParams(device="tpu")
    GBTParams(device="cuda")  # valid vocab
    GBTParams(device="cuda:1")
    # MLlib has no GPU implementation — loud, not silent-CPU
    with pytest.raises(NotImplementedError, match="device='cuda'"):
        fit_gbt(tiny, GBTParams(device="cuda", n_boost_round=1), backend="mllib")
    # xgboost backend: device reaches the native param dict
    prior = fake_xgb.Booster(params={"objective": "reg:squarederror"})
    fit_gbt(
        tiny,
        GBTParams(n_boost_round=1, objective="reg:squarederror", device="cuda:0"),
        init_model=prior,
        backend="xgboost",
    )
    assert fake_xgb.LAST_TRAIN_CALLS[-1]["params"]["device"] == "cuda:0"


def test_xgb_continue_distributed_branch(tiny, fake_xgb, spark, monkeypatch):
    """Past the driver-collect bounds the continuation routes to the
    DISTRIBUTED branch (barrier tasks + collective); at num_workers=1
    the result must be bitwise-identical to the collect-path fit on the
    same data — executed end-to-end against the fake 1-rank collective."""
    import daxos_spark.ml.train as train_mod

    spark.sparkContext.addPyFile(fake_xgb._path)  # worker-side import
    params = GBTParams(
        eta=0.5,
        n_boost_round=3,
        max_depth=2,
        objective="reg:squarederror",
        seed=9,
        num_workers=1,
    )
    native = train_mod._xgb_native_params(params)
    pdf = tiny.select("features", "label").toPandas()
    X = np.asarray(pdf["features"].tolist(), dtype=np.float32)
    y = pdf["label"].to_numpy(dtype="float64")
    prior = fake_xgb.train(native, fake_xgb.DMatrix(X, label=y), num_boost_round=2)
    expected = fit_gbt(tiny, params, init_model=prior, backend="xgboost")

    monkeypatch.setattr(train_mod, "MAX_CONTINUE_ROWS", 10)  # 40 rows > 10
    model = fit_gbt(tiny, params, init_model=prior, backend="xgboost")
    assert model.get_booster().trees == expected.get_booster().trees
    assert len(model.get_booster().trees) == 5  # 2 prior + 3 continued


def test_xgb_continue_distributed_multirank_honesty(tiny, fake_xgb, monkeypatch):
    """The fake collective refuses world sizes above 1 rather than
    silently returning a rank-0-shard-only model (no real allreduce)."""
    import daxos_spark.ml.train as train_mod

    monkeypatch.setattr(train_mod, "MAX_CONTINUE_ROWS", 10)
    prior = fake_xgb.Booster(params={"objective": "reg:squarederror"})
    with pytest.raises(NotImplementedError, match="1-rank only"):
        fit_gbt(
            tiny,
            GBTParams(n_boost_round=1, objective="reg:squarederror", num_workers=3),
            init_model=prior,
            backend="xgboost",
        )


def test_xgb_continue_row_guard(tiny, fake_xgb, monkeypatch):
    """When the distributed dependencies are absent, an over-bound batch
    still refuses loudly instead of spilling to the driver (the pre-
    round-5 guard, now the no-collective fallback)."""
    import daxos_spark.ml.train as train_mod

    monkeypatch.setattr(train_mod, "MAX_CONTINUE_ROWS", 10)
    monkeypatch.delattr(fake_xgb, "tracker")
    prior = fake_xgb.Booster(params={"objective": "reg:squarederror"})
    with pytest.raises(ValueError, match="past the driver-collect bound"):
        train_mod.fit_gbt(
            tiny,
            GBTParams(n_boost_round=1, objective="reg:squarederror"),
            init_model=prior,
            backend="xgboost",
        )
