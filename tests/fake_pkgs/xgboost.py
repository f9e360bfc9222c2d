"""Deterministic pure-numpy mini-xgboost for testing the T7 warm-start
continuation seam (ml/train.py) in environments without the real
dependency.

This is NOT a mock that returns canned answers: ``train`` is a real
(tiny) gradient-boosting trainer — depth-1 regression stumps fit to the
residuals of the current ensemble by exact greedy SSE search — and
``xgb_model`` continuation has xgboost's documented semantics: the new
rounds boost on the PRIOR ensemble's residuals. That makes the warm-
start identity ``train(k+m) == train(k) then continue(m)`` a genuine
numeric property of this module (asserted in test_backend_seam.py), so
the seam tests exercise _xgb_continue against a backend where
continuation-vs-retrain actually changes the answer.

API surface implemented = exactly what ml/train.py touches:
DMatrix(data, label), train(params, dtrain, num_boost_round, xgb_model),
Booster.{save_raw, load_model, inplace_predict, get_dump}. The module is
a single file so ``SparkContext.addPyFile`` can ship it to executors,
where XGBBoosterModel.predict_df's worker closure does
``import xgboost``.
"""

from __future__ import annotations

import json

import numpy as np

# every train() call records (params, num_boost_round, continued) so the
# seam tests can assert exact parameter pass-through from GBTParams
LAST_TRAIN_CALLS: list[dict] = []


class DMatrix:
    def __init__(self, data, label=None, **_kw):
        self.data = np.asarray(data, dtype=np.float64)
        self.label = None if label is None else np.asarray(label, dtype=np.float64)


class Booster:
    """Ensemble of (feature, threshold, left_value, right_value) stumps."""

    def __init__(self, trees=None, params=None):
        self.trees = [tuple(t) for t in (trees or [])]
        self.params = dict(params or {})

    def _margin(self, X: np.ndarray) -> np.ndarray:
        out = np.zeros(X.shape[0])
        for f, thr, lv, rv in self.trees:
            out += np.where(X[:, int(f)] <= thr, lv, rv)
        return out

    def inplace_predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        m = self._margin(X)
        if str(self.params.get("objective", "")).startswith("binary"):
            return 1.0 / (1.0 + np.exp(-m))
        return m

    def get_dump(self):
        return [json.dumps(t) for t in self.trees]

    def save_raw(self, raw_format="json"):
        assert raw_format == "json"
        return json.dumps({"trees": self.trees, "params": self.params}).encode()

    def load_model(self, raw):
        obj = json.loads(bytes(raw).decode())
        self.trees = [tuple(t) for t in obj["trees"]]
        self.params = obj["params"]


def _fit_stump(X: np.ndarray, resid: np.ndarray):
    """Exact greedy depth-1 split minimizing residual SSE; deterministic
    tie-break by (sse, feature, threshold)."""
    best = None
    for f in range(X.shape[1]):
        for thr in np.unique(X[:, f])[:-1]:
            m = X[:, f] <= thr
            lv, rv = resid[m].mean(), resid[~m].mean()
            sse = float(((resid[m] - lv) ** 2).sum() + ((resid[~m] - rv) ** 2).sum())
            key = (sse, f, float(thr))
            if best is None or key < best[0]:
                best = (key, (int(f), float(thr), float(lv), float(rv)))
    if best is None:  # single distinct point per feature: constant leaf
        v = float(resid.mean())
        return (0, 0.0, v, v)
    return best[1]


def train(params, dtrain, num_boost_round=10, xgb_model=None, **_kw):
    LAST_TRAIN_CALLS.append(
        {
            "params": dict(params),
            "num_boost_round": int(num_boost_round),
            "continued": xgb_model is not None,
        }
    )
    obj = params.get("objective", "reg:squarederror")
    if obj != "reg:squarederror":
        raise NotImplementedError("mini-xgboost implements reg:squarederror only")
    if xgb_model is None:
        bst = Booster(params=params)
    else:
        # continuation: start from the prior ensemble's trees; new
        # rounds use the NEW params (xgboost's xgb_model semantics)
        bst = Booster(xgb_model.trees, {**xgb_model.params, **dict(params)})
    eta = float(params.get("eta", 0.3))
    X, y = dtrain.data, dtrain.label
    for _ in range(int(num_boost_round)):
        resid = y - bst._margin(X)
        f, thr, lv, rv = _fit_stump(X, resid)
        bst.trees.append((f, thr, eta * lv, eta * rv))
    return bst


# ------------------------------------------------------- collective/tracker
# 1-rank stand-ins for the distributed-continuation seam
# (ml/train.py::_xgb_continue_distributed): the same public names as
# xgboost >= 2.1 (tracker.RabitTracker, collective.CommunicatorContext),
# honest about their limit — a world size above 1 raises instead of
# silently training rank-0-shard-only models (the fake has no real
# allreduce; the real package's collective handles multi-rank).


class _FakeTracker:
    def __init__(self, host_ip=None, n_workers=1, **_kw):
        self.n_workers = int(n_workers)

    def start(self):
        if self.n_workers > 1:
            raise NotImplementedError(
                "mini-xgboost tracker is 1-rank only (no allreduce); "
                "multi-rank continuation needs the real xgboost"
            )

    def worker_args(self):
        return {"n_workers": self.n_workers}

    def free(self):
        pass


class _FakeCommunicatorContext:
    def __init__(self, **args):
        if int(args.get("n_workers", 1)) > 1:
            raise NotImplementedError(
                "mini-xgboost collective is 1-rank only (no allreduce)"
            )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


tracker = _NS(RabitTracker=_FakeTracker)
collective = _NS(CommunicatorContext=_FakeCommunicatorContext)


# ---------------------------------------------------------------- spark API


def _collect_xy(df, features_col, label_col):
    pdf = df.select(features_col, label_col).toPandas()
    col = pdf[features_col]
    if len(col) and hasattr(col.iloc[0], "toArray"):  # MLlib VectorUDT
        X = np.asarray([v.toArray() for v in col], dtype=np.float64)
    else:
        X = np.asarray(col.tolist(), dtype=np.float64)
    return X, pdf[label_col].to_numpy(dtype="float64")


class _SparkModel:
    def __init__(self, booster):
        self._booster = booster

    def get_booster(self):
        return self._booster


class SparkXGBRegressor:
    """From-scratch distributed-estimator stand-in: same constructor
    surface as xgboost.spark, fit() runs the mini trainer on collected
    data (the fixtures are tiny)."""

    def __init__(self, features_col="features", label_col="label", num_round=10, **params):
        self.features_col = features_col
        self.label_col = label_col
        self.num_round = num_round
        self.params = params

    def fit(self, df):
        X, y = _collect_xy(df, self.features_col, self.label_col)
        native = {"objective": "reg:squarederror", **self.params}
        return _SparkModel(train(native, DMatrix(X, label=y), self.num_round))


class SparkXGBClassifier(SparkXGBRegressor):
    def fit(self, df):
        raise NotImplementedError("mini-xgboost backend is regression-only")
