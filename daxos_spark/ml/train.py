"""Gradient-boosted-tree training/prediction — T1/T3 (reference
daxos/crossvalidate.py:148-175 ``fit_dask_xgb``, :194 ``predict``).

Spark-first: features live as ``array<float>`` in the fact table and are
promoted to MLlib vectors with ``array_to_vector`` (no Python UDF);
training is MLlib GBT (JVM, distributed); prediction is
``model.transform`` — label and features travel in the same row, so the
reference's manual partition→worker co-location (crossvalidate.py:21-53)
has no analogue here by design (SURVEY §4 O3).

Param mapping (reference xgboost → MLlib GBT):
    eta → stepSize, max_depth → maxDepth, subsample → subsamplingRate,
    colsample_bytree → featureSubsetStrategy, n_boost_round → maxIter.
``xgb_model`` warm-start (T7) has no MLlib equivalent — documented gap
(SURVEY §7.2); with xgboost.spark installed the same interface passes it
through.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.ml.classification import GBTClassificationModel, GBTClassifier
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import GBTRegressionModel, GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GBTParams:
    """Hyperparameters in reference vocabulary (crossvalidate.py:112-122)."""

    eta: float = 0.1
    max_depth: int = 4
    subsample: float = 1.0
    colsample_bytree: float = 1.0
    n_boost_round: int = 20
    objective: str = "binary:logistic"  # or "reg:squarederror"
    seed: int = 42
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def is_classification(self) -> bool:
        return self.objective.startswith("binary")


try:  # optional backend — not shipped in every environment
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor  # noqa: F401

    HAS_XGBOOST = True
except ImportError:
    HAS_XGBOOST = False


def _prep(df: DataFrame, features_col: str, label_col: str) -> DataFrame:
    out = df
    if dict(df.dtypes)[features_col].startswith("array"):
        out = out.withColumn("__fvec", array_to_vector(F.col(features_col)))
    else:
        out = out.withColumn("__fvec", F.col(features_col))
    return out.withColumn("__label", F.col(label_col).cast("double"))


def _estimator(params: GBTParams):
    common = dict(
        featuresCol="__fvec",
        labelCol="__label",
        maxIter=params.n_boost_round,
        maxDepth=params.max_depth,
        stepSize=params.eta,
        subsamplingRate=params.subsample,
        seed=params.seed,
        featureSubsetStrategy=(
            "all" if params.colsample_bytree >= 1.0 else str(params.colsample_bytree)
        ),
        **params.extra,
    )
    if params.is_classification:
        return GBTClassifier(**common)
    return GBTRegressor(**common)


def _xgb_estimator(params: GBTParams, init_model=None):
    """xgboost.spark twin of `_estimator` — the T7 warm-start path
    (reference daxos/crossvalidate.py:203-240 ``xgb_model``
    continuation). Only reachable when xgboost is installed; maps the
    same GBTParams vocabulary onto SparkXGBClassifier/Regressor and
    passes ``init_model`` (a Booster or prior SparkXGB model's booster)
    through as ``xgb_model`` so new rounds fit the residuals of the
    existing ensemble — true boosting continuation, not
    ensemble-of-rounds averaging."""
    common = dict(
        features_col="__fvec",
        label_col="__label",
        num_round=params.n_boost_round,
        max_depth=params.max_depth,
        eta=params.eta,
        subsample=params.subsample,
        colsample_bytree=params.colsample_bytree,
        seed=params.seed,
        **params.extra,
    )
    if init_model is not None:
        common["xgb_model"] = init_model
    if params.is_classification:
        return SparkXGBClassifier(**common)
    return SparkXGBRegressor(**common)


def fit_gbt(
    df: DataFrame,
    params: GBTParams,
    features_col: str = "features",
    label_col: str = "label",
    init_model=None,
    backend: str = "auto",
):
    """Train a distributed GBT; returns the fitted model.

    ``backend``: "mllib" (default engine), "xgboost" (requires the
    optional dependency), or "auto" (xgboost only when a warm-start
    ``init_model`` is given and the dependency is present). MLlib GBT
    cannot continue a booster (SURVEY §7.2 documented gap), so asking
    for ``init_model`` without xgboost raises instead of silently
    training from scratch.
    """
    if backend == "auto":
        backend = "xgboost" if (init_model is not None and HAS_XGBOOST) else "mllib"
    if backend == "xgboost":
        if not HAS_XGBOOST:
            raise ImportError(
                "backend='xgboost' requested but xgboost.spark is not installed"
            )
        return _xgb_estimator(params, init_model).fit(_prep(df, features_col, label_col))
    if init_model is not None:
        raise NotImplementedError(
            "warm-start continuation requires the xgboost backend "
            "(MLlib GBT cannot resume a booster); install xgboost or drop init_model"
        )
    return _estimator(params).fit(_prep(df, features_col, label_col))


def predict_gbt(
    model,
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    pred_col: str = "y_pred",
) -> DataFrame:
    """Score a DataFrame; classification → P(class=1), regression → yhat.

    Output keeps all input columns + ``pred_col`` (the reference's
    predictions-keyed-by-IID sink shape, scripts/predict.py:161-170).
    """
    scored = model.transform(_prep(df, features_col, label_col))
    if isinstance(model, GBTClassificationModel):
        pred = vector_to_array(F.col("probability")).getItem(1)
    else:
        pred = F.col("prediction")
    drop = [c for c in ("__fvec", "__label", "rawPrediction", "probability", "prediction") if c in scored.columns]
    return scored.withColumn(pred_col, pred.cast("double")).drop(*drop)


def save_model(model, path: str) -> None:
    """S11 analogue (daxos/read.py:11-31 booster JSON save/load)."""
    model.write().overwrite().save(path)


def load_model(path: str, classification: bool = True):
    cls = GBTClassificationModel if classification else GBTRegressionModel
    return cls.load(path)
