"""Cross-validation + random hyperparameter search — T8-T11, O5-O7
(reference daxos/crossvalidate.py:112-122 sampler, :178-200 one-round
CV, :243-305 k-fold × param search, :398-412 orchestration).

Structure mirrors the reference deliberately (folds outer / params
inner so each fold's cached DataFrame is reused across params — O6),
but fold membership is a pure function of row_idx (operators/splits.py)
so no shuffle happens per fold, and results/OOF predictions stay
DataFrames.
"""

from __future__ import annotations

import math
from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.splits import with_fold_column
from .scoring import score_model
from .train import GBTParams, fit_gbt, predict_gbt


def sample_param_grid(n_iter: int, seed: int = 42, subsample_min: float = 0.5, subsample_max: float = 1.0) -> list[dict]:
    """T10 random-search sampler (crossvalidate.py:112-122):
    eta ~ reciprocal(1e-4, 0.1) (log-uniform), subsample ~ U(min,max),
    colsample_bytree ~ U(0.5, 1.0), max_depth ~ randint(2, 8).
    Pure numpy (scipy-free log-uniform via exp of uniform log-range).
    """
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_iter):
        out.append(
            {
                "eta": float(math.exp(rng.uniform(math.log(1e-4), math.log(0.1)))),
                "subsample": float(rng.uniform(subsample_min, subsample_max)),
                "colsample_bytree": float(rng.uniform(0.5, 1.0)),
                "max_depth": int(rng.randint(2, 9)),
            }
        )
    return out


def cv_gbt(
    fact: DataFrame,
    base_params: GBTParams,
    param_grid: list[dict],
    n_folds: int = 3,
    row_chunks: int = 100,
    features_col: str = "features",
    label_col: str = "label",
    metric: str | None = None,
):
    """T8 k-fold CV × param search.

    Returns (results DataFrame with one row per (param, fold) — the
    FIXTURES.md §7 cv_results schema — and the OOF predictions of the
    best param combo as a DataFrame keyed by row_idx).
    """
    spark = fact.sparkSession
    metric = metric or ("AUC" if base_params.is_classification else "RMSE")
    folded = with_fold_column(fact, n_folds, row_chunks).persist()

    rows: list[dict] = []
    oof_by_param: dict[int, list[DataFrame]] = {i: [] for i in range(len(param_grid))}
    for fold in range(n_folds):  # folds outer / params inner (O6)
        train = folded.filter(F.col("fold") != fold)
        test = folded.filter(F.col("fold") == fold)
        for pi, pdict in enumerate(param_grid):
            params = replace(base_params, **pdict)
            model = fit_gbt(train, params, features_col, label_col)
            test_pred = predict_gbt(model, test, features_col, label_col)
            train_pred = predict_gbt(model, train, features_col, label_col)
            rows.append(
                {
                    **pdict,
                    "metric": metric,
                    "score": score_model(test_pred, metric, label_col),
                    "train_score": score_model(train_pred, metric, label_col),
                    "fold": fold,
                    "n_boost_round": params.n_boost_round,
                }
            )
            oof_by_param[pi].append(test_pred.select("row_idx", label_col, "y_pred"))

    results = spark.createDataFrame(pd.DataFrame(rows))

    # A1+A2: group-mean over folds, arg-best (metric direction-aware)
    ascending = metric.upper() == "RMSE"
    mean_scores = [
        (pi, float(np.mean([r["score"] for r in rows if _same_params(r, param_grid[pi])])))
        for pi in range(len(param_grid))
    ]
    best_pi = min(mean_scores, key=lambda t: t[1] if ascending else -t[1])[0]

    oof = oof_by_param[best_pi][0]
    for part in oof_by_param[best_pi][1:]:
        oof = oof.unionByName(part)
    folded.unpersist()
    return results, param_grid[best_pi], oof


def _same_params(row: dict, pdict: dict) -> bool:
    return all(row[k] == v for k, v in pdict.items())


def fit_one_round_cv(
    fact: DataFrame,
    params: GBTParams,
    n_folds: int = 3,
    row_chunks: int = 100,
    features_col: str = "features",
    label_col: str = "label",
):
    """T9 single-param CV (crossvalidate.py:178-200): per-fold scores +
    OOF predictions (feeds Platt scaling, M6)."""
    results, _, oof = cv_gbt(
        fact,
        params,
        [
            {
                "eta": params.eta,
                "subsample": params.subsample,
                "colsample_bytree": params.colsample_bytree,
                "max_depth": params.max_depth,
            }
        ],
        n_folds=n_folds,
        row_chunks=row_chunks,
        features_col=features_col,
        label_col=label_col,
    )
    return results, oof


def incremental_fit(
    fact: DataFrame,
    params: GBTParams,
    n_rounds: int,
    sample_fraction: float,
    row_chunks: int = 100,
    seed: int = 42,
    features_col: str = "features",
    label_col: str = "label",
    warm_start: bool = False,
):
    """T7/O8 incremental training analogue (crossvalidate.py:203-240):
    per round, train on a fresh chunk-aligned subsample.

    With ``warm_start=True`` and the optional xgboost backend installed
    (ml/train.py HAS_XGBOOST), each round CONTINUES the previous
    booster via ``xgb_model`` — true boosting continuation, exactly the
    reference's semantics. Without xgboost, MLlib GBT cannot resume a
    booster (documented gap, SURVEY §7.2), so each round trains an
    independent model on its subsample and the ensemble averages their
    scores — bounded-memory passes with the same read-time-subsample
    contract as the reference (O8).
    Returns the list of per-round models (one cumulative model per
    round in warm-start mode).
    """
    from ..operators.splits import chunk_id
    from .train import HAS_XGBOOST

    if warm_start and not HAS_XGBOOST:
        raise ImportError(
            "warm_start=True requires the optional xgboost backend "
            "(MLlib GBT cannot resume a booster)"
        )

    models = []
    booster = None
    for r in range(n_rounds):
        cid = chunk_id(F.col("row_idx"), row_chunks)
        u = F.pmod(F.xxhash64(cid, F.lit(seed + r)), F.lit(1_000_000)) / 1_000_000.0
        sub = fact.filter(u < sample_fraction)
        if warm_start:
            m = fit_gbt(
                sub,
                replace(params, seed=seed + r),
                features_col,
                label_col,
                init_model=booster,
                backend="xgboost",
            )
            booster = m.get_booster()
            models.append(m)
        else:
            models.append(
                fit_gbt(sub, replace(params, seed=seed + r), features_col, label_col)
            )
    return models


def predict_ensemble(models, df: DataFrame, features_col: str = "features", label_col: str = "label") -> DataFrame:
    """Average the per-round models' scores (see incremental_fit)."""
    out = None
    for i, m in enumerate(models):
        scored = predict_gbt(m, df, features_col, label_col, pred_col=f"__p{i}")
        out = scored if out is None else out.join(scored.select("row_idx", f"__p{i}"), "row_idx")
    cols = [f"__p{i}" for i in range(len(models))]
    avg = sum(F.col(c) for c in cols) / len(cols)
    return out.withColumn("y_pred", avg).drop(*cols)
