"""End-to-end training pipeline — the reference's training Snakemake
DAG (workflows/training/Snakefile:17-258: hp-search → refit → predict)
as one staged Spark application, completing the workflow parity that
preprocess.py provides for the preprocessing DAG.

Stages (each an explicit artifact boundary like the reference's
file-per-rule layout):

  1. CV × random HP search on a head-N subsample of the train gold
     table (T8-T11, O7) → cv_scores.csv + best param set
  2. Refit with the fit→prune→refit strategy (O10): full fit, keep the
     features the model used, refit on the pruned matrix → model +
     used_cols + importances
  3. Predict on the held-out test gold table with name-based column
     alignment (scripts/predict.py:124-134) → predictions + test score
  4. (classification) Platt calibration fitted on the CV out-of-fold
     predictions (M6), applied to the test predictions (M7)

An adjusted label column (label_adj) flips objective/metric to
regression mode — the reference's cv.py:90-99 plan rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ml.crossvalidate import cv_gbt, sample_param_grid
from .ml.explain import feature_importances, used_features
from .ml.scale import apply_platt, fit_platt
from .ml.scoring import score_model
from .ml.train import GBTParams, fit_gbt, predict_gbt, save_model
from .operators.subset import head_subsample
from .operators.subset import subset_columns
from .sources.plink import read_matrix


@dataclass
class TrainingResult:
    best_params: dict
    cv_results: DataFrame
    model_path: str
    used_cols: list[str]
    importances: DataFrame
    predictions: DataFrame  # IID, y_true, y_pred[, y_pred_platt_scaled]
    train_score: float
    test_score: float
    metric: str


def run_training(
    spark: SparkSession,
    train_gold: str,
    test_gold: str,
    out_dir: str,
    label_col: str = "label",
    features_col: str = "features",
    n_folds: int = 3,
    n_iter: int = 10,
    cv_subsample: int | None = 5000,
    row_chunks: int = 100,
    n_boost_round: int = 20,
    seed: int = 42,
) -> TrainingResult:
    """Train gold + test gold parquet → fitted/calibrated model +
    scored test predictions. See module doc."""
    regression = label_col.endswith("_adj")
    objective = "reg:squarederror" if regression else "binary:logistic"
    metric = "RMSE" if regression else "AUC"
    base = GBTParams(objective=objective, n_boost_round=n_boost_round, seed=seed)

    train = read_matrix(spark, train_gold)
    test = read_matrix(spark, test_gold)

    # ---- stage 1: CV × random search on the head-N subsample (valid
    # as a random subsample because the bronze layer is shuffled at
    # rest, O2/O7)
    cv_fact = head_subsample(train.fact, cv_subsample) if cv_subsample else train.fact
    grid = sample_param_grid(n_iter, seed=seed)
    cv_results, best, oof = cv_gbt(
        cv_fact, base, grid, n_folds=n_folds, row_chunks=row_chunks,
        features_col=features_col, label_col=label_col, metric=metric,
    )
    params = replace(base, **{k: v for k, v in best.items() if k in GBTParams.__dataclass_fields__})

    # ---- stage 2: fit → prune → refit (O10)
    model1 = fit_gbt(train.fact, params, features_col, label_col)
    used = used_features(model1, train.cols)
    pruned = subset_columns(train, used, match_prefix=False, features_col=features_col)
    model2 = fit_gbt(pruned.fact, params, features_col, label_col)
    model_path = f"{out_dir}/model"
    save_model(model2, model_path)
    imps = feature_importances(model2, pruned.cols)
    train_pred = predict_gbt(model2, pruned.fact, features_col, label_col)

    # ---- stage 3: predict on test with name-aligned columns
    test_aligned = subset_columns(test, used, match_prefix=False, features_col=features_col)
    preds = predict_gbt(model2, test_aligned.fact, features_col, label_col)

    # ---- stage 4: Platt calibration from OOF predictions (M6/M7)
    out_cols = ["IID", F.col(label_col).alias("y_true"), "y_pred"]
    if not regression:
        platt = fit_platt(oof, label_col=label_col)
        preds = apply_platt(platt, preds)
        out_cols.append("y_pred_platt_scaled")

    predictions = preds.select(*out_cols)
    return TrainingResult(
        best_params=best,
        cv_results=cv_results,
        model_path=model_path,
        used_cols=used,
        importances=imps,
        predictions=predictions,
        train_score=score_model(train_pred, metric, label_col),
        test_score=score_model(preds, metric, label_col),
        metric=metric,
    )
