"""End-to-end training pipeline (the reference's training Snakefile:
hp-search → refit → predict → calibrate) over the preprocessing gold
layer."""

from __future__ import annotations

import os

from daxos_spark.preprocess import run_preprocessing
from daxos_spark.training import run_training


def test_training_pipeline(spark, plink_raw_path, covars_path, tmp_path):
    raw, X, y, snps = plink_raw_path
    pre = run_preprocessing(spark, raw, covars_path, str(tmp_path / "lake"), seed=42)

    res = run_training(
        spark,
        pre.train_gold,
        pre.test_gold,
        str(tmp_path / "train_out"),
        n_folds=2,
        n_iter=2,
        cv_subsample=None,
        n_boost_round=5,
        row_chunks=60,
    )

    assert res.metric == "AUC"
    assert set(res.best_params) <= {"eta", "subsample", "colsample_bytree", "max_depth"}
    assert res.cv_results.count() == 4  # 2 params x 2 folds
    assert 0 < len(res.used_cols) <= len(snps)
    assert os.path.isdir(res.model_path)

    preds = res.predictions
    assert preds.count() == pre.n_test
    assert set(preds.columns) == {"IID", "y_true", "y_pred", "y_pred_platt_scaled"}
    rows = preds.collect()
    assert all(0.0 <= r["y_pred"] <= 1.0 for r in rows)
    assert all(0.0 <= r["y_pred_platt_scaled"] <= 1.0 for r in rows)

    # planted signal (conftest SIGNAL_SNPS) should make the model better
    # than chance on held-out data, and train score must be a valid AUC
    assert 0.5 <= res.train_score <= 1.0
    assert 0.4 <= res.test_score <= 1.0

    # importances cover exactly the pruned columns
    assert res.importances.count() == len(res.used_cols)


def test_training_pipeline_regression_mode(spark, plink_raw_path, covars_path, tmp_path):
    """label_adj flips the whole pipeline to regression (cv.py:90-99)."""
    raw, *_ = plink_raw_path
    pre = run_preprocessing(spark, raw, covars_path, str(tmp_path / "lake_r"), seed=42)
    res = run_training(
        spark,
        pre.train_gold,
        pre.test_gold,
        str(tmp_path / "train_out_r"),
        label_col="label_adj",
        features_col="features_adj",
        n_folds=2,
        n_iter=1,
        cv_subsample=None,
        n_boost_round=3,
        row_chunks=60,
    )
    assert res.metric == "RMSE"
    assert set(res.predictions.columns) == {"IID", "y_true", "y_pred"}
    assert res.test_score >= 0.0
