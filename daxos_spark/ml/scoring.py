"""Model scoring — A5/A6 (reference daxos/crossvalidate.py:130-145
``score_model``, daxos/scoring.py:94-135 adjusted AUC).

MLlib evaluators compute AUC/RMSE/R² distributed; the NaN-label filter
mirrors score_model's mask (crossvalidate.py:133-138 → P6).
"""

from __future__ import annotations

from pyspark.ml.evaluation import BinaryClassificationEvaluator, RegressionEvaluator
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    # P6 null-label filter (crossvalidate.py:133-138)
    return df.filter(F.col(label_col).isNotNull() & ~F.isnan(F.col(label_col))).select(
        F.col(label_col).cast("double").alias("__y"), F.col(pred_col).cast("double").alias("__p")
    )


def score_auc(df: DataFrame, label_col: str = "label", pred_col: str = "y_pred") -> float:
    ev = BinaryClassificationEvaluator(
        labelCol="__y", rawPredictionCol="__p", metricName="areaUnderROC"
    )
    return float(ev.evaluate(_clean(df, label_col, pred_col)))


def score_rmse(df: DataFrame, label_col: str = "label", pred_col: str = "y_pred") -> float:
    ev = RegressionEvaluator(labelCol="__y", predictionCol="__p", metricName="rmse")
    return float(ev.evaluate(_clean(df, label_col, pred_col)))


def score_r2(df: DataFrame, label_col: str = "label", pred_col: str = "y_pred") -> float:
    ev = RegressionEvaluator(labelCol="__y", predictionCol="__p", metricName="r2")
    return float(ev.evaluate(_clean(df, label_col, pred_col)))


def score_model(df: DataFrame, metric: str, label_col: str = "label", pred_col: str = "y_pred") -> float:
    """Reference-vocabulary dispatch ('AUC' | 'RMSE' | 'R2')."""
    metric = metric.upper()
    if metric == "AUC":
        return score_auc(df, label_col, pred_col)
    if metric == "RMSE":
        return score_rmse(df, label_col, pred_col)
    if metric == "R2":
        return score_r2(df, label_col, pred_col)
    raise ValueError(f"unknown metric {metric!r}")
