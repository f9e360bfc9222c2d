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


def auc_exact(df: DataFrame, label_col: str = "label", pred_col: str = "y_pred") -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank statistic — the audit
    companion to ``score_auc`` (A5): the MLlib evaluator downsamples
    the ROC curve past its bin budget, which is right for training
    loops but not for a hash-checkable audit. Here everything stays an
    exact INTEGER until one final division, so two engines computing it
    from the same rows produce the identical double:

        2·R_pos = Σ_s pos_s · (2·cum_before_s + cnt_s + 1)   (avg ranks,
                                                              tie-correct)
        AUC = (2·R_pos − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    Tied scores get the average rank of their block, which makes this
    exactly the trapezoidal area under the exact ROC curve.

    Scale shape: one groupBy on the score (distinct-score cardinality,
    not row count), one cumulative window over those grouped rows, one
    global aggregate. The ordered window is the honest cost — an exact
    audit needs a total order over distinct scores; run it on the
    holdout/audit slice, keep ``score_auc`` for the hot training loop.

    Returns a 1-row DataFrame (n_pos, n_neg, auc).
    """
    from pyspark.sql.window import Window

    c = _clean(df, label_col, pred_col)
    g = c.groupBy("__p").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("__y").cast("bigint")).alias("pos"),
    )
    w = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    cum = F.coalesce(F.sum("cnt").over(w), F.lit(0))
    per = g.select(
        (F.col("pos") * (2 * cum + F.col("cnt") + 1)).alias("r2"),
        "cnt",
        "pos",
    )
    a = per.agg(
        F.sum("r2").alias("r2pos"),
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("npos"),
    )
    npos, n = F.col("npos"), F.col("n")
    return a.select(
        npos.cast("bigint").alias("n_pos"),
        (n - npos).cast("bigint").alias("n_neg"),
        (
            (F.col("r2pos") - npos * (npos + 1)).cast("double")
            / (2 * npos * (n - npos)).cast("double")
        ).alias("auc"),
    )
