"""Post-hoc covariate adjustment of predictions — M8-M10 (reference
daxos/scoring.py:15-135: fit_ols / fit_rf / auc).

The reference regresses y_pred on covariates (OLS via statsmodels or a
hyperparameter-searched RandomForest on a 5k subsample) and scores the
residuals. Spark-first: MLlib LinearRegression / RandomForestRegressor;
the 5k subsample is a seeded hash filter; residual = y_pred − fitted.
"""

from __future__ import annotations

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import score_auc, score_r2


def _assemble(df: DataFrame, cov_cols: list[str]) -> DataFrame:
    return VectorAssembler(inputCols=cov_cols, outputCol="__cov").transform(df)


def fit_ols_adjustment(
    df: DataFrame, cov_cols: list[str], pred_col: str = "y_pred"
) -> DataFrame:
    """M8 (scoring.py:75-91): y_pred ~ covars; adds fitted + resid."""
    data = _assemble(df, cov_cols)
    lr = LinearRegression(featuresCol="__cov", labelCol=pred_col, regParam=0.0)
    model = lr.fit(data)
    out = model.transform(data).withColumnRenamed("prediction", "fitted")
    return out.withColumn("resid", F.col(pred_col) - F.col("fitted")).drop("__cov")


def fit_rf_adjustment(
    df: DataFrame,
    cov_cols: list[str],
    pred_col: str = "y_pred",
    subsample: int = 5000,
    seed: int = 42,
    num_trees: int = 100,
    max_depth: int = 5,
) -> DataFrame:
    """M9 (scoring.py:15-72): RandomForest y_pred ~ covars, fitted on a
    bounded subsample, applied to all rows."""
    data = _assemble(df, cov_cols).persist()
    n = data.count()
    frac = min(1.0, subsample / max(n, 1))
    fit_set = data.sample(fraction=frac, seed=seed) if frac < 1.0 else data
    rf = RandomForestRegressor(
        featuresCol="__cov", labelCol=pred_col, numTrees=num_trees, maxDepth=max_depth, seed=seed
    )
    model = rf.fit(fit_set)
    out = model.transform(data).withColumnRenamed("prediction", "fitted")
    return out.withColumn("resid", F.col(pred_col) - F.col("fitted")).drop("__cov")


def adjusted_auc(
    df: DataFrame,
    cov_cols: list[str],
    label_col: str = "label",
    pred_col: str = "y_pred",
    model: str = "ols",
) -> dict:
    """M10 (scoring.py:94-135): returns raw AUC, adjusted AUC (on
    residuals), and R² of the covariate fit."""
    adj = (
        fit_ols_adjustment(df, cov_cols, pred_col)
        if model == "ols"
        else fit_rf_adjustment(df, cov_cols, pred_col)
    ).persist()
    out = {
        "auc_raw": score_auc(adj, label_col, pred_col),
        "auc_adjusted": score_auc(adj, label_col, "resid"),
        "r2_covars": score_r2(adj.withColumnRenamed(pred_col, "__t"), "__t", "fitted"),
    }
    adj.unpersist()
    return out
