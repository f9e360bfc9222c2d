"""Platt scaling — M6/M7 (reference daxos/scale.py:8-30
run_cv_and_platt_scale, daxos/utils.py:41-49 yhat).

Fit: unpenalized logistic regression of out-of-fold predictions onto
the binary label (exactly the reference's
LogisticRegression(penalty=None) on stacked OOF preds).
Apply: model.transform → calibrated probability column.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_platt(oof: DataFrame, label_col: str = "label", pred_col: str = "y_pred") -> LogisticRegressionModel:
    """M6: fit on OOF predictions (scale.py:8-30). regParam=0 ≡
    sklearn penalty=None."""
    data = oof.select(
        array_to_vector(F.array(F.col(pred_col).cast("double"))).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(regParam=0.0, standardization=False)
    return lr.fit(data)


def apply_platt(
    model: LogisticRegressionModel,
    scored: DataFrame,
    pred_col: str = "y_pred",
    out_col: str = "y_pred_platt_scaled",
) -> DataFrame:
    """M7: predict_proba[:,1] (utils.py:41-49) → calibrated column,
    keeping all input columns (predictions CSV shape,
    scripts/predict.py:161-164)."""
    data = scored.withColumn(
        "__pf", array_to_vector(F.array(F.col(pred_col).cast("double")))
    )
    # param override, not a rename — the input frame may legitimately
    # carry its own `features` column (the fact table's array)
    out = model.transform(data, {model.featuresCol: "__pf"})
    return (
        out.withColumn(out_col, vector_to_array(F.col("probability")).getItem(1))
        .drop("__pf", "rawPrediction", "probability", "prediction")
    )
