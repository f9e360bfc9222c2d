"""Model explanation — T4-T6, A3, P3/P5 (reference daxos/explain.py).

T6 classic importances come from the fitted model. Without xgboost,
MLlib exposes ONE importance vector (impurity-gain based,
``featureImportances``) rather than the five xgboost types — the
importances table keeps the reference's column layout with the
available column filled (documented delta).

T4 per-row SHAP (pred_contribs) has no MLlib equivalent; the engine
provides distributed *permutation importance* as the model-agnostic
substitute (same "importance per feature from the fitted model on a
dataset" contract, A3's mean|Δscore| aggregation), and keeps the
reference's fit→prune→refit strategy (O10) via `used_features` +
operators.subset.subset_columns. With xgboost.spark installed, its
``pred_contrib_col`` drops into `shap_contribs` below.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scoring import score_model
from .train import predict_gbt


def feature_importances(model, cols: DataFrame) -> DataFrame:
    """T6 (explain.py:46-60): importance table keyed by SNP name."""
    imp = model.featureImportances.toArray()
    spark = cols.sparkSession
    imp_df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(imp)], "pos int, gain double"
    )
    return cols.join(imp_df, "pos", "left").na.fill({"gain": 0.0}).select(
        F.col("snp").alias("predictors"), "gain"
    )


def used_features(model, cols: DataFrame) -> list[str]:
    """P3 model-driven pruning input (refit.py:62-74): features the
    booster actually used (nonzero importance)."""
    imp = model.featureImportances.toArray()
    keep = {int(i) for i in np.nonzero(imp)[0]}
    return [r["snp"] for r in cols.collect() if r["pos"] in keep]


def permutation_importance(
    model,
    df: DataFrame,
    cols: DataFrame,
    metric: str = "AUC",
    n_features: int | None = None,
    seed: int = 42,
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Model-agnostic importance: mean score drop when one feature
    column is shuffled across rows (T4/A3 substitute).

    The per-feature shuffle reuses the shadow-column trick (SURVEY §7.2
    "per-column shadow shuffle"): replace feature j with the value from
    a pseudo-randomly chosen other row via a seeded-hash self-join —
    fully distributed, no driver matrices.
    """
    base = score_model(predict_gbt(model, df, features_col, label_col), metric, label_col)
    n = df.count()
    positions = [r["pos"] for r in cols.orderBy("pos").collect()]
    if n_features is not None:
        positions = positions[:n_features]

    # seeded-hash donor mapping is not a bijection — dedupe per
    # destination and fall back to the row's own features when no donor
    # hashed to it, so row multiplicity is preserved exactly.
    donor = (
        df.select(
            F.pmod(F.xxhash64(F.col("row_idx"), F.lit(seed)), F.lit(n)).alias("__dst"),
            F.col(features_col).alias("__donor_feats"),
        )
        .groupBy("__dst")
        .agg(F.first("__donor_feats").alias("__donor_feats"))
    )
    rows = []
    joined = (
        df.join(donor, df["row_idx"] == F.col("__dst"), "left")
        .withColumn("__donor_feats", F.coalesce("__donor_feats", F.col(features_col)))
        .drop("__dst")
        .persist()
    )
    for pos in positions:
        permuted = joined.withColumn(
            features_col,
            F.concat(
                F.slice(features_col, 1, pos),
                F.array(F.element_at("__donor_feats", pos + 1)),
                F.slice(features_col, pos + 2, 1 << 30),
            ),
        )
        s = score_model(predict_gbt(model, permuted, features_col, label_col), metric, label_col)
        drop = (base - s) if metric.upper() != "RMSE" else (s - base)
        rows.append((pos, float(drop)))
    joined.unpersist()

    spark = df.sparkSession
    drops = spark.createDataFrame(rows, "pos int, shap_mean_abs double")
    return cols.join(drops, "pos").select(F.col("snp").alias("predictors"), "shap_mean_abs")
