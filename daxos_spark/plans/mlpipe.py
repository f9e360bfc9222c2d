"""ML queries exposed through the driver harness (rows-only checks).

These exercise the training surface (T1/T3/A5, X3 splits) on the
`embeddings` table. They are genuinely non-SQL-expressible (iterative
tree boosting), so no oracle_sql is declared — the driver records the
weaker rows-only check (per the contract), and the numeric behavior is
covered by pytest against closed-form/numpy oracles instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..ml.scoring import score_auc
from ..ml.train import GBTParams, fit_gbt, predict_gbt
from .registry import QuerySpec, register


def _q(name: str, doc: str = ""):
    def deco(fn):
        register(QuerySpec(name=name, spark=fn, oracle=None, doc=doc, tags=("ml",)))
        return fn

    return deco


def _binary_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    # binary target from the 10-class label; deterministic seeded split
    # (X3, split_ids.py:46-62 → pure function of the key, no sampling RNG)
    return e.select(
        "vec_id",
        F.col("embedding").alias("features"),
        (F.col("label") >= 5).cast("float").alias("label"),
        (F.pmod(F.col("vec_id"), F.lit(5)) == 0).alias("is_test"),
    )


@_q("ml_gbt_train_eval", doc="GBT train/test AUC on embeddings (T1/T3/A5)")
def ml_gbt_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _binary_embeddings(spark, sf_dir).cache()
    train = df.filter(~F.col("is_test"))
    test = df.filter(F.col("is_test"))
    params = GBTParams(eta=0.1, max_depth=3, n_boost_round=10, seed=42)
    model = fit_gbt(train, params)
    auc_train = score_auc(predict_gbt(model, train))
    auc_test = score_auc(predict_gbt(model, test))
    n_train, n_test = train.count(), test.count()
    return spark.createDataFrame(
        [(n_train, n_test, round(auc_train, 3), round(auc_test, 3))],
        "n_train long, n_test long, auc_train double, auc_test double",
    )


@_q("ml_gbt_top_predictions", doc="per-row GBT scores joined back by id (J5 shape)")
def ml_gbt_top_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _binary_embeddings(spark, sf_dir).cache()
    train = df.filter(~F.col("is_test"))
    test = df.filter(F.col("is_test"))
    model = fit_gbt(train, GBTParams(eta=0.1, max_depth=3, n_boost_round=10, seed=42))
    scored = predict_gbt(model, test)
    return (
        scored.select("vec_id", "label", F.round(F.col("y_pred"), 4).alias("y_pred"))
        .orderBy(F.col("y_pred").desc(), F.col("vec_id"))
        .limit(20)
    )
