"""Saabas contributions: additivity, margin consistency, pruning."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from daxos_spark.ml.contrib import mean_abs_contributions, tree_contributions
from daxos_spark.ml.train import GBTParams, fit_gbt


@pytest.fixture(scope="module")
def contrib_setup(spark, matrix_ds):
    fact = matrix_ds.fact
    model = fit_gbt(fact, GBTParams(eta=0.3, max_depth=3, n_boost_round=8, seed=7))
    contribs = tree_contributions(model, fact).cache()
    return fact, model, contribs


def test_contributions_additive(contrib_setup):
    _, _, contribs = contrib_setup
    rows = contribs.collect()
    for r in rows[:50]:
        assert abs(r["bias"] + sum(r["contribs"]) - r["margin"]) < 1e-9


def test_margin_matches_model_probability(spark, contrib_setup):
    fact, model, contribs = contrib_setup
    # GBTClassifier: P(1) = sigmoid(2 * margin)
    from daxos_spark.ml.train import predict_gbt

    scored = predict_gbt(model, fact).select("row_idx", "y_pred")
    joined = {r["row_idx"]: r["y_pred"] for r in scored.collect()}
    for r in contribs.collect()[:50]:
        expect = 1.0 / (1.0 + math.exp(-2.0 * r["margin"]))
        assert abs(joined[r["row_idx"]] - expect) < 1e-6


def test_signal_features_dominate(contrib_setup):
    # fixture plants signal in the last two SNPs (conftest SIGNAL_SNPS)
    _, _, contribs = contrib_setup
    imp = mean_abs_contributions(contribs).collect()
    vals = np.array([r["mean_abs_contrib"] for r in imp])
    top2 = set(np.argsort(vals)[-2:])
    assert top2 == {10, 11}


def test_contribs_parquet_roundtrip(spark, tmp_path, contrib_setup):
    # S15 sink analogue: the SHAP tensor persisted as parquet array cols
    _, _, contribs = contrib_setup
    path = str(tmp_path / "contribs.parquet")
    contribs.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == contribs.count()
    assert dict(back.dtypes)["contribs"] == "array<double>"
