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


# ---------------------------------------------------------------------------
# Exact TreeSHAP vs brute-force Shapley enumeration


def _expected_value(tree, cover, x, S, node=0):
    """E[f(x') | x'_S = x_S] under the tree's cover distribution —
    the conditional-expectation game TreeSHAP computes exactly."""
    f = tree.feat[node]
    if f < 0:
        return tree.pred[node]
    l, r = int(tree.left[node]), int(tree.right[node])
    if int(f) in S:
        child = l if x[f] <= tree.thr[node] else r
        return _expected_value(tree, cover, x, S, child)
    wl = cover[l] / cover[node]
    wr = cover[r] / cover[node]
    return wl * _expected_value(tree, cover, x, S, l) + wr * _expected_value(
        tree, cover, x, S, r
    )


def _brute_shapley(tree, cover, x, p):
    import itertools
    import math

    phi = np.zeros(p)
    feats = list(range(p))
    for f in feats:
        others = [g for g in feats if g != f]
        for k in range(len(others) + 1):
            for S in itertools.combinations(others, k):
                wgt = math.factorial(k) * math.factorial(p - k - 1) / math.factorial(p)
                gain = _expected_value(tree, cover, x, set(S) | {f}) - _expected_value(
                    tree, cover, x, set(S)
                )
                phi[f] += wgt * gain
    return phi


def test_treeshap_matches_bruteforce_shapley(spark, matrix_ds):
    from daxos_spark.ml.contrib import _flatten_tree_with_cover, _shap_one_tree

    # small feature space so 2^p enumeration is feasible: project to 6 dims
    fact = matrix_ds.fact.select(
        "row_idx",
        F.array(*[F.col("features")[i] for i in [0, 1, 2, 3, 10, 11]]).alias("features"),
        "label",
    )
    model = fit_gbt(fact, GBTParams(eta=0.5, max_depth=3, n_boost_round=3, seed=3))
    flat = [_flatten_tree_with_cover(t._call_java("rootNode")) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]

    rows = fact.select("row_idx", "features").limit(5).collect()
    for row in rows:
        x = np.asarray(row["features"], dtype=np.float64)
        got = np.zeros(6)
        want = np.zeros(6)
        for (t, cov), w in zip(flat, weights):
            _shap_one_tree(x, t, cov, got, w)
            want += w * _brute_shapley(t, cov, x, 6)
        assert np.allclose(got, want, atol=1e-9), (got, want)


def _brute_shapley_interactions(tree, cover, x, p):
    """Shapley interaction index (Lundberg '18 Thm 2 / Fujimoto '06):
    Φ_ij = Σ_{S⊆N\\{i,j}} |S|!(M−|S|−2)!/(2(M−1)!)·δ_ij(S), with
    δ_ij(S) = v(S∪{i,j}) − v(S∪{i}) − v(S∪{j}) + v(S); diagonal is
    the main effect left after removing interactions from phi_i."""
    import itertools
    import math

    v = lambda S: _expected_value(tree, cover, x, S)
    Phi = np.zeros((p, p))
    for i in range(p):
        for j in range(p):
            if i == j:
                continue
            others = [g for g in range(p) if g not in (i, j)]
            for k in range(len(others) + 1):
                for S in itertools.combinations(others, k):
                    S = set(S)
                    wgt = (
                        math.factorial(k)
                        * math.factorial(p - k - 2)
                        / (2.0 * math.factorial(p - 1))
                    )
                    delta = (
                        v(S | {i, j}) - v(S | {i}) - v(S | {j}) + v(S)
                    )
                    Phi[i, j] += wgt * delta
    phi = _brute_shapley(tree, cover, x, p)
    for i in range(p):
        Phi[i, i] = phi[i] - Phi[i].sum()
    return Phi


def test_shap_interactions_match_bruteforce(spark, matrix_ds):
    from daxos_spark.ml.contrib import _flatten_tree_with_cover, _interactions_one

    fact = matrix_ds.fact.select(
        "row_idx",
        F.array(*[F.col("features")[i] for i in [0, 1, 2, 3, 10, 11]]).alias("features"),
        "label",
    )
    model = fit_gbt(fact, GBTParams(eta=0.5, max_depth=3, n_boost_round=2, seed=3))
    flat = [_flatten_tree_with_cover(t._call_java("rootNode")) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]

    from daxos_spark.ml.contrib import _tree_base

    base = _tree_base(flat, weights)
    for row in fact.select("row_idx", "features").limit(3).collect():
        x = np.asarray(row["features"], dtype=np.float64)
        got = _interactions_one(x, flat, weights, 6)
        # full (p+1)² xgboost pred_interactions layout: top-left p×p is
        # the Lundberg interaction index, the bias row/column off-
        # diagonals are exactly 0 (conditional TreeSHAP never touches
        # the bias cell), and [p][p] is the expected margin v(∅)
        want = np.zeros((7, 7))
        for (t, cov), w in zip(flat, weights):
            want[:6, :6] += w * _brute_shapley_interactions(t, cov, x, 6)
        want[6, 6] = base
        assert got.shape == (7, 7)
        assert np.allclose(got, want, atol=1e-9), (got, want)
        # symmetry of the full tensor, bias row/col included
        assert np.allclose(got, got.T, atol=1e-9)
        assert np.all(got[6, :6] == 0.0) and np.all(got[:6, 6] == 0.0)


def test_shap_interactions_distributed_additivity(spark, matrix_ds):
    from daxos_spark.ml.contrib import tree_shap_interactions, tree_shap_values

    fact = matrix_ds.fact
    model = fit_gbt(fact, GBTParams(eta=0.3, max_depth=3, n_boost_round=3, seed=7))
    inter = tree_shap_interactions(model, fact.limit(10))
    shap = {r["row_idx"]: r for r in tree_shap_values(model, fact.limit(10)).collect()}
    for r in inter.collect():
        m = np.asarray(r["inter"])
        s = shap[r["row_idx"]]
        # whole matrix sums to the margin; each feature row to its shap
        assert abs(m.sum() - s["margin"]) < 1e-9
        assert abs(r["margin"] - s["margin"]) < 1e-9
        for i, phi_i in enumerate(s["shap"]):
            assert abs(m[i].sum() - phi_i) < 1e-9
        assert abs(m[-1, -1] - s["base"]) < 1e-9


def test_treeshap_additivity_distributed(spark, matrix_ds):
    from daxos_spark.ml.contrib import tree_shap_values
    from daxos_spark.ml.train import predict_gbt

    fact = matrix_ds.fact
    model = fit_gbt(fact, GBTParams(eta=0.3, max_depth=3, n_boost_round=5, seed=7))
    shap = tree_shap_values(model, fact.limit(40))
    preds = {r["row_idx"]: r["y_pred"] for r in predict_gbt(model, fact).collect()}
    for r in shap.collect():
        assert abs(r["base"] + sum(r["shap"]) - r["margin"]) < 1e-9
        expect_prob = 1.0 / (1.0 + math.exp(-2.0 * r["margin"]))
        assert abs(preds[r["row_idx"]] - expect_prob) < 1e-6


# ---------------------------------------------------------------------------
# Categorical splits in the walk (VectorIndexer marks low-cardinality
# dims nominal -> MLlib emits CategoricalSplit nodes)


@pytest.fixture(scope="module")
def categorical_model(spark):
    import numpy as np
    import pandas as pd
    from pyspark.ml.feature import VectorIndexer
    from pyspark.ml.functions import vector_to_array

    rng = np.random.RandomState(11)
    n = 400
    cat = rng.randint(0, 3, n)  # 3-valued nominal feature
    cont = rng.randn(n)
    # label depends on category membership {0,2} and the continuous dim
    y = ((np.isin(cat, [0, 2]) & (cont > 0)) | (cat == 1) & (cont < -0.5)).astype(float)
    pdf = pd.DataFrame(
        {"row_idx": range(n), "f0": cat.astype(float), "f1": cont, "label": y}
    )
    df = spark.createDataFrame(pdf).select(
        "row_idx", F.array("f0", "f1").alias("features"), "label"
    )
    from pyspark.ml.functions import array_to_vector

    vec = df.withColumn("fv", array_to_vector("features"))
    idx = VectorIndexer(inputCol="fv", outputCol="fi", maxCategories=4).fit(vec)
    # keep the indexed VECTOR column: its nominal-attribute metadata is
    # what makes MLlib emit CategoricalSplit nodes (vector_to_array
    # would strip it)
    indexed = idx.transform(vec).select("row_idx", F.col("fi").alias("features"), "label")
    model = fit_gbt(indexed, GBTParams(eta=0.3, max_depth=3, n_boost_round=4, seed=5))
    # the walk consumes plain arrays; metadata no longer matters here
    arr = idx.transform(vec).select(
        "row_idx", vector_to_array("fi").alias("features"), "label"
    )
    return model, arr


def test_categorical_split_present(categorical_model):
    from daxos_spark.ml.contrib import extract_trees

    model, _ = categorical_model
    trees, _ = extract_trees(model)  # must not raise
    assert any(t.cats is not None for t in trees), "fixture produced no categorical split"


def test_categorical_contributions_additive_and_match_margin(spark, categorical_model):
    import math

    from daxos_spark.ml.train import predict_gbt

    model, indexed = categorical_model
    contribs = tree_contributions(model, indexed)
    preds = {r["row_idx"]: r["y_pred"] for r in predict_gbt(model, indexed).collect()}
    for r in contribs.collect()[:60]:
        assert abs(r["bias"] + sum(r["contribs"]) - r["margin"]) < 1e-9
        expect = 1.0 / (1.0 + math.exp(-2.0 * r["margin"]))
        assert abs(preds[r["row_idx"]] - expect) < 1e-6


def test_categorical_treeshap_additivity(spark, categorical_model):
    from daxos_spark.ml.contrib import tree_shap_values

    model, indexed = categorical_model
    shap = tree_shap_values(model, indexed.limit(30))
    for r in shap.collect():
        assert abs(r["base"] + sum(r["shap"]) - r["margin"]) < 1e-9
