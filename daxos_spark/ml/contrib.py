"""Per-feature prediction contributions for MLlib GBT models — the
T4/T5 SHAP surface (reference daxos/explain.py:71-99 pred_contribs /
pred_interactions via xgboost).

MLlib has no pred_contribs, so this computes Saabas path contributions
(Saabas '14; the treeinterpreter decomposition — the same quantity
xgboost's ``approx_contribs`` returns): walking a sample down each
tree, every split on feature f moves the node mean prediction by some
delta, and that delta is attributed to f. Exactly additive:

    margin(x) = Σ_trees w_t · root_pred_t  (bias)
              + Σ_features contrib_f(x)

Distributed shape — identical to the reference's broadcast-booster
plan (explain.py:65-75): the flattened tree arrays broadcast to every
executor, and an Arrow-batched ``mapInPandas`` walks whole batches
down the trees with vectorized numpy (no per-row Python).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


@dataclass
class FlatTree:
    """One decision tree as parallel arrays (node-indexed)."""

    feat: np.ndarray  # int32, -1 at leaves
    thr: np.ndarray  # float64 split thresholds
    left: np.ndarray  # int32 child index
    right: np.ndarray  # int32 child index
    pred: np.ndarray  # float64 node mean prediction


def _flatten_tree(java_root) -> FlatTree:
    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    pred: list[float] = []

    def rec(node) -> int:
        idx = len(feat)
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        pred.append(float(node.prediction()))
        if node.getClass().getSimpleName() == "InternalNode":
            split = node.split()
            if split.getClass().getSimpleName() != "ContinuousSplit":
                raise NotImplementedError(
                    "categorical splits not supported in contribution walk"
                )
            feat[idx] = int(split.featureIndex())
            thr[idx] = float(split.threshold())
            left[idx] = rec(node.leftChild())
            right[idx] = rec(node.rightChild())
        return idx

    rec(java_root)
    return FlatTree(
        np.asarray(feat, dtype=np.int32),
        np.asarray(thr, dtype=np.float64),
        np.asarray(left, dtype=np.int32),
        np.asarray(right, dtype=np.int32),
        np.asarray(pred, dtype=np.float64),
    )


def extract_trees(model) -> tuple[list[FlatTree], list[float]]:
    """Pull every tree of a GBT/RF model into numpy arrays (driver-side,
    O(total nodes) — small; the fact data never comes here)."""
    trees = [_flatten_tree(t._call_java("rootNode")) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]
    return trees, weights


def _walk_batch(X: np.ndarray, tree: FlatTree, w: float, contrib: np.ndarray) -> None:
    """Vectorized descent of all rows of X down one tree, accumulating
    weighted prediction deltas onto contrib (n × p), in place."""
    cur = np.zeros(len(X), dtype=np.int64)
    while True:
        mask = tree.feat[cur] >= 0
        if not mask.any():
            break
        rows = np.nonzero(mask)[0]
        node = cur[rows]
        f = tree.feat[node]
        go_left = X[rows, f] <= tree.thr[node]
        child = np.where(go_left, tree.left[node], tree.right[node])
        np.add.at(contrib, (rows, f), w * (tree.pred[child] - tree.pred[node]))
        cur[rows] = child


def tree_contributions(
    model,
    df: DataFrame,
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """Per-row additive contributions: (id, bias, margin, contribs[p]).

    margin == bias + sum(contribs) == the model's raw GBT margin
    (probability = sigmoid(2·margin) for GBTClassifier).
    """
    import pandas as pd

    trees, weights = extract_trees(model)
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((trees, weights))

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("bias", DoubleType()),
            StructField("margin", DoubleType()),
            StructField("contribs", ArrayType(DoubleType())),
        ]
    )

    def compute(batches):
        trees_b, weights_b = b.value
        bias = float(sum(w * t.pred[0] for t, w in zip(trees_b, weights_b)))
        for pdf in batches:
            X = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            contrib = np.zeros_like(X)
            for t, w in zip(trees_b, weights_b):
                _walk_batch(X, t, w, contrib)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "bias": bias,
                    "margin": bias + contrib.sum(axis=1),
                    "contribs": list(contrib),
                }
            )

    return df.select(id_col, features_col).mapInPandas(compute, out_schema)


def mean_abs_contributions(contribs: DataFrame) -> DataFrame:
    """A3 (explain.py:76): mean |contribution| per feature position —
    posexplode + one shuffle on pos."""
    return (
        contribs.select(F.posexplode("contribs").alias("pos", "c"))
        .groupBy("pos")
        .agg(F.avg(F.abs(F.col("c"))).alias("mean_abs_contrib"))
        .orderBy("pos")
    )
