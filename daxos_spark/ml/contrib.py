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
    thr: np.ndarray  # float64 split thresholds (continuous nodes)
    left: np.ndarray  # int32 child index
    right: np.ndarray  # int32 child index
    pred: np.ndarray  # float64 node mean prediction
    # left-branch category sets for categorical splits, node-indexed
    # (None entry = continuous node). `goes_left` is the single
    # branching rule every walk below uses, so both split kinds share
    # one code path.
    cats: list | None = None

    def goes_left(self, node: int, xval: float) -> bool:
        if self.cats is not None and self.cats[node] is not None:
            return xval in self.cats[node]
        return xval <= self.thr[node]


def _flatten_tree(java_root) -> FlatTree:
    feat: list[int] = []
    thr: list[float] = []
    left: list[int] = []
    right: list[int] = []
    pred: list[float] = []
    cats: list = []

    def rec(node) -> int:
        idx = len(feat)
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        pred.append(float(node.prediction()))
        cats.append(None)
        if node.getClass().getSimpleName() == "InternalNode":
            split = node.split()
            feat[idx] = int(split.featureIndex())
            if split.getClass().getSimpleName() == "ContinuousSplit":
                thr[idx] = float(split.threshold())
            else:  # CategoricalSplit: membership in leftCategories
                cats[idx] = frozenset(
                    float(c) for c in split.leftCategories()
                )
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
        cats if any(c is not None for c in cats) else None,
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
        if tree.cats is None:
            go_left = X[rows, f] <= tree.thr[node]
        else:
            # mixed split kinds: branch per unique frontier node (trees
            # are depth-bounded, so the unique set is tiny)
            go_left = np.empty(len(rows), dtype=bool)
            for nd in np.unique(node):
                sel = node == nd
                fx = X[rows[sel], tree.feat[nd]]
                if tree.cats[nd] is not None:
                    go_left[sel] = np.isin(fx, np.asarray(sorted(tree.cats[nd])))
                else:
                    go_left[sel] = fx <= tree.thr[nd]
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
    trees, weights = extract_trees(model)
    return tree_contributions_from_flat(df, trees, weights, id_col, features_col)


def tree_contributions_from_flat(
    df: DataFrame,
    trees: list,
    weights: list[float],
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """`tree_contributions` over prebuilt FlatTrees — the seam that lets
    an explicitly-specified tree run through the real distributed Saabas
    walk; `a2_saabas_fixed` uses it against a closed-form path-delta SQL
    oracle."""
    import pandas as pd

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


# ---------------------------------------------------------------------------
# Exact TreeSHAP (Lundberg, Erion & Lee '18, Algorithm 2) — T5-grade
# explanation: Shapley values of the conditional-expectation tree game,
# O(L·D²) per instance per tree instead of exponential. Requires node
# covers (training-sample counts), which MLlib exposes via
# impurityStats; contributions sum exactly to margin(x) − E[margin]
# (verified against brute-force Shapley enumeration in tests).


def _flatten_tree_with_cover(java_root) -> tuple[FlatTree, np.ndarray]:
    ft = _flatten_tree(java_root)
    cover = np.zeros(len(ft.feat), dtype=np.float64)
    idx_ref = [0]  # pre-order counter, same traversal as _flatten_tree

    def rec(node):
        idx = idx_ref[0]
        idx_ref[0] += 1
        cover[idx] = float(node.impurityStats().count())
        if node.getClass().getSimpleName() == "InternalNode":
            rec(node.leftChild())
            rec(node.rightChild())

    rec(java_root)
    return ft, cover


def _shap_one_tree(
    x: np.ndarray,
    t: FlatTree,
    cover: np.ndarray,
    phi: np.ndarray,
    scale: float,
    condition: int = 0,
    condition_feature: int = -1,
) -> None:
    """Per-instance TreeSHAP recursion (path entries: [d, z, o, w]).

    ``condition`` = 0 is plain TreeSHAP. ±1 computes SHAP values of the
    sub-game with ``condition_feature`` fixed present (+1: the tree is
    walked down x's branch at every split on it) or absent (−1: splits
    on it are cover-weighted), the conditioning runs interaction values
    are built from (Lundberg '18 §4; xgboost pred_interactions). The
    conditioned feature never enters the path, so its own phi stays 0.
    """

    def extend(m, pz, po, pi):
        m = [row[:] for row in m]
        l = len(m)
        m.append([pi, pz, po, 1.0 if l == 0 else 0.0])
        for j in range(l - 1, -1, -1):
            m[j + 1][3] += po * m[j][3] * (j + 1) / (l + 1)
            m[j][3] = pz * m[j][3] * (l - j) / (l + 1)
        return m

    def unwound_sum(m, i):
        ud = len(m) - 1
        one, zero = m[i][2], m[i][1]
        total = 0.0
        next_one = m[ud][3]
        for j in range(ud - 1, -1, -1):
            if one != 0:
                tmp = next_one * (ud + 1) / ((j + 1) * one)
                total += tmp
                next_one = m[j][3] - tmp * zero * (ud - j) / (ud + 1)
            else:
                total += m[j][3] / (zero * (ud - j) / (ud + 1))
        return total

    def unwind(m, i):
        ud = len(m) - 1
        m = [row[:] for row in m]
        one, zero = m[i][2], m[i][1]
        next_one = m[ud][3]
        for j in range(ud - 1, -1, -1):
            if one != 0:
                tmp = m[j][3]
                m[j][3] = next_one * (ud + 1) / ((j + 1) * one)
                next_one = tmp - m[j][3] * zero * (ud - j) / (ud + 1)
            else:
                m[j][3] = m[j][3] * (ud + 1) / (zero * (ud - j))
        for j in range(i, ud):
            m[j][0], m[j][1], m[j][2] = m[j + 1][0], m[j + 1][1], m[j + 1][2]
        return m[:-1]

    def recurse(node, m, pz, po, pi, cf):
        if cf == 0.0:
            return
        # the conditioned feature is not a player: never extend on it
        if condition == 0 or pi != condition_feature:
            m = extend(m, pz, po, pi)
        if t.feat[node] < 0:
            for i in range(1, len(m)):
                w = unwound_sum(m, i)
                phi[m[i][0]] += w * (m[i][2] - m[i][1]) * t.pred[node] * scale * cf
            return
        f = int(t.feat[node])
        if t.goes_left(node, x[f]):
            hot, cold = int(t.left[node]), int(t.right[node])
        else:
            hot, cold = int(t.right[node]), int(t.left[node])
        iz = io = 1.0
        k = next((i for i in range(1, len(m)) if m[i][0] == f), None)
        if k is not None:
            iz, io = m[k][1], m[k][2]
            m = unwind(m, k)
        hot_cf = cold_cf = cf
        if condition > 0 and f == condition_feature:
            cold_cf = 0.0  # present: only x's branch survives, unweighted
        elif condition < 0 and f == condition_feature:
            hot_cf = cf * cover[hot] / cover[node]  # absent: cover-mix
            cold_cf = cf * cover[cold] / cover[node]
        recurse(hot, m, iz * cover[hot] / cover[node], io, f, hot_cf)
        recurse(cold, m, iz * cover[cold] / cover[node], 0.0, f, cold_cf)

    recurse(0, [], 1.0, 1.0, -1, 1.0)


def tree_shap_values(
    model,
    df: DataFrame,
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """Exact SHAP values per row: (id, base, margin, shap[p]).

    base = E[margin] over the training distribution (cover-weighted);
    base + sum(shap) == margin(x) exactly. Same broadcast-trees +
    mapInPandas distributed shape as tree_contributions; per-row cost
    is O(trees · leaves · depth²) in pure numpy/python, so prefer
    tree_contributions (Saabas) when approximate attributions suffice.
    """
    flat = [_flatten_tree_with_cover(t._call_java("rootNode")) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]
    return tree_shap_values_from_flat(df, flat, weights, id_col, features_col)


def tree_shap_values_from_flat(
    df: DataFrame,
    flat: list,
    weights: list[float],
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """`tree_shap_values` over prebuilt (FlatTree, cover) pairs — the
    seam that lets an explicitly-specified tree (no MLlib training) run
    through the exact same distributed TreeSHAP path; `a2_treeshap_fixed`
    uses it to hash-verify the algorithm against a closed-form SQL
    oracle."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    b = sc.broadcast((flat, weights))

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("base", DoubleType()),
            StructField("margin", DoubleType()),
            StructField("shap", ArrayType(DoubleType())),
        ]
    )

    def compute(batches):
        flat_b, weights_b = b.value
        base = float(
            sum(
                w * float(np.sum(np.where(t.feat < 0, t.pred * cov, 0.0)) / cov[0])
                for (t, cov), w in zip(flat_b, weights_b)
            )
        )
        for pdf in batches:
            X = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            out = np.zeros_like(X)
            for r in range(len(X)):
                for (t, cov), w in zip(flat_b, weights_b):
                    _shap_one_tree(X[r], t, cov, out[r], w)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "base": base,
                    "margin": base + out.sum(axis=1),
                    "shap": list(out),
                }
            )

    return df.select(id_col, features_col).mapInPandas(compute, out_schema)


# ---------------------------------------------------------------------------
# SHAP interaction values (reference daxos/explain.py:95-99:
# ``pred_interactions=True`` → n×(p+1)² tensor). Lundberg '18 §4
# semantics with xgboost's exact pred_interactions bookkeeping
# (xgboost cpu_predictor PredictInteractionContributions), brute-force-
# verified over the full (p+1)² layout (tests/test_contrib.py): for
# each index i in 0..p — INCLUDING the bias index p — run conditional
# TreeSHAP with i present (+1) and absent (−1); row i's off-diagonal
# cells are half the difference (the bias column k=p included: the
# conditional runs never touch the bias cell, so those terms compute to
# exactly 0, as in xgboost), and the diagonal is the unconditional
# value minus the row's off-diagonal sum (diag = [phi…, E[f]]).
# Conditioning on the bias index never matches a split, so row p's
# off-diagonals are identically 0 and [p][p] = E[f]. Identities: row i
# sums to shap_i, row p to the base, the whole matrix to margin(x).
# The one delta vs xgboost output: xgboost adds its base_score /
# base_margin into [p][p]; MLlib GBT margins carry no such offset, so
# [p][p] here is the cover-weighted expected margin alone.


def _tree_base(flat, weights) -> float:
    """Cover-weighted expected margin of the ensemble (E[f])."""
    return float(
        sum(
            w * float(np.sum(np.where(t.feat < 0, t.pred * cov, 0.0)) / cov[0])
            for (t, cov), w in zip(flat, weights)
        )
    )


def _used_features(flat) -> list[int]:
    """Features actually split on anywhere in the ensemble —
    instance-independent, so hoisted out of the per-row loop."""
    return sorted({int(f) for t, _ in flat for f in t.feat[t.feat >= 0]})


def _interactions_one(
    x: np.ndarray, flat, weights, p: int, used=None, base=None
) -> np.ndarray:
    """(p+1)×(p+1) SHAP interaction matrix for one instance, xgboost
    ``pred_interactions`` bookkeeping (row-major conditioning over every
    index including the bias row p; diagonal = unconditional − row sum).

    ``used``/``base`` are instance-independent; callers iterating many
    rows should precompute them once (``_used_features``/``_tree_base``).
    Conditioning on a feature with no split anywhere in the ensemble
    yields on == off (a zero row and a phi_i == 0 diagonal), so the loop
    skips unused features — identical output, ~|used|/p of the cost.
    """
    if used is None:
        used = _used_features(flat)
    if base is None:
        base = _tree_base(flat, weights)
    # unconditional diag vector: [phi_0 … phi_{p-1}, E[f]] — the row
    # totals each row of the tensor must sum back to
    diag = np.zeros(p + 1)
    for (t, cov), w in zip(flat, weights):
        _shap_one_tree(x, t, cov, diag, w)
    diag[p] = base
    out = np.zeros((p + 1, p + 1))
    for i in used:
        # length p+1: the conditional recursions never write the bias
        # cell, so the (on_base − off_base)/2 column terms are computed
        # literally and come out exactly 0 (xgboost's layout)
        on = np.zeros(p + 1)
        off = np.zeros(p + 1)
        for (t, cov), w in zip(flat, weights):
            _shap_one_tree(x, t, cov, on, w, condition=1, condition_feature=i)
            _shap_one_tree(x, t, cov, off, w, condition=-1, condition_feature=i)
        d = (on - off) / 2.0
        d[i] = 0.0
        out[i, :] = d
        # diagonal: whatever the off-diagonals (bias column included)
        # leave of the unconditional value
        out[i, i] = diag[i] - d.sum()
    # bias row (i = p): no split anywhere references feature p, so the
    # two conditional ensemble passes are provably identical (on == off,
    # d == 0) — fill the known result analytically instead of paying two
    # ensemble recursions for a constant: off-diagonals 0, diagonal =
    # diag[p] = E[f]. Bitwise identical to the looped computation.
    out[p, p] = diag[p]
    # unused features: zero row, diagonal = phi_i = 0 (already zeros)
    return out


def tree_shap_interactions(
    model,
    df: DataFrame,
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """Exact SHAP interaction values per row: (id, margin, inter[(p+1)²]).

    ``inter`` is the row-major (p+1)×(p+1) matrix as array<array<double>>
    (the S15 tensor sink twin — parquet-writable as-is). Row i sums to
    shap_i; the full matrix sums to margin(x). Same broadcast-flat-trees
    mapInPandas shape as tree_shap_values; per-row cost is ~2p× a plain
    TreeSHAP run, so slice rows (and prune columns first, reference
    scripts/refit.py:62-67) before calling at scale.
    """
    flat = [_flatten_tree_with_cover(t._call_java("rootNode")) for t in model.trees]
    weights = [float(w) for w in model.treeWeights]
    return tree_shap_interactions_from_flat(df, flat, weights, id_col, features_col)


def tree_shap_interactions_from_flat(
    df: DataFrame,
    flat,
    weights,
    id_col: str = "row_idx",
    features_col: str = "features",
) -> DataFrame:
    """``tree_shap_interactions`` over pre-flattened ``(FlatTree, cover)``
    pairs — the seam fixed-tree oracle queries drive directly."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    b = sc.broadcast((flat, weights))

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("margin", DoubleType()),
            StructField("inter", ArrayType(ArrayType(DoubleType()))),
        ]
    )

    def compute(batches):
        flat_b, weights_b = b.value
        used = _used_features(flat_b)
        base = _tree_base(flat_b, weights_b)
        for pdf in batches:
            X = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            p = X.shape[1]
            mats = [
                _interactions_one(X[r], flat_b, weights_b, p, used, base)
                for r in range(len(X))
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "margin": [float(m.sum()) for m in mats],
                    "inter": [[row.tolist() for row in m] for m in mats],
                }
            )

    return df.select(id_col, features_col).mapInPandas(compute, out_schema)
