"""Boruta feature selection — T12 (reference daxos/boruta.py:14-202).

Loop (boruta.py:14-76): add column-shuffled "shadow" copies of every
feature, train, collect importances, compare each real feature against
the shadow-importance percentile, accumulate hits, accept/reject via
binomial tests with FDR correction (boruta.py:127-179).

Spark-first pieces:
  - shadow columns: per-partition numpy permutation inside one
    mapInPandas pass (valid as a global permutation approximation
    because the fact table is pre-shuffled at rest — the same O2
    contract the reference's chunk-aligned splits rely on; SURVEY §7.2
    "per-column shadow shuffle").
  - training/importances: MLlib GBT (train.py) — importances are
    impurity-gain (the reference default importance='gain' analogue,
    boruta.py:98-104).
  - statistics: p-length vectors on the driver (as in the reference) —
    exact binomial sf/cdf via math.comb (scipy-free) and
    Benjamini-Hochberg FDR (statsmodels-free).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .train import GBTParams, fit_gbt


def binom_sf(k: int, n: int, p: float) -> float:
    """P(X > k) for X~Binom(n,p) — exact, scipy-free."""
    return sum(math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k + 1, n + 1))


def binom_cdf(k: int, n: int, p: float) -> float:
    return sum(math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(0, k + 1))


def fdr_bh(pvals: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted p-values (boruta.py:159-179)."""
    n = len(pvals)
    order = np.argsort(pvals)
    ranked = pvals[order] * n / (np.arange(n) + 1)
    # monotone from the largest rank down
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.clip(adj, 0, 1)
    return out


def add_shadow_features(
    fact: DataFrame, features_col: str = "features", seed: int = 42
) -> DataFrame:
    """Append per-column-shuffled shadow copies: features ++ shadows
    (boruta.py:181-202 create_shadow). Permutes each column
    independently within Arrow batches."""
    schema = ", ".join(f"{n} {t}" for n, t in fact.dtypes)

    def shadow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        # partition-distinct RNG streams: batch indexes always restart
        # at 0 in mapInPandas, so seeding from pdf.index would give every
        # partition the identical permutation pattern
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        for bi, pdf in enumerate(batches):
            if len(pdf) == 0:
                yield pdf
                continue
            X = np.stack(pdf[features_col].to_numpy())
            rng = np.random.RandomState((seed + pid * 100003 + bi * 7919) % (2**31 - 1))
            shadows = np.empty_like(X)
            for j in range(X.shape[1]):
                shadows[:, j] = X[rng.permutation(len(X)), j]
            out = pdf.copy()
            out[features_col] = list(np.hstack([X, shadows]).astype(np.float32))
            yield out

    return fact.mapInPandas(shadow, schema=schema)


@dataclass
class BorutaResult:
    accepted: list[str]
    rejected: list[str]
    tentative: list[str]
    hits: np.ndarray
    importance_history: np.ndarray  # (iters, p)


def boruta(
    fact: DataFrame,
    feature_names: list[str],
    params: GBTParams,
    max_iter: int = 10,
    percentile: float = 100.0,
    alpha: float = 0.05,
    sample_fraction: float = 1.0,
    seed: int = 42,
    features_col: str = "features",
    label_col: str = "label",
) -> BorutaResult:
    """T12 main loop (boruta.py:14-76)."""
    from ..operators.splits import random_row_subsample

    p = len(feature_names)
    hits = np.zeros(p, dtype=int)
    history = np.full((max_iter, p), np.nan)

    for it in range(max_iter):
        sub = fact if sample_fraction >= 1.0 else random_row_subsample(fact, sample_fraction, seed + it)
        shadowed = add_shadow_features(sub, features_col, seed=seed * 1000 + it)
        model = fit_gbt(shadowed, params, features_col, label_col)
        imp = model.featureImportances.toArray()
        real, shadow = imp[:p], imp[p : 2 * p]
        thr = np.percentile(shadow, percentile)
        hits += (real > thr).astype(int)
        history[it] = real

    n = max_iter
    # two-sided binomial decision (boruta.py:134-157 assign_hits/test_features)
    p_accept = np.array([binom_sf(h - 1, n, 0.5) for h in hits])  # P(X >= h)
    p_reject = np.array([binom_cdf(h, n, 0.5) for h in hits])  # P(X <= h)
    acc_adj = fdr_bh(p_accept)
    rej_adj = fdr_bh(p_reject)

    accepted = [feature_names[j] for j in range(p) if acc_adj[j] < alpha]
    rejected = [feature_names[j] for j in range(p) if rej_adj[j] < alpha and feature_names[j] not in accepted]
    tentative = [f for f in feature_names if f not in accepted and f not in rejected]
    return BorutaResult(accepted, rejected, tentative, hits, history)
