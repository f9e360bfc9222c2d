"""Splits & sampling — the exchange surface (SURVEY §2.8, X1-X5).

Reference: daxos/crossvalidate.py:350-395 (chunk-aligned k-fold and
train/test splits — deterministic functions of the chunk layout, valid
because data is pre-shuffled at rest, O2) and
workflows/preprocessing/scripts/split_ids.py:46-62 (seeded ID split).

Spark-first: every split is a pure function of ``row_idx`` (no runtime
shuffle, no RNG at split time — bit-for-bit reproducible), mirroring the
reference's design but expressed as fold columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_id(row_idx: Column, row_chunks: int) -> Column:
    return F.floor(row_idx / F.lit(row_chunks))


def with_fold_column(
    fact: DataFrame,
    n_folds: int,
    row_chunks: int = 100,
    fold_col: str = "fold",
) -> DataFrame:
    """X1 chunk-aligned k-fold (crossvalidate.py:364-395): whole chunks
    are assigned round-robin to folds — fold = chunk_id % n_folds.

    (The reference assigns contiguous chunk *ranges*; round-robin keeps
    the same chunk-alignment guarantee with better size balance and
    stays a pure row_idx function.)
    """
    return fact.withColumn(
        fold_col, F.pmod(chunk_id(F.col("row_idx"), row_chunks), F.lit(n_folds)).cast("int")
    )


def chunked_train_test_split(
    fact: DataFrame,
    train_size: float = 0.8,
    row_chunks: int = 100,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """X2 chunk-aligned train/test (crossvalidate.py:350-361): a seeded
    hash of the chunk id selects whole chunks for train. Deterministic,
    no sampling action, no shuffle."""
    cid = chunk_id(F.col("row_idx"), row_chunks)
    # xxhash64 of (chunk_id, seed) → uniform in [0,1)
    u = (F.pmod(F.xxhash64(cid, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
    train = fact.filter(u < train_size)
    test = fact.filter(u >= train_size)
    return train, test


def seeded_id_split(
    fact: DataFrame,
    train_frac: float = 0.8,
    seed: int = 42,
    id_col: str = "iid",
) -> tuple[DataFrame, DataFrame]:
    """X3 seeded ID-level split (split_ids.py:46-62): hash of the ID
    itself, so membership is stable under any row reordering; the
    complement is the exact anti-set (disjointness by construction)."""
    u = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    return fact.filter(u < train_frac), fact.filter(u >= train_frac)


def random_row_subsample(fact: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """X5 row-level random subsample (boruta.py:86-91) — seeded hash of
    row_idx (deterministic under recomputation, unlike df.sample)."""
    u = F.pmod(F.xxhash64(F.col("row_idx"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    return fact.filter(u < fraction)
