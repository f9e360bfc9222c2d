"""Residualization vs numpy closed-form oracle (reference
tests/test_deconfound.py scope, tightened per SURVEY §5: numeric
equivalence, not just shapes)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _collect_xy(fact, cov_cols):
    rows = fact.orderBy("row_idx").collect()
    X = np.array([r["features"] for r in rows], dtype=np.float64)
    C = np.column_stack(
        [np.ones(len(rows)), *[np.array([r[c] for r in rows], dtype=np.float64) for c in cov_cols]]
    )
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    return X, C, y


def test_betas_match_numpy_lstsq(spark, matrix_ds, covars_path):
    from daxos_spark.ml.deconfound import align_covars, compute_beta_matrix
    from daxos_spark.sources.tables import read_covars

    cov = read_covars(spark, covars_path)
    joined = align_covars(matrix_ds.fact, cov).persist()
    cov_cols = ["COV1", "COV2", "COV3"]
    betas = compute_beta_matrix(joined, cov_cols)

    X, C, _ = _collect_xy(joined, cov_cols)
    expected, *_ = np.linalg.lstsq(C, X, rcond=None)
    assert betas.shape == (4, X.shape[1])
    np.testing.assert_allclose(betas, expected, rtol=1e-8, atol=1e-10)


def test_residuals_match_numpy(spark, matrix_ds, covars_path):
    from daxos_spark.ml.deconfound import (
        align_covars,
        compute_beta_matrix,
        residualize_features,
    )
    from daxos_spark.sources.tables import read_covars

    cov = read_covars(spark, covars_path)
    joined = align_covars(matrix_ds.fact, cov).persist()
    cov_cols = ["COV1", "COV2", "COV3"]
    betas = compute_beta_matrix(joined, cov_cols)
    adj = residualize_features(joined, cov_cols, betas)

    X, C, _ = _collect_xy(joined, cov_cols)
    expected = (X - C @ betas).astype(np.float32)
    got = np.array(
        [r["features_adj"] for r in adj.orderBy("row_idx").collect()], dtype=np.float32
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    # residuals are orthogonal to covariates (OLS property)
    np.testing.assert_allclose(C.T @ expected, np.zeros((4, X.shape[1])), atol=1e-2)


def test_label_residual_and_standardize(spark, matrix_ds, covars_path):
    from daxos_spark.ml.deconfound import (
        align_covars,
        label_betas,
        residualize_label,
        standardize_covars,
    )
    from daxos_spark.sources.tables import read_covars

    cov = read_covars(spark, covars_path)
    joined = align_covars(matrix_ds.fact, cov)
    cov_cols = ["COV1", "COV2", "COV3"]

    std, stats = standardize_covars(joined, cov_cols)
    for c in cov_cols:
        m = std.agg(F.avg(c), F.stddev_pop(c)).collect()[0]
        assert abs(m[0]) < 1e-9 and abs(m[1] - 1.0) < 1e-6

    # test split reuses train stats (M5 contract)
    std2, stats2 = standardize_covars(joined, cov_cols, stats)
    assert stats2 == stats

    yb = label_betas(joined, cov_cols)
    out = residualize_label(joined, cov_cols, yb)
    _, C, y = _collect_xy(joined, cov_cols)
    expected = y - C @ yb
    got = np.array([r["label_adj"] for r in out.orderBy("row_idx").collect()])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_full_deconfound_pipeline(spark, matrix_ds, covars_path):
    from daxos_spark.ml.deconfound import deconfound
    from daxos_spark.sources.tables import read_covars

    cov = read_covars(spark, covars_path)
    out, stats, fb, yb = deconfound(matrix_ds.fact, cov)
    assert "features_adj" in out.columns and "label_adj" in out.columns
    assert out.count() == matrix_ds.fact.count()
    assert fb.shape == (4, matrix_ds.n_features) and yb.shape == (4,)
