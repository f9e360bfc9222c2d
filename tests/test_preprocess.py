"""End-to-end preprocessing pipeline: bronze → silver → gold."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from daxos_spark.preprocess import run_preprocessing
from daxos_spark.sources.plink import read_matrix


def test_full_pipeline(spark, plink_raw_path, covars_path, tmp_path):
    raw, X, y, snps = plink_raw_path
    res = run_preprocessing(spark, raw, covars_path, str(tmp_path / "lake"), seed=42)

    assert res.n_total == len(X)
    assert res.n_train + res.n_test == res.n_total
    assert 0 < res.n_test < res.n_train  # 80/20-ish
    assert res.n_features == X.shape[1]

    train = read_matrix(spark, res.train_gold)
    test = read_matrix(spark, res.test_gold)

    # disjoint ID sets
    tr_ids = {r["iid"] for r in train.fact.select("iid").collect()}
    te_ids = {r["iid"] for r in test.fact.select("iid").collect()}
    assert not (tr_ids & te_ids)

    # adjusted twins present with the right shapes
    row = train.fact.select("features", "features_adj", "label", "label_adj").first()
    assert len(row["features_adj"]) == len(row["features"]) == X.shape[1]

    # residual orthogonality: per-covariate correlation with label_adj
    # on train should be ~0 (that's what residualizing achieves)
    from daxos_spark.ml.deconfound import align_covars
    from daxos_spark.sources.tables import read_covars

    covars = read_covars(spark, covars_path)
    j = align_covars(train.fact, covars)
    for c in ("COV1", "COV2", "COV3"):
        corr = j.agg(F.corr(c, "label_adj")).collect()[0][0]
        assert abs(corr) < 0.05, f"{c} correlation {corr}"

    # bronze is re-readable and shuffled (row_idx not in file order)
    bronze = read_matrix(spark, res.bronze)
    iids = [r["iid"] for r in bronze.fact.orderBy("row_idx").select("iid").collect()]
    assert iids != sorted(iids, key=lambda s: int(s[1:]))  # not ingest order
