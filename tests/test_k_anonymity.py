"""q_k_anonymity: exact pandas replay of the quasi-identifier audit."""

from __future__ import annotations

import math

import pandas as pd

from daxos_spark.plans.diagnostics import _KANON_K, q_k_anonymity

SF_DIR = "/root/testdata/sf0.001"


def test_k_anonymity_matches_pandas(spark):
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    c = c.assign(band=[int(math.floor(float(b) / 1000.0)) for b in c["c_acctbal"]])
    sizes = c.groupby(["c_mktsegment", "c_nationkey", "band"]).size()
    got = {r["seg"]: r for r in q_k_anonymity(spark, SF_DIR).collect()}
    for seg, grp in sizes.groupby(level=0):
        g = got[seg]
        small = grp[grp < _KANON_K]
        assert g["n_classes"] == len(grp), seg
        assert g["n_small_classes"] == len(small), seg
        assert g["n_records"] == int(grp.sum()), seg
        assert g["records_at_risk"] == int(small.sum()), seg
        assert g["min_class_size"] == int(grp.min()), seg
        assert abs(g["risk_fraction"] - small.sum() / grp.sum()) < 2e-6, seg
    assert set(got) == set(sizes.index.get_level_values(0))
