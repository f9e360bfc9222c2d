"""GWAS allelic odds-ratio scan — statistical validation by simulation.

Mirrors the reference's own correctness strategy
(``examples/data/setup_data.py:122-165``): simulate case/control
genotypes with KNOWN per-SNP odds ratios, run the association scan, and
require the planted ORs back within tolerance while null SNPs stay
near 1. The reference plants ORs 3 and 5 and accepts ±0.5; same here.
"""

from __future__ import annotations

import numpy as np
import pytest

from daxos_spark.ml.gwas import allelic_odds_ratios


N, P = 8000, 8
PLANTED = {6: 3.0, 7: 5.0}  # SNP index -> allelic odds ratio
P0 = 0.25  # control alt-allele frequency


def _sim(seed: int = 11):
    """Half cases / half controls; dosage ~ Binomial(2, group freq)."""
    rng = np.random.RandomState(seed)
    y = np.repeat([0, 1], N // 2)
    X = np.empty((N, P), dtype=np.float32)
    for j in range(P):
        orr = PLANTED.get(j, 1.0)
        # case allele frequency from the OR algebra (odds scale)
        p1 = orr * P0 / (1 - P0 + orr * P0)
        freq = np.where(y == 1, p1, P0)
        X[:, j] = rng.binomial(2, freq)
    return X, y


@pytest.fixture(scope="module")
def or_rows(spark):
    X, y = _sim()
    rows = [(int(y[i]), [float(v) for v in X[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "label int, features array<float>")
    out = allelic_odds_ratios(df).orderBy("pos").collect()
    assert len(out) == P
    return out


def test_planted_ors_recovered(or_rows):
    for r in or_rows:
        expected = PLANTED.get(r["pos"], 1.0)
        assert r["odds_ratio"] == pytest.approx(expected, abs=0.5), r


def test_counts_exact_and_consistent(or_rows):
    for r in or_rows:
        assert r["n_case"] == N // 2 and r["n_ctrl"] == N // 2
        assert 0 <= r["case_alt"] <= 2 * r["n_case"]
        assert 0 <= r["ctrl_alt"] <= 2 * r["n_ctrl"]
        # Woolf SE present and small at this n
        assert 0 < r["log_or_se"] < 0.2


def test_matches_numpy_contingency(spark):
    X, y = _sim(seed=23)
    rows = [(int(y[i]), [float(v) for v in X[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "label int, features array<float>")
    got = {r["pos"]: r for r in allelic_odds_ratios(df).collect()}
    for j in range(P):
        a = float(X[y == 1, j].sum())
        c = float(X[y == 0, j].sum())
        b = 2 * (y == 1).sum() - a
        d = 2 * (y == 0).sum() - c
        assert got[j]["case_alt"] == a and got[j]["ctrl_alt"] == c
        assert got[j]["odds_ratio"] == pytest.approx((a * d) / (b * c), rel=1e-12)


def test_null_on_empty_cell(spark):
    # monomorphic SNP (all-zero dosage) -> NULL odds ratio, not a crash
    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (0, [0.0, 1.0]), (1, [0.0, 1.0]), (0, [0.0, 0.0])],
        "label int, features array<float>",
    )
    out = {r["pos"]: r for r in allelic_odds_ratios(df).collect()}
    assert out[0]["odds_ratio"] is None
    assert out[1]["odds_ratio"] is not None


def test_hwe_filter_matches_scipy_free_python(spark):
    """chi-square and pass flags vs a from-scratch replay of the HWE
    expectations on the same deterministic dosages."""
    from daxos_spark.plans.mlpipe import _HWE_CRIT, ml_hwe_filter

    rows = ml_hwe_filter(spark, "/root/testdata/sf0.001").collect()
    assert rows

    import pandas as pd

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    vec_ids = emb["vec_id"].to_numpy()
    for r in rows[:16]:
        dos = (vec_ids + 7 * r.pos) % 3
        n0, n1, n2 = int((dos == 0).sum()), int((dos == 1).sum()), int((dos == 2).sum())
        assert (r.n0, r.n1, r.n2) == (n0, n1, n2)
        n = n0 + n1 + n2
        p = (2 * n2 + n1) / (2 * n)
        e = [n * (1 - p) ** 2, n * 2 * p * (1 - p), n * p * p]
        chi2 = sum((o - ei) ** 2 / ei for o, ei in zip((n0, n1, n2), e))
        assert abs(r.chi2 - chi2) < 1e-5
        assert r.hwe_pass == int(chi2 <= _HWE_CRIT)
    assert len(rows) == dim


def test_gc_lambda_matches_python(spark):
    import numpy as np
    import pandas as pd

    from daxos_spark.plans.mlpipe import _GC_MEDIAN_1DF, ml_gc_lambda

    row = ml_gc_lambda(spark, "/root/testdata/sf0.001").collect()[0]

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    case = (emb["label"].to_numpy() >= 5).astype(int)
    chis = []
    for p in range(64):
        dos = (ids + 7 * p) % 3
        a = int(dos[case == 1].sum()); b = int((2 - dos)[case == 1].sum())
        c = int(dos[case == 0].sum()); d = int((2 - dos)[case == 0].sum())
        n = a + b + c + d
        chis.append(n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d)))
    med = float(np.median(chis))
    assert row.n_snps == 64
    assert abs(row.median_chi2 - med) < 1e-4
    assert abs(row.lambda_gc - med / _GC_MEDIAN_1DF) < 1e-3


def test_king_kinship_known_relationships(spark):
    """KING φ̂ on constructed genotypes with known relatedness: a
    duplicated sample must score φ̂ = 0.5 (the estimator's value for
    MZ/duplicate pairs: N_Aa,Aa = N_Aa, opposite homs = 0) and
    unrelated random samples ~0, matching a direct numpy replay."""
    import pandas as pd

    from daxos_spark.ml.gwas import king_kinship

    rng = np.random.RandomState(3)
    n_snps = 400
    base = rng.binomial(2, 0.4, size=n_snps)
    other = rng.binomial(2, 0.4, size=(3, n_snps))
    G = np.vstack([base, base, other])  # samples 0,1 duplicates
    rows = [
        {"vec_id": s, "pos": p, "dosage": int(G[s, p])}
        for s in range(G.shape[0])
        for p in range(n_snps)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {(r["si"], r["sj"]): r for r in king_kinship(df).collect()}
    assert len(got) == 10  # C(5,2)
    assert abs(got[(0, 1)]["phi"] - 0.5) < 1e-12
    # numpy replay of every pair
    for (si, sj), r in got.items():
        gi, gj = G[si], G[sj]
        hh = int(((gi == 1) & (gj == 1)).sum())
        opp = int((((gi == 0) & (gj == 2)) | ((gi == 2) & (gj == 0))).sum())
        hi, hj = int((gi == 1).sum()), int((gj == 1).sum())
        assert (r["n_het_het"], r["n_opp_hom"], r["n_het_i"], r["n_het_j"]) == (
            hh,
            opp,
            hi,
            hj,
        )
        assert abs(r["phi"] - (hh - 2 * opp) / (hi + hj)) < 1e-12
    # unrelated pairs: |phi| well below the 3rd-degree cutoff's scale
    unrelated = [abs(got[(2, 3)]["phi"]), abs(got[(2, 4)]["phi"]), abs(got[(3, 4)]["phi"])]
    assert all(p < 0.15 for p in unrelated)


def test_king_kinship_no_hets_yields_null_phi(spark):
    """A pair with zero heterozygous sites on either side has an
    undefined estimator: φ̂ must be NULL, never a DIVIDE_BY_ZERO job
    abort (ANSI mode) — the same crash class the 10x probe caught in
    the IRLS trainer."""
    import pandas as pd

    from daxos_spark.ml.gwas import king_kinship

    G = {0: [0, 2, 0, 2], 1: [2, 0, 0, 2], 2: [1, 1, 0, 2]}  # 0,1 all-hom
    rows = [
        {"vec_id": s, "pos": p, "dosage": d}
        for s, gs in G.items()
        for p, d in enumerate(gs)
    ]
    got = {
        (r["si"], r["sj"]): r
        for r in king_kinship(spark.createDataFrame(pd.DataFrame(rows))).collect()
    }
    assert got[(0, 1)]["phi"] is None
    assert got[(0, 1)]["n_het_i"] == 0 and got[(0, 1)]["n_het_j"] == 0
    assert got[(0, 2)]["phi"] is not None  # sample 2 has hets → defined


def test_prs_score_matches_numpy(spark):
    """PRS = Σ w·dosage replayed in numpy, including the broadcast-join
    n_snps accounting."""
    import pandas as pd

    from daxos_spark.ml.gwas import prs_score

    rng = np.random.RandomState(5)
    n_s, n_p = 50, 12
    G = rng.randint(0, 3, size=(n_s, n_p))
    w = {p: round(float(rng.uniform(-0.5, 1.5)), 6) for p in [1, 3, 7, 9]}
    long_rows = [
        {"vec_id": s, "pos": p, "dosage": float(G[s, p])}
        for s in range(n_s)
        for p in range(n_p)
    ]
    ldf = spark.createDataFrame(pd.DataFrame(long_rows))
    wdf = spark.createDataFrame(pd.DataFrame([{"pos": p, "w": v} for p, v in w.items()]))
    got = {r["vec_id"]: r for r in prs_score(ldf, wdf).collect()}
    for s in range(n_s):
        want = sum(v * G[s, p] for p, v in w.items())
        assert got[s]["n_snps"] == len(w)
        assert abs(got[s]["prs"] - want) < 1e-9
