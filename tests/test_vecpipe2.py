"""vecpipe2 + DSIR queries vs independent python/numpy oracles.

The duckdb hash-check runs driver-side; these tests pin the SEMANTICS
against brute-force recomputations (numpy matmul, float Lloyd, hashlib
token LMs) so a same-wrong-answer-in-both-engines bug cannot slip
through.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _codes(emb: pd.DataFrame) -> np.ndarray:
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    return np.floor(m * 1000.0).astype(np.int64)


def test_gram_matrix_matches_numpy(spark):
    from daxos_spark.plans.vecpipe2 import e_gram_matrix

    rows = e_gram_matrix(spark, SF_DIR).collect()

    c = _codes(pd.read_parquet(f"{SF_DIR}/embeddings.parquet"))
    g = c.T @ c
    want = {(i, j): g[i, j] for i in range(c.shape[1]) for j in range(i, c.shape[1])}
    got = {(r.i, r.j): r.gram for r in rows}
    assert got == want
    assert len(got) == c.shape[1] * (c.shape[1] + 1) // 2


def _lloyd_assign(m: np.ndarray, k: int) -> np.ndarray:
    # float twin of the DECIMAL-exact relational Lloyd: first-K init,
    # one centroid update, final assignment (ties broken by cluster id —
    # measure-zero on this continuous fixture).
    ct = m[:k].copy()
    d = ((m[:, None, :] - ct[None, :, :]) ** 2).sum(axis=2)
    a0 = d.argmin(axis=1)
    for c in range(k):
        if (a0 == c).any():
            ct[c] = m[a0 == c].mean(axis=0)
    d = ((m[:, None, :] - ct[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_semdedup_matches_bruteforce(spark):
    from daxos_spark.plans.vecpipe2 import _SD_K, _SD_TAU2, e_semdedup

    rows = e_semdedup(spark, SF_DIR).collect()

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    assign = _lloyd_assign(m, _SD_K)
    c = np.floor(m * 1000.0).astype(np.int64)
    nn = (c * c).sum(axis=1)
    ids = emb["vec_id"].to_numpy()
    removed: set[int] = set()
    for cl in range(_SD_K):
        idx = np.where(assign == cl)[0]
        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                a, b = idx[ai], idx[bi]
                lo, hi = (a, b) if ids[a] < ids[b] else (b, a)
                num = int((c[lo] * c[hi]).sum())
                if num > 0 and float(num) * float(num) > (
                    _SD_TAU2 * float(nn[lo])
                ) * float(nn[hi]):
                    removed.add(int(ids[hi]))
    want = {
        cl: (
            int((assign == cl).sum()),
            sum(1 for i, x in zip(ids, assign) if x == cl and int(i) in removed),
        )
        for cl in range(_SD_K)
        if (assign == cl).any()
    }
    got = {r.cluster: (r.n_vectors, r.n_removed) for r in rows}
    assert got == want
    assert sum(v[1] for v in want.values()) > 0  # non-vacuous: dups exist


def test_dsir_weights_match_python_lm(spark):
    from daxos_spark.plans.docpipe2 import _DSIR_B, d_dsir_weights

    rows = d_dsir_weights(spark, SF_DIR).collect()

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bk = lambda tk: int(hashlib.md5(tk.encode()).hexdigest()[:14], 16) % _DSIR_B
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for r in docs.itertuples():
        bks = [bk(t) for t in str(r.text).lower().strip().split()]
        per_doc[r.doc_id] = bks
        for b in bks:
            raw[b] = raw.get(b, 0) + 1
            if r.lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    n_r, n_t = sum(raw.values()), sum(tgt.values())
    want = {}
    for doc_id, bks in per_doc.items():
        s = sum(math.log(tgt.get(b, 0) + 1) - math.log(raw[b] + 1) for b in bks)
        w = s + len(bks) * (math.log(n_r + _DSIR_B) - math.log(n_t + _DSIR_B))
        want[doc_id] = (len(bks), math.floor(w * 1e6) / 1e6)
    got = {r.doc_id: (r.n_tok, r.dsir_weight) for r in rows}
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        # engine side quantizes each ln-ratio term to DECIMAL(25,6)
        # before summing → up to 5e-7 drift per token vs the float oracle
        assert abs(got[k][1] - want[k][1]) < 5e-7 * want[k][0] + 2e-6, k
    # directionally sane: en docs (the target domain) should score higher
    en = {r.doc_id for r in docs.itertuples() if r.lang == "en"}
    mean_en = np.mean([got[k][1] for k in got if k in en])
    mean_rest = np.mean([got[k][1] for k in got if k not in en])
    assert mean_en > mean_rest


def test_mmr_rerank_matches_bruteforce(spark):
    from daxos_spark.plans.vecpipe2 import _MMR_CAND, _MMR_K, v_mmr_rerank

    rows = v_mmr_rerank(spark, SF_DIR).collect()

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    qmask, cmask = ids < 10, ids >= 10
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.step, r.selected_id, r.mmr_score))
    for qi, qid in enumerate(ids[qmask]):
        qv = m[qmask][qi]
        cv, cid = m[cmask], ids[cmask]
        cos = (cv @ qv) / (np.linalg.norm(cv, axis=1) * np.linalg.norm(qv))
        order = np.lexsort((cid, -cos))[:_MMR_CAND]
        cand_ids, cand_v, rel = list(cid[order]), cv[order], cos[order]
        nrm = np.linalg.norm(cand_v, axis=1)
        sims = (cand_v @ cand_v.T) / np.outer(nrm, nrm)
        sel, want = [], []
        remaining = sorted(range(len(cand_ids)), key=lambda i: cand_ids[i])
        for step in range(1, _MMR_K + 1):
            best, bs = None, None
            for i in remaining:
                ms = max((sims[i][j] for j in sel), default=0.0)
                sc = 0.5 * rel[i] - 0.5 * ms
                if bs is None or sc > bs:
                    best, bs = i, sc
            want.append((step, cand_ids[best], bs))
            sel.append(best)
            remaining.remove(best)
        for (gs, gi, gsc), (ws, wi, wsc) in zip(sorted(got[qid]), want):
            assert (gs, gi) == (ws, wi)
            assert abs(gsc - wsc) < 2e-6  # trunc6 + float-vs-blas dot noise
        # diversification sanity: picks are distinct
        assert len({i for _, i, _ in got[qid]}) == len(got[qid])


def test_ivfpq_knn_invariants(spark):
    from daxos_spark.plans.vecpipe2 import (
        _IVFPQ_NPROBE,
        v_ivfpq_knn,
    )

    rows = v_ivfpq_knn(spark, SF_DIR).collect()
    assert rows, "no neighbors returned"

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    corpus = ids >= 10

    # float replay of the coarse quantizer (per-label means, L2 assign)
    cent = np.stack(
        [m[corpus & (labels == b)].mean(axis=0) for b in sorted(set(labels[corpus]))]
    )
    blab = np.array(sorted(set(labels[corpus])))

    def assign(X):
        return blab[((X[:, None, :] - cent[None]) ** 2).sum(axis=2).argmin(axis=1)]

    cell = dict(zip(ids[corpus], assign(m[corpus])))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rs in by_q.items():
        qv = m[ids == qid][0]
        qd = ((cent - qv) ** 2).sum(axis=1)
        probed = set(blab[np.argsort(qd, kind="stable")[:_IVFPQ_NPROBE]])
        ranks = sorted(r.rk for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for r in rs:
            assert r.adc_dist >= 0
            # every returned neighbor lives in one of the probed cells
            assert cell[r.neighbor_id] in probed
        # ADC distances are monotone in rank
        ds = [r.adc_dist for r in sorted(rs, key=lambda r: r.rk)]
        assert ds == sorted(ds)


def test_knn_blocked_matches_numpy(spark):
    from daxos_spark.plans.vecpipe2 import _BK_K, v_knn_blocked

    rows = v_knn_blocked(spark, SF_DIR).collect()

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    c = _codes(emb)
    ids = emb["vec_id"].to_numpy()
    Q, C = c[ids < 10], c[ids >= 10]
    qids, cids = ids[ids < 10], ids[ids >= 10]
    S = C @ Q.T
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rk, r.neighbor_id, r.score))
    for j, qid in enumerate(qids):
        order = np.lexsort((cids, -S[:, j]))[:_BK_K]
        want = [(k + 1, int(cids[i]), int(S[i, j])) for k, i in enumerate(order)]
        assert sorted(got[qid]) == want


def test_hybrid_search_reranks_bm25_recall(spark):
    """The rerank stage must (a) only surface docs from the BM25 recall
    set and (b) order them by exact integer code dot."""
    from daxos_spark.plans.textpipe import t_bm25_topk  # noqa: F401  (same corpus)
    from daxos_spark.plans.vecpipe2 import _HY_K, v_hybrid_search

    rows = v_hybrid_search(spark, SF_DIR).collect()
    assert rows

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    c = _codes(emb)
    by_id = {int(v): c[i] for i, v in enumerate(emb["vec_id"])}
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert len(rs) <= _HY_K
        dots = [int(by_id[r.qid] @ by_id[r.doc_id]) for r in rs]
        assert [r.sem_dot for r in rs] == dots
        assert dots == sorted(dots, reverse=True)
        assert all(r.doc_id % 97 != 0 for r in rs)  # eval never retrieved


def test_ivfpq_recall_bounds(spark):
    from daxos_spark.plans.vecpipe2 import v_ivfpq_recall

    rows = v_ivfpq_recall(spark, SF_DIR).collect()
    assert len(rows) == 10  # one per query
    for r in rows:
        assert r.k_exact == 5
        assert 0 <= r.n_recovered <= 5
    # NOTE: on this synthetic corpus the embeddings are i.i.d. random,
    # so pairwise distances concentrate and ANN recall is legitimately
    # LOW — the audit's whole job is to report that honestly (it's the
    # query you run before trusting an index on real data). We assert
    # only the audit's own guarantees, not a recall floor the data
    # cannot support.


def test_pca_power_matches_numpy(spark):
    from daxos_spark.plans.vecpipe2 import _PI_ITERS, v_pca_power

    rows = v_pca_power(spark, SF_DIR).collect()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    c = _codes(emb).astype(np.float64)
    G = c.T @ c
    v = np.ones(G.shape[0])
    for _ in range(_PI_ITERS):
        w = G @ v
        v = w / np.sqrt((w * w).sum())
    got = np.array([r.pc1_loading for r in sorted(rows, key=lambda r: r.pos)])
    assert np.allclose(got, v, atol=1e-4)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-3
    # the guaranteed property (data-independent): power iteration never
    # decreases the Rayleigh quotient, so 3 rounds beat the start vector.
    # (On this i.i.d. corpus the spectrum is near-isotropic, so a
    # fraction-of-top-eigenvalue bound would be data-wishful.)
    v0 = np.ones(G.shape[0]) / np.sqrt(G.shape[0])
    assert got @ G @ got >= v0 @ G @ v0 - 1e-6
    assert got @ G @ got <= np.linalg.eigvalsh(G)[-1] + 1e-6


def test_bq_knn_matches_numpy(spark):
    """Numpy replay of the BQ pipeline: sign-bit pack, Hamming top-C,
    exact-cosine rerank — ranks must match exactly; and the recall
    audit's n_recovered equals the replay overlap."""
    import numpy as np
    import pandas as pd

    from daxos_spark.plans.vecpipe2 import _BQ_C, v_bq_knn, v_bq_recall

    emb = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    V = np.asarray(emb.embedding.tolist(), dtype=np.float64)
    ids = emb.vec_id.to_numpy()
    bits = (V > 0).astype(np.int64)
    qm, cm = ids < 10, ids >= 10
    want_rows = set()
    exact_top, bq_top = {}, {}
    for qi in np.where(qm)[0]:
        ham = (bits[qi] != bits[cm]).sum(axis=1)
        cids = ids[cm]
        order = np.lexsort((cids, ham))[:_BQ_C]
        cand = cids[order]
        qv = V[qi]
        cv = V[cm][order]
        cos = cv @ qv / (np.linalg.norm(cv, axis=1) * np.linalg.norm(qv))
        rer = np.lexsort((cand, -cos))[:5]
        for rk, j in enumerate(rer, 1):
            want_rows.add((int(ids[qi]), rk, int(cand[j]), int(ham[np.where(cids == cand[j])[0][0]])))
        bq_top[int(ids[qi])] = {int(cand[j]) for j in rer}
        cos_all = V[cm] @ qv / (np.linalg.norm(V[cm], axis=1) * np.linalg.norm(qv))
        ex = np.lexsort((cids, -cos_all))[:5]
        exact_top[int(ids[qi])] = {int(cids[j]) for j in ex}
    got = {
        (r["qid"], r["rk"], r["neighbor_id"], r["ham"])
        for r in v_bq_knn(spark, SF_DIR).collect()
    }
    assert got == want_rows
    rec = {r["qid"]: r["n_recovered"] for r in v_bq_recall(spark, SF_DIR).collect()}
    assert rec == {
        q: len(exact_top[q] & bq_top[q]) for q in exact_top
    }
    # BQ with rerank should recover most of the exact top-5
    assert sum(rec.values()) >= 0.5 * 5 * len(rec)


def test_ivf_incremental_invariants(spark):
    """Mass conservation + the integer drift rule: every base/batch
    vector lands in exactly one bucket, and recluster_flag replays as
    n_new·Σbase > 3·n_base·Σnew."""
    import pandas as pd

    from daxos_spark.plans.vecpipe2 import v_ivf_incremental

    emb = pd.read_parquet(SF_DIR + "/embeddings.parquet")
    n_base = int((emb.vec_id >= 100).sum())
    n_batch = int(((emb.vec_id >= 10) & (emb.vec_id < 100)).sum())
    rows = v_ivf_incremental(spark, SF_DIR).collect()
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_new"] for r in rows) == n_batch
    tb, tn = n_base, n_batch
    for r in rows:
        assert r["n_total"] == r["n_base"] + r["n_new"]
        assert r["recluster_flag"] == (r["n_new"] * tb > 3 * r["n_base"] * tn)


def test_semdedup_keep_consistent_with_summary(spark):
    """The keep-list is the row-level face of the summary: per-cluster
    keep=0 counts equal n_removed, every vector appears exactly once,
    and a cluster's lowest id is always kept (it can never be the
    larger side of a within-cluster near-dup pair)."""
    from daxos_spark.plans.vecpipe2 import e_semdedup, v_semdedup_keep

    keep = v_semdedup_keep(spark, SF_DIR).collect()
    summ = {r["cluster"]: r for r in e_semdedup(spark, SF_DIR).collect()}

    assert len({r["vec_id"] for r in keep}) == len(keep)
    by_cluster: dict = {}
    for r in keep:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert set(by_cluster) == set(summ)
    for c, rows in by_cluster.items():
        assert len(rows) == summ[c]["n_vectors"], c
        assert sum(1 for r in rows if r["keep"] == 0) == summ[c]["n_removed"], c
        lowest = min(rows, key=lambda r: r["vec_id"])
        assert lowest["keep"] == 1, c
