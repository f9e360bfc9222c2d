"""Round-6 additions vs independent python oracles: Kneser-Ney bigram
LM, Efraimidis-Spirakis weighted priority sampling, binary-segmentation
changepoint. The duckdb hash gate proves cross-engine agreement; these
replays prove the SEMANTICS against textbook formulas."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.lower().strip())


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _trunc6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


def test_kneser_ney_matches_textbook(spark):
    from daxos_spark.plans.textpipe import t_kneser_ney_ppl

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    c2: Counter = Counter()
    doc_bi: dict = {}
    for r in docs.itertuples():
        tk = _toks(r.text)
        bis = list(zip(tk, tk[1:]))
        doc_bi[r.doc_id] = bis
        c2.update(bis)
    c1: Counter = Counter()
    nfol: Counter = Counter()
    nprec: Counter = Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        nfol[w1] += 1
        nprec[w2] += 1
    T = len(c2)
    D = 0.75

    def p_kn(w1, w2):
        return max(c2[(w1, w2)] - D, 0.0) / c1[w1] + (D * nfol[w1] / c1[w1]) * (
            nprec[w2] / T
        )

    rows = t_kneser_ney_ppl(spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"]) for r in rows}
    assert set(got) == {d for d, b in doc_bi.items() if b}
    for doc_id, bis in doc_bi.items():
        if not bis:
            continue
        nll = -sum(math.log(p_kn(a, b)) for a, b in bis) / len(bis)
        n_b, avg = got[doc_id]
        assert n_b == len(bis)
        assert abs(avg - _trunc6(nll)) < 2e-6, doc_id


def test_weighted_sample_is_efraimidis_spirakis(spark):
    from daxos_spark.plans.textpipe import _WS_N, t_weighted_sample

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    keys = {}
    for r in docs.itertuples():
        u = _md5_long(str(r.doc_id)) / 2**56
        keys[r.doc_id] = (math.log(u) / r.n_chars, r.n_chars)
    want = sorted(keys.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_WS_N]

    rows = t_weighted_sample(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    for r, (d, (k, w)) in zip(rows, want):
        assert r["weight"] == w
        assert abs(r["priority"] - _trunc6(k)) < 2e-6


def test_changepoint_maximizes_sse_reduction(spark):
    from daxos_spark.plans.relational2 import q_changepoint_revenue

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    day = (
        o.assign(d=o["o_orderdate"].values.astype("datetime64[D]").astype("int64"))
        .groupby("d")["o_totalprice"]
        .sum()
        .sort_index()
    )
    s = day.to_numpy()
    n = len(s)
    tot = s.sum()
    best = None
    for k in range(1, n):
        sk = s[:k].sum()
        g = sk * sk / k + (tot - sk) ** 2 / (n - k) - tot * tot / n
        if best is None or g > best[1] + 1e-9:
            best = (day.index[k - 1], g, sk / k, (tot - sk) / (n - k), k)

    r = q_changepoint_revenue(spark, SF_DIR).collect()[0]
    assert r["split_day"] == best[0]
    assert r["n_left"] == best[4]
    assert r["n_right"] == n - best[4]
    assert abs(r["gain"] - best[1]) < 1e-3 * max(1.0, abs(best[1]))
    assert abs(r["mean_left"] - best[2]) < 1e-3
    assert abs(r["mean_right"] - best[3]) < 1e-3


def test_bradley_terry_matches_mm_replay(spark):
    """Python MM replay with the same floor-grid denominator sums:
    identical matchup counts, win totals, and (to the trunc6 grid)
    identical fitted strengths after the fixed 6 rounds."""
    from daxos_spark.plans.analytics import _BT_ROUNDS, q_bradley_terry

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_orderkey", "l_partkey", "l_quantity"]
    ]
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")[["p_partkey", "p_brand"]]
    li = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    m: dict = {}
    for _, grp in li.groupby("l_orderkey"):
        rows = list(grp[["p_brand", "l_quantity"]].itertuples(index=False))
        for i in range(len(rows)):
            for j in range(len(rows)):
                a, b = rows[i], rows[j]
                if a.p_brand < b.p_brand and a.l_quantity != b.l_quantity:
                    n, wa = m.get((a.p_brand, b.p_brand), (0, 0))
                    m[(a.p_brand, b.p_brand)] = (
                        n + 1,
                        wa + (1 if a.l_quantity > b.l_quantity else 0),
                    )
    wins: dict = {}
    nm: dict = {}
    for (ba, bb), (n, wa) in m.items():
        wins[ba] = wins.get(ba, 0) + wa
        wins[bb] = wins.get(bb, 0) + (n - wa)
        nm[ba] = nm.get(ba, 0) + n
        nm[bb] = nm.get(bb, 0) + n
    p = {b: 1.0 for b in wins}
    for _ in range(_BT_ROUNDS):
        terms: dict = {b: 0 for b in wins}
        for (ba, bb), (n, _wa) in m.items():
            t = n / (p[ba] + p[bb])
            q = math.floor(t * 1e6)
            terms[ba] += q
            terms[bb] += q
        p = {
            b: (0.0 if wins[b] == 0 else wins[b] / (terms[b] / 1e6))
            for b in wins
        }

    rows_out = q_bradley_terry(spark, SF_DIR).collect()
    got = {r["brand"]: r for r in rows_out}
    assert set(got) == set(wins)
    for b in wins:
        assert got[b]["n_wins"] == wins[b]
        assert got[b]["n_matches"] == nm[b]
        assert abs(got[b]["bt_score"] - _trunc6(p[b])) < 2e-6, b


def test_curriculum_buckets_invariants(spark):
    """Stages partition the scored corpus; mean NLL is monotone in the
    stage index (easy->hard) and stage bounds nest inside neighbors."""
    from daxos_spark.plans.textpipe import t_curriculum_buckets, t_kneser_ney_ppl

    rows = sorted(
        t_curriculum_buckets(spark, SF_DIR).collect(), key=lambda r: r["stage"]
    )
    n_scored = t_kneser_ney_ppl(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in rows) == n_scored
    assert [r["stage"] for r in rows] == list(range(1, len(rows) + 1))
    means = [r["mean_nll"] for r in rows]
    assert means == sorted(means)
    for a, b in zip(rows, rows[1:]):
        assert a["max_nll"] <= b["min_nll"] + 1e-9


def test_kcenter_init_invariants(spark):
    """Gonzalez farthest-first: K distinct centers; the selection
    distance sequence is non-increasing (classic k-center property);
    round-0 seed is the lowest vec_id; python brute-force replay of
    the full pick sequence agrees."""
    import numpy as np

    from daxos_spark.plans.vecpipe2 import _KC_K, v_kcenter_init

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    codes = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1000.0
    ).astype(np.int64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids, codes = ids[order], codes[order]

    chosen = [0]
    want = [(0, int(ids[0]), 0)]
    dmin = ((codes - codes[0]) ** 2).sum(axis=1)
    for r in range(1, _KC_K):
        best = max(range(len(ids)), key=lambda i: (dmin[i], -ids[i]))
        want.append((r, int(ids[best]), int(dmin[best])))
        chosen.append(best)
        dmin = np.minimum(dmin, ((codes - codes[best]) ** 2).sum(axis=1))

    rows = v_kcenter_init(spark, SF_DIR).collect()
    got = [(r["round"], r["vec_id"], r["d2"]) for r in rows]
    assert got == want
    d2s = [d for _, _, d in got[1:]]
    assert d2s == sorted(d2s, reverse=True)
    assert len({c for _, c, _ in got}) == _KC_K


def test_kcore_matches_python_peel(spark):
    """Pure-python peel replay on the same >=2-order co-purchase edge
    set; per-round node/edge counts must match exactly and reach a
    fixpoint within the unrolled rounds."""
    from collections import Counter

    from daxos_spark.plans.relational2 import (
        _KCORE_K,
        _KCORE_ROUNDS,
        q_kcore_decomposition,
    )

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    op = li.drop_duplicates()
    pair_counts: Counter = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_counts[(parts[i], parts[j])] += 1
    edges = {p for p, n in pair_counts.items() if n >= 2}

    def stats(es):
        nodes = {v for e in es for v in e}
        return len(nodes), len(es)

    want = [(0, *stats(edges))]
    for r in range(1, _KCORE_ROUNDS + 1):
        deg: Counter = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= _KCORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        want.append((r, *stats(edges)))

    rows = q_kcore_decomposition(spark, SF_DIR).collect()
    got = [(r["round"], r["n_nodes"], r["n_edges"]) for r in rows]
    assert got == want
    # unroll is sufficient: the tail is a fixpoint
    assert got[-1][1:] == got[-2][1:]


def test_meta_analysis_matches_ivw_replay(spark):
    """Textbook inverse-variance replay on the synthetic dosages: the
    IVW combine, pooled SE, and Cochran's Q match per SNP; pooled SE is
    never larger than any single cohort's."""
    import numpy as np

    from daxos_spark.plans.mlpipe import _META_NC, ml_meta_analysis

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    n_pos = len(emb["embedding"].iloc[0])

    rows = ml_meta_analysis(spark, SF_DIR).collect()
    got = {r["pos"]: r for r in rows}
    assert set(got) == set(range(n_pos))

    for pos in range(0, n_pos, 7):  # sample of SNPs keeps the test fast
        bs, ws = [], []
        for c in range(_META_NC):
            sel = ids % _META_NC == c
            case = labels[sel] >= 5
            dos = (ids[sel] + 7 * pos) % 3
            a = float(dos[case].sum())
            na = float(case.sum())
            cc = float(dos[~case].sum())
            nc = float((~case).sum())
            b = math.log(
                (a + 0.5) * (2 * nc - cc + 0.5) / ((2 * na - a + 0.5) * (cc + 0.5))
            )
            w = 1.0 / (
                1.0 / (a + 0.5)
                + 1.0 / (2 * na - a + 0.5)
                + 1.0 / (cc + 0.5)
                + 1.0 / (2 * nc - cc + 0.5)
            )
            bs.append(b)
            ws.append(w)
        bm = sum(w * b for w, b in zip(ws, bs)) / sum(ws)
        q = sum(w * (b - bm) ** 2 for w, b in zip(ws, bs))
        r = got[pos]
        assert abs(r["beta_meta"] - bm) < 2e-6
        assert abs(r["se_meta"] - 1.0 / math.sqrt(sum(ws))) < 2e-6
        assert abs(r["cochran_q"] - q) < 1e-4
        assert r["cochran_q"] >= 0
        assert r["se_meta"] <= 1.0 / math.sqrt(max(ws)) + 1e-9
