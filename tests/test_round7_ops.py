"""Round-7 additions vs independent python oracles / paper invariants:
winnowing fingerprints (MOSS), HDR-histogram latency quantiles,
t-closeness EMD, label propagation. The duckdb hash gate proves
cross-engine agreement; these prove the SEMANTICS."""

from __future__ import annotations

import hashlib
import math
import re

SF_DIR = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.lower().strip())


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _winnow(tokens: list[str], k: int, w: int) -> set[int]:
    """Textbook winnowing: min hash of each full w-window of k-gram
    hashes (the selected SET is tie-break-independent)."""
    hs = [
        _md5_long(" ".join(tokens[i : i + k]))
        for i in range(len(tokens) - k + 1)
    ]
    return {min(hs[t : t + w]) for t in range(len(hs) - w + 1)}


def test_winnowing_matches_textbook_and_guarantee(spark):
    from daxos_spark.catalog import load_tables
    from daxos_spark.plans.textpipe import _WN_K, _WN_W

    docs = {
        r["doc_id"]: r["text"]
        for r in load_tables(spark, SF_DIR)["documents"]
        .select("doc_id", "text")
        .collect()
    }
    # python replica of the per-doc selected sets
    py_sel = {
        d: _winnow(_toks(t), _WN_K, _WN_W)
        for d, t in docs.items()
        if len(_toks(t)) >= _WN_K + _WN_W - 1
    }
    # the engine's per-doc selected sets, re-derived through the same
    # public chain the query aggregates (distinct (doc, hm))
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = load_tables(spark, SF_DIR)["documents"]
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tk = d.select("doc_id", toks.alias("tk"))
    npos = F.size("tk") - F.lit(_WN_K - 1)
    from daxos_spark.functions.hashing import md5_long

    h = tk.select(
        "doc_id",
        npos.alias("ng"),
        "tk",
        F.explode(
            F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("i"),
    ).select(
        "doc_id",
        "ng",
        "i",
        md5_long(F.array_join(F.slice("tk", F.col("i"), _WN_K), " ")).alias("h"),
    )
    wmin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WN_W - 1)
    sel = (
        h.select("doc_id", "ng", "i", F.min("h").over(wmin).alias("hm"))
        .filter(F.col("i") <= F.col("ng") - _WN_W + 1)
        .select("doc_id", "hm")
        .distinct()
        .collect()
    )
    got: dict[int, set[int]] = {}
    for r in sel:
        got.setdefault(r["doc_id"], set()).add(r["hm"])
    assert got == py_sel
    # density ~ 2/(w+1) within loose bounds on real text
    tot_sel = sum(len(s) for s in py_sel.values())
    tot_grams = sum(
        len(_toks(t)) - _WN_K + 1
        for t in docs.values()
        if len(_toks(t)) >= _WN_K
    )
    assert 0.2 <= tot_sel / tot_grams <= 0.8


def test_hdr_latency_error_bound_and_exactness(spark):
    """The sketch's lower-bound estimate must bracket the exact order
    statistic from below within the 4-significant-bit guarantee:
    -1/16 < rel_err <= 0."""
    import __spark_entry__ as E

    rows = E.queries()["q_hdr_latency"](spark, SF_DIR).collect()
    assert {r["quantile"] for r in rows} == {"p50", "p90", "p99"}
    for r in rows:
        assert r["est_lower_us"] <= r["exact_us"], r
        assert -1.0 / 16.0 < r["rel_err"] <= 0.0, r
        # lower bound is exact bucket arithmetic: reconstructible
        b = int(r["exact_us"]).bit_length()
        width = 2 ** (b - 1) / 16.0
        assert r["exact_us"] - r["est_lower_us"] < width + 1e-9, r


def test_t_closeness_emd_matches_numpy(spark):
    """Recompute every class EMD in python and compare the per-segment
    rollup (max EMD + violating-class count)."""
    import numpy as np

    from daxos_spark.catalog import load_tables
    from daxos_spark.plans.diagnostics import _TCLOSE_T

    t = load_tables(spark, SF_DIR)
    cust = {
        r["c_custkey"]: (
            r["c_mktsegment"],
            r["c_nationkey"],
            math.floor(float(r["c_acctbal"]) / 1000.0),
        )
        for r in t["customer"].collect()
    }
    classes: dict[tuple, np.ndarray] = {}
    for r in t["orders"].select("o_custkey", "o_orderpriority").collect():
        qi = cust[r["o_custkey"]]
        v = classes.setdefault(qi, np.zeros(5))
        v[int(r["o_orderpriority"][0]) - 1] += 1
    g = sum(classes.values())
    q = g / g.sum()
    per_seg: dict[str, list[tuple[float, int]]] = {}
    for qi, v in classes.items():
        p = v / v.sum()
        c = np.cumsum(p - q)
        emd = float(np.abs(c[:4]).sum() / 4.0)
        per_seg.setdefault(qi[0], []).append((emd, int(v.sum())))
    import __spark_entry__ as E

    got = {
        r["seg"]: r for r in E.queries()["q_t_closeness"](spark, SF_DIR).collect()
    }
    for seg, lst in per_seg.items():
        assert got[seg]["n_classes"] == len(lst)
        assert abs(got[seg]["max_emd"] - max(e for e, _ in lst)) < 2e-6
        assert got[seg]["n_violating"] == sum(1 for e, _ in lst if e > _TCLOSE_T)


def test_label_propagation_trace_invariants(spark):
    """Round-0 row is the identity labeling; communities can only merge
    or hold under synchronous LPA trace accounting we report."""
    import __spark_entry__ as E

    rows = {
        r["round"]: r
        for r in E.queries()["q_label_propagation"](spark, SF_DIR).collect()
    }
    assert rows[0]["n_moved"] == 0 and rows[0]["largest"] == 1
    n_nodes = rows[0]["n_communities"]
    for r in range(1, 4):
        assert 1 <= rows[r]["n_communities"] <= n_nodes
        assert 1 <= rows[r]["largest"] <= n_nodes
        assert 0 <= rows[r]["n_moved"] <= n_nodes
    # labels moved in round 1 (the graph is non-trivial)
    assert rows[1]["n_moved"] > 0


def test_semantic_keep_matches_python_replay(spark):
    """Full python replay of the LSH-blocked keep-list: md5-derived
    integer hyperplanes, floor(x*1000) codes, integer-cosine threshold,
    keep-lowest-id within similar blocked pairs."""
    from daxos_spark.catalog import load_tables
    from daxos_spark.functions.similarity import lsh_planes

    t = load_tables(spark, SF_DIR)
    langs = {r["doc_id"]: r["lang"] for r in t["documents"].select("doc_id", "lang").collect()}
    planes = lsh_planes()
    rows = {}
    for r in t["embeddings"].select("vec_id", "embedding").collect():
        if r["vec_id"] not in langs:
            continue
        code = [math.floor(x * 1000.0) for x in r["embedding"]]
        bucket = sum(
            (1 << b)
            for b, w in enumerate(planes)
            if sum(c * ww for c, ww in zip(code, w)) >= 0
        )
        rows[r["vec_id"]] = (langs[r["vec_id"]], bucket, code)
    removed = set()
    ids = sorted(rows)
    by_block: dict[tuple, list[int]] = {}
    for i in ids:
        by_block.setdefault(rows[i][:2], []).append(i)
    for block in by_block.values():
        for ai in range(len(block)):
            for bi in range(ai + 1, len(block)):
                a, b = block[ai], block[bi]
                ca, cb = rows[a][2], rows[b][2]
                num = sum(x * y for x, y in zip(ca, cb))
                na = sum(x * x for x in ca)
                nb = sum(y * y for y in cb)
                if num > 0 and float(num) * float(num) > (0.09 * float(na)) * float(nb):
                    removed.add(b)
    import __spark_entry__ as E

    got = {
        r["doc_id"]: (r["lang"], r["bucket"], r["keep"])
        for r in E.queries()["v_semantic_keep"](spark, SF_DIR).collect()
    }
    assert set(got) == set(rows)
    for d in rows:
        assert got[d][0] == rows[d][0], d
        assert got[d][1] == rows[d][1], d
        assert got[d][2] == (0 if d in removed else 1), d
    assert removed, "corpus should contain at least one semantic near-dup"
