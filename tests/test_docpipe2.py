"""docpipe2 queries vs independent python oracles on sf0.001.

The duckdb hash-check runs driver-side; these tests pin the SEMANTICS
against brute-force python recomputations so a same-wrong-answer-in-
both-engines bug cannot slip through (prefix filtering in particular is
easy to get subtly wrong — an over-short prefix silently drops pairs).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_prefix_filter_jaccard_matches_bruteforce(spark):
    from daxos_spark.plans.docpipe2 import d_prefix_filter_jaccard

    got = {
        (r.da, r.db): r.jaccard
        for r in d_prefix_filter_jaccard(spark, SF_DIR).collect()
    }

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toksets = {
        r.doc_id: set(str(r.text).lower().strip().split())
        for r in docs.itertuples()
    }
    ids = sorted(toksets)
    want = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(toksets[da] & toksets[db])
            union = len(toksets[da] | toksets[db])
            if union and 10 * inter >= 6 * union:
                want[(da, db)] = math.floor(inter / union * 1e6) / 1e6
    assert got == want
    assert len(want) > 0  # fixture actually contains near-dups


def test_hot_ngrams_matches_python_counts(spark):
    from daxos_spark.plans.docpipe2 import d_hot_ngrams

    rows = d_hot_ngrams(spark, SF_DIR).collect()

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    occ: Counter = Counter()
    docs_per: dict[str, set] = {}
    for r in docs.itertuples():
        toks = str(r.text).lower().strip().split()
        k = max(len(toks) - 4, 1)
        for i in range(k):
            g = " ".join(toks[i : i + 5])
            occ[g] += 1
            docs_per.setdefault(g, set()).add(r.doc_id)
    want = sorted(
        (
            (g, len(ds), occ[g])
            for g, ds in docs_per.items()
            if len(ds) >= 2
        ),
        key=lambda t: (-t[1], -t[2], t[0]),
    )[:25]
    assert [(r.ngram, r.n_docs, r.n_occurrences) for r in rows] == want
    assert len(rows) > 0


def test_modal_event_type_matches_pandas(spark):
    from daxos_spark.plans.analytics import q_modal_event_type

    rows = q_modal_event_type(spark, SF_DIR).collect()

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    want = {}
    for uid, grp in ev.groupby("user_id"):
        cnt = grp.groupby("event_type").size()
        # max count, tie → lexicographically-last type (query contract)
        best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
        want[uid] = (best[0], best[1])
    assert {r.user_id: (r.modal_type, r.n_events) for r in rows} == want
