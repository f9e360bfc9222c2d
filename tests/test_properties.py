"""Property-based tests (hypothesis) for operator invariants.

The reference has no property-based testing (SURVEY.md §5.6); these
pin the operators against independent oracles (pandas.merge_asof,
brute-force set math) across randomized inputs. Spark jobs are slow,
so each property runs a reduced example count with no deadline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from daxos_spark.operators.clumping import ld_clump
from daxos_spark.operators.temporal import asof_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def _asof_tables(draw):
    n_l = draw(st.integers(5, 40))
    n_r = draw(st.integers(0, 60))
    keys = draw(st.integers(1, 4))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    left = pd.DataFrame(
        {
            "k": rng.randint(0, keys, n_l),
            "lts": rng.randint(0, 500, n_l).astype("int64"),
            "lv": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, keys, n_r),
            "rts": rng.randint(0, 500, n_r).astype("int64"),
            "rv": np.arange(n_r, dtype="int64") * 7,
        }
    )
    # merge_asof needs unique (k, rts) for a well-defined match value
    right = right.drop_duplicates(["k", "rts"])
    return left, right


@given(_asof_tables())
@settings(**_SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, tables):
    left, right = tables
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right) if len(right) else spark.createDataFrame(right, "k long, rts long, rv long"),
            on="k",
            left_ts="lts",
            right_ts="rts",
        )
        .toPandas()
        .sort_values(["k", "lts", "lv"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values(["k", "lts", "lv"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["rts_right"].isna() == want["rts"].isna()).all()
    mask = ~want["rts"].isna()
    assert (
        got.loc[mask, "rts_right"].astype("int64") == want.loc[mask, "rts"].astype("int64")
    ).all()


@given(
    st.integers(0, 2**31 - 1),
    st.integers(50, 300),
    st.integers(1, 2000),
)
@settings(**_SETTINGS)
def test_clump_invariants(spark, seed, n, window):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "chrom": rng.randint(1, 4, n),
            "pos": rng.randint(0, 5000, n).astype("int64"),
            "pval": rng.uniform(size=n).round(6),
        }
    ).drop_duplicates(["chrom", "pos"])
    got = ld_clump(spark.createDataFrame(pdf), window=window).toPandas()
    # invariant 1: no two selected SNPs on one chromosome within window
    for _, g in got.groupby("chrom"):
        pos = np.sort(g["pos"].to_numpy())
        assert (np.diff(pos) > window).all()
    # invariant 2: the globally best p-value per chromosome is always kept
    for chrom, g in pdf.groupby("chrom"):
        best = g.sort_values(["pval", "pos"], kind="mergesort").iloc[0]
        sel = got[got.chrom == chrom]
        assert ((sel.pos == best.pos) & (sel.pval == best.pval)).any()
    # invariant 3: every dropped SNP is within window of some kept SNP
    for chrom, g in pdf.groupby("chrom"):
        kept = got[got.chrom == chrom]["pos"].to_numpy()
        for p in g["pos"]:
            assert (np.abs(kept - p) <= window).any()


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=1, max_size=200))
@settings(**_SETTINGS)
def test_decimal_sum_order_independent(spark, xs):
    """dsum's whole reason to exist: identical result under any row order."""
    from daxos_spark.plans.registry import dsum
    import pyspark.sql.functions as F

    pdf = pd.DataFrame({"x": np.array(xs, dtype="float64")})
    fwd = spark.createDataFrame(pdf).agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    rev = (
        spark.createDataFrame(pdf.iloc[::-1].reset_index(drop=True))
        .repartition(7)
        .agg(dsum(F.col("x")).alias("s"))
        .collect()[0]["s"]
    )
    assert fwd == rev  # bit-for-bit, not approx


# ---------------------------------------------------------------- round 3 ops


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=400
    )
)
@settings(max_examples=60, deadline=None)
def test_cdc_chunks_reconstruct_exactly(text):
    """CDC partition property: chunks are a PARTITION of the input —
    concatenating them reproduces the asset byte-for-byte, for any
    content (the python replay of m_cdc_chunks' boundary rule)."""
    import hashlib

    from daxos_spark.plans.blobpipe import _CDC_D, _CDC_W

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    cuts = {1, len(text) + 1}
    for i in range(2, len(text) - _CDC_W + 2):
        if h(text[i - 1 : i - 1 + _CDC_W]) % _CDC_D == 0:
            cuts.add(i)
    cs = sorted(cuts)
    chunks = [text[a - 1 : b - 1] for a, b in zip(cs, cs[1:])]
    assert "".join(chunks) == text
    assert all(chunks)  # no empty chunk


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=30
    )
)
@settings(max_examples=60, deadline=None)
def test_bpe_merge_fold_preserves_word(words):
    """BPE merge property: for ANY pair (x, y), folding a word's symbol
    sequence merges only adjacent (x, y) occurrences left-to-right and
    concatenating the merged symbols always reproduces the word."""
    for w in words:
        syms = list(w)
        for x, y in {(a, b) for a, b in zip(w, w[1:])} or {("a", "b")}:
            out = [syms[0]]
            for cur in syms[1:]:
                if out[-1] == x and cur == y:
                    out[-1] = x + y
                else:
                    out.append(cur)
            assert "".join(out) == w
            assert (x + y not in out) or (x + y != x)


@given(
    n=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=40, deadline=None)
def test_mmr_greedy_invariants(n, seed):
    """MMR greedy invariants on random candidate sets: picks are
    distinct, the first pick is the max-relevance candidate, and each
    later score is <= 0.5*rel of its own pick (the redundancy penalty
    only subtracts)."""
    rng = np.random.default_rng(seed)
    rel = rng.uniform(size=n)
    sims = rng.uniform(size=(n, n))
    sims = (sims + sims.T) / 2
    k = min(5, n)
    sel, remaining = [], list(range(n))
    out = []
    for _ in range(k):
        best, bs = None, None
        for d in remaining:
            ms = max((sims[d][s] for s in sel), default=0.0)
            sc = 0.5 * rel[d] - 0.5 * ms
            if bs is None or sc > bs:
                best, bs = d, sc
        out.append((best, bs))
        sel.append(best)
        remaining.remove(best)
    ids = [i for i, _ in out]
    assert len(set(ids)) == len(ids)
    assert ids[0] == int(np.lexsort((np.arange(n), -rel))[0])
    for i, s in out:
        assert s <= 0.5 * rel[i] + 1e-12


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_bq_sign_packing_roundtrip(seed):
    """The two-word sign-bit packing (plans/vecpipe2) is a bijection on
    sign patterns, and XOR+popcount Hamming equals the direct sign-
    mismatch count — pure python replay of the exact 2^j arithmetic
    both engines execute."""
    rng = np.random.RandomState(seed)
    V = rng.normal(size=(4, 64))
    V[rng.rand(4, 64) < 0.1] = 0.0  # exact zeros hit the > 0 boundary

    def pack(v):
        w0 = sum((1 << j) for j in range(32) if v[j] > 0)
        w1 = sum((1 << j) for j in range(32) if v[j + 32] > 0)
        return w0, w1

    words = [pack(v) for v in V]
    for (a0, a1), va in zip(words, V):
        # roundtrip: bits recover the sign pattern exactly
        bits = [(a0 >> j) & 1 for j in range(32)] + [(a1 >> j) & 1 for j in range(32)]
        assert bits == [int(x > 0) for x in va]
    for i in range(4):
        for j in range(4):
            a0, a1 = words[i]
            b0, b1 = words[j]
            ham = bin(a0 ^ b0).count("1") + bin(a1 ^ b1).count("1")
            want = int(((V[i] > 0) != (V[j] > 0)).sum())
            assert ham == want
            if i == j:
                assert ham == 0


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(6, 60))
def test_substring_span_invariants(seed, n_tok):
    """Gaps-and-islands span merge (plans/textpipe t_substring_spans
    semantics): spans are maximal (no two adjacent), ordered, within
    position bounds, and their union covers exactly the duplicated
    positions."""
    from collections import Counter

    K = 8
    rng = np.random.RandomState(seed)
    # small vocab → plenty of repeated K-grams
    docs = [[f"w{v}" for v in rng.randint(0, 4, n_tok)] for _ in range(3)]
    counts = Counter()
    pos = {}
    for d, tk in enumerate(docs):
        row = [(i, tuple(tk[i - 1 : i - 1 + K])) for i in range(1, len(tk) - K + 2)]
        pos[d] = row
        counts.update(h for _, h in row)
    for d, row in pos.items():
        dup = [i for i, h in row if counts[h] >= 2]
        spans = []
        if dup:
            start = prev = dup[0]
            for i in dup[1:]:
                if i == prev + 1:
                    prev = i
                else:
                    spans.append((start, prev))
                    start = prev = i
            spans.append((start, prev))
        covered = set()
        last_b = None
        for a, b in spans:
            assert 1 <= a <= b <= len(docs[d]) - K + 1
            if last_b is not None:
                assert a > last_b + 1  # maximality: a gap separates spans
            last_b = b
            covered |= set(range(a, b + 1))
        assert covered == set(dup)
