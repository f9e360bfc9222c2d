"""asof_join (operators/temporal.py) vs a brute-force pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from daxos_spark.operators.temporal import asof_join


def _mk(spark, seed=3):
    rng = np.random.RandomState(seed)
    n_l, n_r = 80, 120
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_l),
            "lts": rng.randint(0, 1000, n_l).astype("int64"),
            "lval": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_r),
            "rts": rng.randint(0, 1000, n_r).astype("int64"),
            "rval": np.arange(n_r) * 10,
        }
    )
    return (
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        left,
        right,
    )


def _oracle(left: pd.DataFrame, right: pd.DataFrame, strict: bool) -> pd.DataFrame:
    out = []
    for _, lr in left.iterrows():
        cand = right[(right.k == lr.k)]
        cand = cand[cand.rts < lr.lts] if strict else cand[cand.rts <= lr.lts]
        if len(cand):
            # most recent; ties broken arbitrarily -> compare ts only
            best = cand.loc[cand.rts.idxmax()]
            out.append((lr.k, lr.lts, lr.lval, best.rts))
        else:
            out.append((lr.k, lr.lts, lr.lval, None))
    return pd.DataFrame(out, columns=["k", "lts", "lval", "rts_match"])


def test_asof_matches_bruteforce(spark):
    sl, sr, pl, pr = _mk(spark)
    got = (
        asof_join(sl, sr, on="k", left_ts="lts", right_ts="rts", suffix="_m")
        .select("k", "lts", "lval", "rts_m")
        .toPandas()
        .sort_values(["k", "lts", "lval"])
        .reset_index(drop=True)
    )
    want = _oracle(pl, pr, strict=False).sort_values(["k", "lts", "lval"]).reset_index(drop=True)
    assert len(got) == len(want) == len(pl)
    assert (got["rts_m"].isna() == want["rts_match"].isna()).all()
    mask = ~want["rts_match"].isna()
    assert (got.loc[mask, "rts_m"].astype("int64") == want.loc[mask, "rts_match"].astype("int64")).all()


def test_asof_strict_excludes_equal_ts(spark):
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({"k": [1, 1], "lts": [10, 20], "v": [0, 1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1, 1], "rts": [10, 15], "w": [100, 200]}))
    nonstrict = asof_join(left, right, "k", "lts", "rts").orderBy("lts").collect()
    strict = asof_join(left, right, "k", "lts", "rts", strict=True).orderBy("lts").collect()
    # lts=10: non-strict sees rts=10, strict sees nothing
    assert nonstrict[0]["rts_right"] == 10
    assert strict[0]["rts_right"] is None
    # lts=20: both see rts=15
    assert nonstrict[1]["rts_right"] == 15
    assert strict[1]["rts_right"] == 15


def test_asof_carries_right_payload(spark):
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lts": [50], "v": [7]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rts": [10, 40, 60], "w": [100, 200, 300]})
    )
    row = asof_join(left, right, "k", "lts", "rts").collect()[0]
    assert row["w_right"] == 200  # value at rts=40, the latest <= 50
    assert row["v"] == 7  # left payload preserved


def test_asof_null_keys_never_match(spark):
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1.0, None], "lts": [10, 10], "v": [0, 1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1.0, None], "rts": [5, 5], "w": [100, 200]})
    )
    rows = {r["v"]: r for r in asof_join(left, right, "k", "lts", "rts").collect()}
    assert rows[0]["w_right"] == 100  # real key matches
    assert rows[1]["w_right"] is None  # null key matches nothing


def test_trade_pagerank_matches_numpy(spark):
    """3-iteration damped PageRank vs a dense numpy replay on the same
    bidirectional trade graph (guards same-wrong-in-both-engines)."""
    import numpy as np
    import pandas as pd

    from daxos_spark.plans.relational2 import _PR_D, _PR_ITERS, q_trade_pagerank

    SF_DIR = "/root/testdata/sf0.001"
    rows = q_trade_pagerank(spark, SF_DIR).collect()

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")[["o_orderkey", "o_custkey"]]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    e = {(s * 2 + 1, c * 2) for s, c in zip(j["l_suppkey"], j["o_custkey"])}
    ee = list(e) + [(v, u) for u, v in e]
    nodes = sorted({u for u, _ in ee})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for u, _ in ee:
        deg[idx[u]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(_PR_ITERS):
        nxt = np.zeros(N)
        contrib = r / deg
        for u, v in ee:
            nxt[idx[v]] += contrib[idx[u]]
        r = (1.0 - _PR_D) / N + _PR_D * nxt
    want = sorted(
        ((int(np.floor(ri * 1e9)), n) for n, ri in zip(nodes, r)),
        key=lambda t: (-t[0], t[1]),
    )[: len(rows)]
    got = [(rw.rank_nano, rw.node) for rw in rows]
    # decimal(38,18) quantization vs float64: allow 1-nano drift per rank
    for (gr, gn), (wr, wn) in zip(got, want):
        assert gn == wn and abs(gr - wr) <= 1


def test_ab_ztest_matches_scipy_free_python(spark):
    """z and t statistics vs a from-scratch python replay (no scipy)."""
    import math

    import pandas as pd

    from daxos_spark.plans.relational2 import q_ab_ztest

    row = q_ab_ztest(spark, "/root/testdata/sf0.001").collect()[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    pu = ev.groupby("user_id").agg(
        n_purch=("event_type", lambda s: (s == "purchase").sum()),
        total_value=("value", "sum"),
    )
    mean_p = pu["n_purch"].sum() / len(pu)
    pu["conv"] = (pu["n_purch"] > mean_p).astype(int)
    pu["arm"] = pu.index % 2
    g = pu.groupby("arm")
    n = g.size()
    c = g["conv"].sum()
    sv = g["total_value"].sum()
    svv = g["total_value"].apply(lambda s: (s * s).sum())
    assert (row.n0, row.n1, row.c0, row.c1) == (n[0], n[1], c[0], c[1])
    p = (c[0] + c[1]) / (n[0] + n[1])
    z = (c[1] / n[1] - c[0] / n[0]) / math.sqrt(p * (1 - p) * (1 / n[0] + 1 / n[1]))
    var = lambda a: (svv[a] - sv[a] ** 2 / n[a]) / (n[a] - 1)
    t = (sv[1] / n[1] - sv[0] / n[0]) / math.sqrt(var(0) / n[0] + var(1) / n[1])
    assert abs(row.z_conversion - z) < 1e-4
    assert abs(row.t_value - t) < 1e-4


def test_copurchase_triangles_matches_networkx_free_python(spark):
    """Triangle/wedge counts vs a from-scratch python replay."""
    from itertools import combinations

    import pandas as pd

    from daxos_spark.plans.relational2 import q_copurchase_triangles

    row = q_copurchase_triangles(spark, "/root/testdata/sf0.001").collect()[0]

    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter

    pc: Counter = Counter()
    for _, g in op.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            pc[(a, b)] += 1
    edges = {e for e, n in pc.items() if n >= 2}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tri = sum(
        1 for a, b in edges for c in (adj[a] & adj[b]) if b < c
    )
    assert (row.n_edges, row.n_vertices, row.n_wedges, row.n_triangles) == (
        len(edges),
        len(adj),
        wedges,
        tri,
    )
    if wedges:
        assert row.clustering_micro == (3_000_000 * tri) // wedges


def test_ivm_merge_proof_zero_mismatch(spark):
    from daxos_spark.plans.relational2 import q_ivm_merge_proof

    rows = q_ivm_merge_proof(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # the query's own claim: incremental merge == full recompute
    assert all(r.n_mismatch == 0 for r in rows)

    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.groupby("user_id")
    assert len(rows) == len(g)
    for r in rows[:20]:
        grp = ev[ev.user_id == r.user_id]
        assert r.n == len(grp)
        assert abs(r.sum_value - grp["value"].sum()) < 1e-4


def test_touch_attribution_matches_python(spark):
    import pandas as pd

    from daxos_spark.plans.relational2 import _ATTR_WINDOW_US, q_touch_attribution

    rows = {r.channel: r for r in q_touch_attribution(spark, "/root/testdata/sf0.001").collect()}

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    # pandas stores datetime64[ns]; convert to exact epoch micros
    ev["us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
    conv = ev[ev.event_type == "purchase"]
    touch = ev[ev.event_type != "purchase"]
    want: dict = {}
    for _, c in conv.iterrows():
        t = touch[
            (touch.user_id == c.user_id)
            & (touch.us < c.us)
            & (touch.us >= c.us - _ATTR_WINDOW_US)
        ].sort_values(["us", "event_id"], ascending=[False, True])
        if not len(t):
            continue
        n = len(t)
        for i, (_, r) in enumerate(t.iterrows()):
            w = want.setdefault(r.event_type, [0, 0, 0])
            w[0] += i == 0
            w[1] += 1_000_000 // n
            w[2] += 1
    for ch, (lt, lc, np_) in want.items():
        r = rows[ch]
        assert (r.last_touch_convs, r.linear_credit_micro, r.n_touchpoints) == (lt, lc, np_)


def test_seasonal_decompose_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from daxos_spark.plans.relational2 import q_seasonal_decompose

    rows = {r.hour_of_day: r for r in q_seasonal_decompose(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= set(range(24))

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hi = (ev["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000)
    h0, h1 = hi.min(), hi.max()
    c = np.zeros(h1 - h0 + 1)
    for h in hi:
        c[h - h0] += 1
    s = pd.Series(c)
    trend = s.rolling(24, center=False).sum().shift(-11) / 24.0  # rows -12..+11
    det = s - trend
    hod = (np.arange(h0, h1 + 1)) % 24
    valid = ~trend.isna()
    for h in range(24):
        mask = valid & (hod == h)
        if not mask.any():
            continue
        r = rows[h]
        assert r.n_obs == int(mask.sum())
        assert abs(r.seasonal - det[mask].mean()) < 1e-4
    # seasonal components of a complete cycle set sum to ~0
    tot = sum(r.seasonal * r.n_obs for r in rows.values())
    n = sum(r.n_obs for r in rows.values())
    assert abs(tot / n) < 1.0


def test_cusum_drift_matches_sequential_python(spark):
    """The closed window form equals the literal sequential CUSUM
    recurrence s_t = max(0, s_{t-1} + x_t - k)."""
    import math

    import numpy as np
    import pandas as pd

    from daxos_spark.plans.relational2 import q_cusum_drift

    row = q_cusum_drift(spark, "/root/testdata/sf0.001").collect()[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hi = ev["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000
    h0, h1 = hi.min(), hi.max()
    c = np.zeros(h1 - h0 + 1)
    for h in hi:
        c[h - h0] += 1
    k = c.sum() / len(c)
    s, n_alarm, first, mx = 0.0, 0, None, 0.0
    for i, x in enumerate(c):
        s = max(0.0, s + x - k)
        mx = max(mx, s)
        if s > 4.0 * math.sqrt(k):
            n_alarm += 1
            if first is None:
                first = h0 + i
    assert row.n_hours == len(c)
    assert row.n_alarm_hours == n_alarm
    assert row.first_alarm_hour == first
    assert abs(row.max_excursion - mx) < 1e-6


def test_benford_audit_matches_python(spark):
    import math

    import pandas as pd

    from daxos_spark.plans.relational2 import q_benford_audit

    rows = {r.digit: r for r in q_benford_audit(spark, "/root/testdata/sf0.001").collect()}

    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    v = o[o.o_totalprice >= 1]["o_totalprice"]
    digits = v.map(lambda x: int(str(int(math.floor(x)))[0]))
    total = len(digits)
    from collections import Counter

    cnt = Counter(digits)
    for d in range(1, 10):
        if d not in rows:
            assert cnt.get(d, 0) == 0
            continue
        exp = total * math.log10(1 + 1 / d)
        r = rows[d]
        assert r.n == cnt[d]
        assert abs(r.expected - exp) < 1e-4
        assert abs(r.chi2_term - (cnt[d] - exp) ** 2 / exp) < 1e-3
    # synthetic uniform prices should FAIL Benford loudly
    chi2 = sum(r.chi2_term for r in rows.values())
    assert chi2 > 15.51  # chi2 0.95, 8 df


def test_ewma_forecast_matches_recurrence(spark):
    """The truncated closed form tracks the literal recurrence
    l_t = a*x_t + (1-a)*l_{t-1} to within the truncation mass."""
    import numpy as np
    import pandas as pd

    from daxos_spark.plans.relational2 import _EWMA_ALPHA, _EWMA_WIN, q_ewma_forecast

    row = q_ewma_forecast(spark, "/root/testdata/sf0.001").collect()[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    hi = ev["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000
    h0, h1 = hi.min(), hi.max()
    c = np.zeros(h1 - h0 + 1)
    for h in hi:
        c[h - h0] += 1
    # literal recurrence (untruncated, from l_0 = a*x_0 start)
    a = _EWMA_ALPHA
    lvl = np.zeros(len(c))
    lvl[0] = a * c[0]
    for i in range(1, len(c)):
        lvl[i] = a * c[i] + (1 - a) * lvl[i - 1]
    n_lv = len(c) - (_EWMA_WIN - 1)
    assert row.n_levels == n_lv
    # truncation: |closed_48 - recurrence| <= (1-a)^48 * max|x|
    tol = (1 - a) ** _EWMA_WIN * c.max() + 1e-4
    assert abs(row.last_level - lvl[-1]) < tol
    errs = [abs(c[i] - lvl[i - 1]) for i in range(_EWMA_WIN, len(c))]
    assert abs(row.mae - np.mean(errs)) < tol + 1e-3


def test_spearman_matches_scipy_free_python(spark):
    import pandas as pd

    from daxos_spark.plans.relational2 import q_spearman_orders_spend

    row = q_spearman_orders_spend(spark, "/root/testdata/sf0.001").collect()[0]

    o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    g = o.groupby("o_custkey").agg(
        n_orders=("o_orderkey", "count"), spend=("o_totalprice", "sum")
    ).reset_index()
    r1 = g.sort_values(["n_orders", "o_custkey"]).reset_index(drop=True)
    r1["rn_orders"] = r1.index + 1
    r2 = g.sort_values(["spend", "o_custkey"]).reset_index(drop=True)
    r2["rn_spend"] = r2.index + 1
    m = r1[["o_custkey", "rn_orders"]].merge(r2[["o_custkey", "rn_spend"]], on="o_custkey")
    d2 = int(((m.rn_orders - m.rn_spend) ** 2).sum())
    n = len(m)
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    assert (row.n, row.sum_d2) == (n, d2)
    assert abs(row.spearman_rho - rho) < 1e-6
    assert row.spearman_rho > 0.5  # more orders -> more spend, strongly


def test_ks_length_shift_matches_scipy_free_python(spark):
    import math

    import numpy as np
    import pandas as pd

    from daxos_spark.plans.relational2 import q_ks_length_shift

    row = q_ks_length_shift(spark, "/root/testdata/sf0.001").collect()[0]

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    v1 = [len(t.strip().lower().split()) for t in docs[docs.source == "src0"]["text"]]
    v2 = [len(t.strip().lower().split()) for t in docs[docs.source == "src1"]["text"]]
    n1, n2 = len(v1), len(v2)
    pooled = sorted(set(v1) | set(v2))
    mx = 0
    for x in pooled:
        c1 = sum(1 for a in v1 if a <= x)
        c2 = sum(1 for a in v2 if a <= x)
        mx = max(mx, abs(c1 * n2 - c2 * n1))
    assert (row.n1, row.n2, row.max_gap_scaled) == (n1, n2, mx)
    assert row.d_micro == (1_000_000 * mx) // (n1 * n2)
    d = mx / (n1 * n2)
    assert row.reject_05 == int(d > 1.36 * math.sqrt((n1 + n2) / (n1 * n2)))
