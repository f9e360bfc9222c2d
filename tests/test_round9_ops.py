"""Round-9 additions: the composed two-lane refinery configuration.
The duckdb hash gate proves cross-engine agreement; these prove the
SEMANTICS (lane widening must be a pure key-width change below the
collision horizon, and the second lane must really be there)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_refinery_lane2_identical_below_collision_horizon(spark):
    """t_refinery_lane2 == t_refinery_linear row-for-row at test
    cardinalities: the 112-bit ExactSubstr keys change NOTHING except
    collision resistance (no 56-bit gram collisions exist here, so any
    funnel-count difference would mean the second lane altered the
    repeat-detection semantics)."""
    from daxos_spark.plans.textpipe import t_refinery_lane2, t_refinery_linear

    lin = {
        (r["stage"], r["stage_name"], r["n_docs"], r["n_tokens"])
        for r in t_refinery_linear(spark, SF_DIR).collect()
    }
    l2 = {
        (r["stage"], r["stage_name"], r["n_docs"], r["n_tokens"])
        for r in t_refinery_lane2(spark, SF_DIR).collect()
    }
    assert lin == l2
    assert len(lin) == 5
    # a real funnel: monotone non-increasing survivor counts by stage
    by_stage = sorted(lin)
    docs = [t[2] for t in by_stage]
    assert docs == sorted(docs, reverse=True)


def test_two_lane_position_stream_carries_both_md5_lanes(spark):
    """The two lanes must be the two 56-bit halves of ONE md5 digest of
    the K-gram text (the _jaccard_edge_pairs convention) — verified
    against a python replay on a tiny frame."""
    import hashlib

    from pyspark.sql import functions as F

    from daxos_spark.plans.textpipe import _SS_K, _ss_position_stream

    toks = [f"w{i % 3}" for i in range(_SS_K + 2)]
    d = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id int, text string"
    )
    _t, pos1 = _ss_position_stream(d, persist=False)
    _t, pos2 = _ss_position_stream(d, persist=False, two_lane=True)
    assert "h2" not in pos1.columns
    rows = {r["i"]: (r["h"], r["h2"]) for r in pos2.collect()}
    assert len(rows) == 3  # positions 1..n-K+1
    for i, (h, h2) in rows.items():
        gram = " ".join(toks[i - 1 : i - 1 + _SS_K])
        hx = hashlib.md5(gram.encode()).hexdigest()
        assert h == int(hx[:14], 16)
        assert h2 == int(hx[14:28], 16)
    # single-lane h is the same first lane (md5_long convention)
    one = {r["i"]: r["h"] for r in pos1.collect()}
    assert one == {i: h for i, (h, _h2) in rows.items()}
