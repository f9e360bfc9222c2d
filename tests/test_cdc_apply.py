"""CDC changelog compaction: latest_by_key operator + q_cdc_apply.

The cross-engine hash is checked by tools/check_oracle.py; these pin
the MERGE semantics on a crafted changelog (update-then-delete hides a
key, delete-then-reinsert revives it) and prove the partial-aggregable
max(struct) picks the same row as the ROW_NUMBER formulation.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from daxos_spark.operators.temporal import latest_by_key
from daxos_spark.plans.diagnostics import q_cdc_apply

SF_DIR = "/root/testdata/sf0.001"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_latest_by_key_merge_semantics(spark):
    rows = [
        # key 1: insert → update → delete ⇒ final op is D
        (1, _ts(1), 10, "I", 1.0),
        (1, _ts(2), 11, "U", 2.0),
        (1, _ts(3), 12, "D", 0.0),
        # key 2: delete → reinsert ⇒ final op is I (revived)
        (2, _ts(1), 20, "D", 0.0),
        (2, _ts(2), 21, "I", 5.0),
        # key 3: two changes in the SAME timestamp — change id breaks
        # the tie, the larger id wins
        (3, _ts(1), 30, "U", 7.0),
        (3, _ts(1), 31, "U", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, cid int, op string, v double"
    )
    got = {
        r.k: (r.op, r.v)
        for r in latest_by_key(df, "k", ["ts", "cid"], ["op", "v"]).collect()
    }
    assert got == {1: ("D", 0.0), 2: ("I", 5.0), 3: ("U", 8.0)}


def test_latest_by_key_matches_row_number(spark):
    from daxos_spark.catalog import load_tables

    e = load_tables(spark, SF_DIR)["events"]
    via_agg = latest_by_key(e, "user_id", ["ts", "event_id"], ["event_type", "value"])
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    via_window = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    assert via_agg.exceptAll(via_window).count() == 0
    assert via_window.exceptAll(via_agg).count() == 0


def test_cdc_apply_partitions_users_exactly_once(spark):
    from daxos_spark.catalog import load_tables

    out = q_cdc_apply(spark, SF_DIR).collect()
    n_users = (
        load_tables(spark, SF_DIR)["events"].select("user_id").distinct().count()
    )
    # every user ends in exactly one bucket: a surviving type or deleted
    assert sum(r.n_users for r in out) == n_users
    deleted = [r for r in out if r.last_event_type == "__deleted__"]
    assert len(deleted) == 1 and deleted[0].value_sum == 0.0
    assert all(r.last_event_type != "error" for r in out)


def test_scd2_lookup_matches_python_replay(spark):
    """PIT lookup: exact replay of the quartile probes and the
    latest-change-before-probe resolve."""
    import math

    import pandas as pd

    from daxos_spark.catalog import load_tables
    from daxos_spark.plans.diagnostics import q_scd2_lookup

    ev = load_tables(spark, SF_DIR)["events"].select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "event_id"
    ).toPandas()
    mn, mx = int(ev["us"].min()), int(ev["us"].max())
    probes = {k: mn + int(math.floor((mx - mn) * k / 4.0)) for k in (1, 2, 3)}

    want = {}
    for uid, grp in ev.groupby("user_id"):
        rows = grp.sort_values(["us", "event_id"]).itertuples()
        changes = []
        prev = None
        for r in rows:
            if prev is None or r.event_type != prev:
                changes.append((int(r.us), int(r.event_id), r.event_type))
            prev = r.event_type
        for k, p in probes.items():
            eligible = [c for c in changes if c[0] <= p]
            if eligible:
                ts_us, _eid, st = max(eligible)
                want[(int(uid), k)] = (st, ts_us)
            else:
                want[(int(uid), k)] = (None, None)

    got = {(r["user_id"], r["k"]): (r["state"], r["since_us"])
           for r in q_scd2_lookup(spark, SF_DIR).collect()}
    assert got == want
