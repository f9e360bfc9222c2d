"""Structured Streaming pipelines: incremental result == batch result.

Each test drains the file-source stream with trigger(availableNow=True)
into a memory sink and compares against the same transformation run in
plain batch mode on the same data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daxos_spark.catalog import load_tables
from daxos_spark.streaming.pipelines import (
    dedup_events_stream,
    hourly_event_counts,
    read_events_stream,
    run_to_memory,
    session_stats,
    user_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_tables(spark, SF_DIR)["events"].cache()


def test_hourly_counts_stream_matches_batch(spark, batch_events):
    stream = read_events_stream(spark, SF_DIR)
    # complete mode: append would hold back windows the watermark hasn't
    # passed yet (the last 2h of data would be missing at end-of-stream)
    run_to_memory(hourly_event_counts(stream), "t_hourly", output_mode="complete")
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.table("t_hourly").collect()
    }
    want = {
        (r["hour"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_stats_stream_matches_batch(spark, batch_events):
    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(session_stats(stream), "t_sessions", output_mode="complete")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("t_sessions").collect()
    )
    want = sorted(
        (r["user_id"], r["sw"]["start"], r["sw"]["end"], r["n"])
        for r in batch_events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_dedup_stream_drops_duplicate_ids(spark, tmp_path):
    # two copies of the same file → every event_id arrives twice
    import shutil

    d = tmp_path / "dup"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events2.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from daxos_spark.streaming.pipelines import RAW_EVENT_SCHEMA

    raw = (
        spark.readStream.schema(RAW_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    run_to_memory(dedup_events_stream(raw), "t_dedup", output_mode="append")
    n_unique = spark.table("t_dedup").count()
    n_batch = load_tables(spark, SF_DIR)["events"].count()
    assert n_unique == n_batch  # each id kept exactly once despite 2× input


def test_user_running_totals_final_state_matches_batch(spark, batch_events):
    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(user_running_totals(stream), "t_totals", output_mode="update")
    # update mode emits one row per user per micro-batch; the final
    # (max n_events) row per user is the end state
    final = (
        spark.table("t_totals")
        .groupBy("user_id")
        .agg(F.max_by("total_value", "n_events").alias("total_value"), F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, batch_events):
    from daxos_spark.streaming.pipelines import views_after_errors_stream

    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(views_after_errors_stream(stream), "t_ssj", output_mode="append")
    got = sorted(
        (r["e_id"], r["v_id"]) for r in spark.table("t_ssj").collect()
    )
    e = batch_events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu"), F.col("ts").alias("ets"), F.col("event_id").alias("eid")
    )
    v = batch_events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    want = sorted(
        (r["eid"], r["vid"])
        for r in e.join(
            v,
            (F.col("vu") == F.col("eu"))
            & (F.col("vts") > F.col("ets"))
            & (F.col("vts") <= F.col("ets") + F.expr("INTERVAL 5 MINUTES")),
        ).collect()
    )
    assert got == want
    assert len(got) > 0


def test_foreachbatch_gold_ingest_idempotent(spark, tmp_path, batch_events):
    import shutil

    from daxos_spark.streaming.pipelines import RAW_EVENT_SCHEMA, run_gold_ingest

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events_dup.parquet")  # replay

    gold = str(tmp_path / "gold")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(RAW_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    run_gold_ingest(stream, gold, str(tmp_path / "ckpt"))

    landed = spark.read.parquet(gold)
    n_src = batch_events.count()
    assert landed.count() == n_src  # 2x input, 1x landed
    assert landed.select("event_id").distinct().count() == n_src

    # a second full run (new checkpoint → full replay) adds nothing
    run_gold_ingest(stream, gold, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(gold).count() == n_src


def test_stream_static_enrichment_matches_batch(spark, batch_events):
    """Stream-static broadcast join + aggregation: incremental result
    over the drained stream equals the same plan in batch mode."""
    from daxos_spark.streaming.pipelines import enrich_events_stream

    user_dim = (
        batch_events.select("user_id")
        .distinct()
        .withColumn("cohort", F.concat(F.lit("c"), (F.col("user_id") % 3).cast("string")))
        .cache()
    )
    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(
        enrich_events_stream(stream, user_dim), "t_enriched", output_mode="complete"
    )
    got = {
        (r["user_cohort"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in spark.table("t_enriched").collect()
    }
    want = {
        (r["user_cohort"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
        for r in enrich_events_stream(batch_events, user_dim).collect()
    }
    assert got == want
    assert len(got) == 15  # 3 cohorts × 5 event types


def test_dedup_against_corpus_stream_matches_batch(spark, tmp_path):
    """Streaming incremental dedup (stream-static anti-join + in-stream
    first-occurrence) == the batch d_incremental_dedup admission set."""
    import pandas as pd

    from daxos_spark.functions.text import fingerprint
    from daxos_spark.streaming.pipelines import dedup_against_corpus_stream

    # corpus index: fingerprints of docs 0..4; arriving batch: docs
    # 5..11 where 6 duplicates corpus doc 1, and 9/10 duplicate each
    # other (first occurrence 9 wins)
    texts = {
        0: "alpha beta", 1: "gamma delta", 2: "eps zeta", 3: "eta theta",
        4: "iota kappa",
        5: "lambda mu", 6: "gamma delta", 7: "nu xi", 8: "omicron pi",
        9: "rho sigma", 10: "rho sigma", 11: "tau upsilon",
    }
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(5), "text": [texts[i] for i in range(5)]})
    ).select(fingerprint(F.col("text")).alias("fp"))
    batch_dir = str(tmp_path / "arriving")
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(5, 12), "text": [texts[i] for i in range(5, 12)]}
        )
    ).write.parquet(batch_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(batch_dir)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
    )
    run_to_memory(
        dedup_against_corpus_stream(stream, corpus, unbounded_ok=True),
        "incdedup",
        output_mode="append",
    )
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM incdedup").collect()}
    # 6 dropped (corpus dup); one of 9/10 dropped (in-batch dup)
    assert 5 in got and 7 in got and 8 in got and 11 in got
    assert 6 not in got
    assert len(got & {9, 10}) == 1
    assert len(got) == 5


def test_ivf_assign_stream_matches_batch(spark, tmp_path):
    """Streaming IVF bucket assignment (stateless folded argmax) ==
    batch assign_buckets (window argmax) on the same vectors."""
    from daxos_spark.functions.similarity import assign_buckets, label_centroids
    from daxos_spark.streaming.pipelines import ivf_assign_stream

    emb = load_tables(spark, SF_DIR)["embeddings"]
    cents = label_centroids(emb).cache()
    want = {
        r["vec_id"]: r["bucket"] for r in assign_buckets(emb, cents).collect()
    }

    vec_dir = str(tmp_path / "vecs")
    emb.write.parquet(vec_dir)
    stream = spark.readStream.schema(emb.schema).parquet(vec_dir)
    run_to_memory(ivf_assign_stream(stream, cents), "ivfassign", output_mode="append")
    got = {
        r["vec_id"]: r["bucket"]
        for r in spark.sql("SELECT vec_id, bucket FROM ivfassign").collect()
    }
    assert got == want


def test_read_events_stream_empty_dir_fails_loudly(spark, tmp_path):
    """An arriving-files dir with no file yet cannot be type-sniffed:
    constructing the stream must fail at setup with a clear message,
    not misread the first file at runtime (round-2 ADVICE)."""
    empty = str(tmp_path / "arriving")
    import os

    os.makedirs(empty, exist_ok=True)
    with pytest.raises(ValueError, match="cannot be sniffed"):
        read_events_stream(spark, empty)


def test_read_events_stream_empty_dir_explicit_optin(spark, tmp_path):
    """With assume_nanos_if_empty=True the stream constructs against an
    empty dir using the harness TIMESTAMP(NANOS) layout."""
    empty = str(tmp_path / "arriving2")
    import os

    os.makedirs(empty, exist_ok=True)
    stream = read_events_stream(spark, empty, assume_nanos_if_empty=True)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def _write_micros_events(spark, dirpath: str) -> None:
    """Rewrite the sf0.001 events as a micros-precision (INT64
    TIMESTAMP(MICROS) physical) single FILE ``dirpath/events.parquet``
    — the harness layout the stream's pathGlobFilter expects."""
    import glob
    import os
    import shutil

    ev = load_tables(spark, SF_DIR)["events"]
    old = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    tmp = dirpath + "__tmp"
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(tmp)
    finally:
        if old:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old)
    os.makedirs(dirpath, exist_ok=True)
    (part,) = glob.glob(tmp + "/part-*.parquet")
    shutil.move(part, os.path.join(dirpath, "events.parquet"))
    shutil.rmtree(tmp)


def test_read_events_stream_micros_layout(spark, tmp_path, batch_events):
    """The sniff's OTHER branch: a micros-precision first file must
    stream through EVENT_SCHEMA (plain timestamp, no nanos restore) and
    produce identical hourly counts to the nanos-layout harness stream
    (round-3 ADVICE: a micros-layout first file, actually exercised)."""
    d = str(tmp_path / "micros")
    _write_micros_events(spark, d)
    stream = read_events_stream(spark, d)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    run_to_memory(hourly_event_counts(stream), "t_hourly_micros", output_mode="complete")
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.table("t_hourly_micros").collect()
    }
    want = {
        (r["hour"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_read_events_stream_optin_micros_first_file_fails_loudly(spark, tmp_path):
    """assume_nanos_if_empty=True assumes the harness nanos layout; if
    the FIRST arriving file is micros-precision instead, processing
    must fail loudly (Spark's parquet reader raises a column-type
    mismatch) — never silently misparse micros as nanos (which would
    shift every timestamp ~1000x)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    d = str(tmp_path / "arriving_micros")
    import os

    os.makedirs(d, exist_ok=True)
    stream = read_events_stream(spark, d, assume_nanos_if_empty=True)
    _write_micros_events(spark, d)
    q = (
        hourly_event_counts(stream)
        .writeStream.format("memory")
        .queryName("t_micros_mismatch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(
        StreamingQueryException, match="too small for the TIMESTAMP\\(NANOS\\) layout"
    ):
        q.awaitTermination()


def test_cms_counts_stream_matches_batch(spark, tmp_path):
    """Streaming CMS counters (complete mode, state = the d x w matrix)
    == the batch sketch build on the same documents."""
    import hashlib
    from collections import Counter

    from daxos_spark.streaming.pipelines import cms_counts_stream

    docs = load_tables(spark, SF_DIR)["documents"]
    doc_dir = str(tmp_path / "docs")
    docs.select("doc_id", "text").write.parquet(doc_dir)

    d_rows, w = 4, 1024
    pdf = docs.select("text").toPandas()
    want: Counter = Counter()
    for txt in pdf["text"]:
        for tk in txt.strip().lower().split():
            for i in range(d_rows):
                bk = int(hashlib.md5(f"{tk}#{i}".encode()).hexdigest()[:14], 16) % w
                want[(i, bk)] += 1

    stream = spark.readStream.schema("doc_id long, text string").parquet(doc_dir)
    run_to_memory(
        cms_counts_stream(stream, d_rows=d_rows, w=w), "cmsstream",
        output_mode="complete",
    )
    got = {
        (r["row_i"], r["bk"]): r["c"]
        for r in spark.sql("SELECT row_i, bk, c FROM cmsstream").collect()
    }
    assert got == dict(want)
    # state bound: at most d*w counter rows
    assert len(got) <= d_rows * w


def test_split_route_stream_inherits_and_hashes(spark, tmp_path):
    """Arriving docs with a known fingerprint inherit the frozen split;
    new fingerprints get the deterministic hash split — identical to
    the batch expression on the same rows."""
    import hashlib

    from daxos_spark.streaming.pipelines import split_route_stream

    index = spark.createDataFrame(
        [(100, "test"), (200, "train")], "fp long, split string"
    )
    arriving = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 555), (4, 777)], "doc_id long, fp long"
    )
    doc_dir = str(tmp_path / "arrivals")
    arriving.write.parquet(doc_dir)
    stream = spark.readStream.schema("doc_id long, fp long").parquet(doc_dir)
    run_to_memory(split_route_stream(stream, index), "routed", output_mode="append")
    got = {
        r["doc_id"]: r["split"]
        for r in spark.sql("SELECT doc_id, split FROM routed").collect()
    }
    def fresh(fp):
        h = int(hashlib.md5(str(fp).encode()).hexdigest()[:14], 16)
        return "train" if h % 10 < 8 else "test"
    assert got[1] == "test" and got[2] == "train"  # inherited, not re-hashed
    assert got[3] == fresh(555) and got[4] == fresh(777)


def test_split_route_stream_inherited_flag(spark, tmp_path):
    from daxos_spark.streaming.pipelines import split_route_stream

    index = spark.createDataFrame([(100, "test")], "fp long, split string")
    arriving = spark.createDataFrame([(1, 100), (2, 555)], "doc_id long, fp long")
    d = str(tmp_path / "arr2"); arriving.write.parquet(d)
    stream = spark.readStream.schema("doc_id long, fp long").parquet(d)
    run_to_memory(split_route_stream(stream, index), "routed2", output_mode="append")
    got = {r["doc_id"]: r["inherited"] for r in spark.sql("SELECT * FROM routed2").collect()}
    assert got == {1: True, 2: False}


def test_cusum_monitor_stream_matches_batch_recurrence(spark, tmp_path):
    """Streaming stateful CUSUM (applyInPandasWithState, state carried
    ACROSS micro-batches) == the literal batch recurrence on the same
    hourly series."""
    import math

    import numpy as np
    import pandas as pd

    from daxos_spark.streaming.pipelines import cusum_monitor_stream

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    hi = ev["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000
    h0, h1 = hi.min(), hi.max()
    c = np.zeros(h1 - h0 + 1)
    for h in hi:
        c[h - h0] += 1
    k = c.sum() / len(c)
    thr = 4.0 * math.sqrt(k)

    # two file-batches -> state must survive the batch boundary
    rows = [("s0", int(h0 + i), float(x)) for i, x in enumerate(c)]
    cutoff = len(rows) // 2
    d = str(tmp_path / "hours")
    import os

    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows[:cutoff], columns=["series", "hour_idx", "c"]).to_parquet(
        f"{d}/b0.parquet"
    )
    pd.DataFrame(rows[cutoff:], columns=["series", "hour_idx", "c"]).to_parquet(
        f"{d}/b1.parquet"
    )
    stream = spark.readStream.schema("series string, hour_idx long, c double").option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    run_to_memory(
        cusum_monitor_stream(stream, k=k, h=thr), "cusum_mon", output_mode="append"
    )
    got = {
        r["hour_idx"]: (r["s"], r["alarm"])
        for r in spark.sql("SELECT * FROM cusum_mon").collect()
    }
    s = 0.0
    for i, x in enumerate(c):
        s = max(0.0, s + x - k)
        hr = int(h0 + i)
        assert abs(got[hr][0] - s) < 1e-9
        assert got[hr][1] == int(s > thr)
    assert len(got) == len(c)


def test_cdc_upsert_stream_matches_batch_latest(spark, tmp_path, batch_events):
    """Streaming latest-wins upsert + tombstone (3 micro-batches with
    each user's changes scattered across them) == batch latest_by_key."""
    from daxos_spark.operators.temporal import latest_by_key
    from daxos_spark.streaming.pipelines import cdc_upsert_stream

    # slice the changelog by pmod(event_id, 3) so a key's changes arrive
    # out of ts order across batches — cross-batch state must override
    ev_dir = str(tmp_path / "cdc_events")
    for i in range(3):
        batch_events.filter(F.pmod("event_id", F.lit(3)) == i).write.parquet(
            f"{ev_dir}/slice={i}"
        )
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(ev_dir)
    )
    run_to_memory(cdc_upsert_stream(stream), "t_cdc_upsert", output_mode="update")

    got = {}
    for r in spark.table("t_cdc_upsert").collect():  # batch order: last wins
        got[r["user_id"]] = r
    want = {
        r["user_id"]: r
        for r in latest_by_key(
            batch_events, "user_id", ["ts", "event_id"], ["event_type", "value"]
        ).collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["event_type"] == w["event_type"], uid
        assert g["is_deleted"] == (w["event_type"] == "error"), uid
        if w["value"] is None:
            assert g["value"] is None, uid
        else:
            assert abs(g["value"] - w["value"]) < 1e-9, uid
    # at least one delete and one upsert exercised
    dels = [r for r in got.values() if r["is_deleted"]]
    assert dels and len(dels) < len(got)


def test_lateness_monitor_stream_matches_batch(spark, tmp_path, batch_events):
    """Per-user lateness counters across 3 event_id-contiguous
    micro-batches == the batch running-max computation in event_id
    order (the q_watermark_lateness per-user reading)."""
    from pyspark.sql.window import Window

    from daxos_spark.streaming.pipelines import lateness_monitor_stream

    # arrival order = a scrambled (but unique, deterministic) permutation
    # of event_id: the base corpus arrives ts-ordered per user, which
    # would leave nothing late — the scramble manufactures the disorder
    # a real feed shows while keeping the batch twin exact
    scrambled = batch_events.withColumn(
        "event_id",
        F.pmod(F.col("event_id") * 48271, F.lit(100003)) * 1000000 + F.col("event_id"),
    )
    hi = scrambled.agg(F.max("event_id")).first()[0]
    ev_dir = str(tmp_path / "late_events")
    cuts = [0, hi // 3, 2 * hi // 3, hi + 1]
    for i in range(3):
        scrambled.filter(
            (F.col("event_id") >= cuts[i]) & (F.col("event_id") < cuts[i + 1])
            # one part file per slice: maxFilesPerTrigger=1 replays each
            # micro-batch as exactly one event_id range, so the expected
            # arrival order is deterministic by construction (multi-part
            # slices would interleave by modification time)
        ).coalesce(1).write.parquet(f"{ev_dir}/slice={i}")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(ev_dir)
    )
    run_to_memory(lateness_monitor_stream(stream), "t_late_mon", output_mode="update")

    got = {}
    for r in spark.table("t_late_mon").collect():  # update mode: last row wins
        got[r["user_id"]] = (r["n_events"], r["n_late"], r["max_late_us"])

    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    late = (
        scrambled.select(
            "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        .withColumn("pmax", F.max("us").over(w))
        .select(
            "user_id",
            F.greatest(F.coalesce(F.col("pmax") - F.col("us"), F.lit(0)), F.lit(0)).alias(
                "lu"
            ),
        )
    )
    want = {
        r["user_id"]: (r["n"], r["nl"], r["ml"])
        for r in late.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("lu") > 0).cast("int")).cast("bigint").alias("nl"),
            F.max("lu").alias("ml"),
        )
        .collect()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) > 0  # disorder actually present


def test_hdr_latency_stream_matches_batch(spark, tmp_path, batch_events):
    """Per-user HDR bucket tables across 3 scrambled-arrival micro-
    batches == a python replay of the same arrival order with the same
    integer bucket math (and merged across users, the corpus sketch
    equals the merge of per-user sketches — the mergeability
    property)."""
    from daxos_spark.streaming.pipelines import hdr_latency_stream, run_to_memory

    scrambled = batch_events.withColumn(
        "event_id",
        F.pmod(F.col("event_id") * 48271, F.lit(100003)) * 1000000 + F.col("event_id"),
    )
    hi = scrambled.agg(F.max("event_id")).first()[0]
    ev_dir = str(tmp_path / "hdr_events")
    cuts = [0, hi // 3, 2 * hi // 3, hi + 1]
    for i in range(3):
        scrambled.filter(
            (F.col("event_id") >= cuts[i]) & (F.col("event_id") < cuts[i + 1])
            # one part file per slice: maxFilesPerTrigger=1 replays each
            # micro-batch as exactly one event_id range, so the expected
            # arrival order is deterministic by construction (multi-part
            # slices would interleave by modification time)
        ).coalesce(1).write.parquet(f"{ev_dir}/slice={i}")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(ev_dir)
    )
    run_to_memory(hdr_latency_stream(stream), "t_hdr_stream", output_mode="update")

    got: dict[int, tuple] = {}
    for r in spark.table("t_hdr_stream").collect():  # update mode: last wins
        got[r["user_id"]] = (
            list(zip(r["octs"], r["subs"], r["cnts"])),
            r["n_skipped"],
        )

    rows = (
        scrambled.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .orderBy("event_id")
        .collect()
    )
    mx: dict[int, int] = {}
    want_b: dict[int, dict] = {}
    want_skip: dict[int, int] = {}
    for r in rows:
        u, ts = r["user_id"], r["us"]
        if u not in mx:
            mx[u] = ts
            want_b.setdefault(u, {})
            want_skip.setdefault(u, 0)
        elif ts >= mx[u]:
            lat = ts - mx[u]
            if lat >= 1:
                o = lat.bit_length()
                s = (lat * 16) // (1 << (o - 1)) - 16
                want_b[u][(o, s)] = want_b[u].get((o, s), 0) + 1
            mx[u] = ts
        else:
            want_skip[u] += 1
    assert set(got) == set(want_b)
    for u in want_b:
        assert got[u][0] == sorted(
            (o, s, c) for (o, s), c in want_b[u].items()
        ), u
        assert got[u][1] == want_skip[u], u
    # mergeability: bucket-keyed sum across users == global replay
    merged: dict[tuple, int] = {}
    for u in got:
        for o, s, c in got[u][0]:
            merged[(o, s)] = merged.get((o, s), 0) + c
    want_m: dict[tuple, int] = {}
    for u in want_b:
        for k, c in want_b[u].items():
            want_m[k] = want_m.get(k, 0) + c
    assert merged == want_m


def test_hll_registers_stream_matches_batch(spark, tmp_path, batch_events):
    """Streaming HLL registers (complete mode, state = #keys x 256
    rows) == a python HLL register replay on the same events — and
    therefore == the batch q_hll_distinct register stage, which the
    replay in test_round9_ops pins to the same convention."""
    import hashlib

    from daxos_spark.streaming.pipelines import hll_registers_stream, run_to_memory

    ev_dir = str(tmp_path / "ev")
    batch_events.select("event_type", "user_id").write.parquet(ev_dir)

    want: dict = {}
    for r in batch_events.select("event_type", "user_id").collect():
        h = int(hashlib.md5(f"hll#{r['user_id']}".encode()).hexdigest()[:14], 16)
        reg, suf = h & 255, h >> 8
        rho = 49 if suf == 0 else 49 - suf.bit_length()
        k = (r["event_type"], reg)
        want[k] = max(want.get(k, 0), rho)

    stream = spark.readStream.schema("event_type string, user_id long").parquet(ev_dir)
    run_to_memory(
        hll_registers_stream(stream), "hllstream", output_mode="complete"
    )
    got = {
        (r["k"], r["reg"]): r["rho_max"]
        for r in spark.sql("SELECT k, reg, rho_max FROM hllstream").collect()
    }
    assert got == want
    # state bound: at most (#event types) x 256 register rows
    n_keys = batch_events.select("event_type").distinct().count()
    assert len(got) <= n_keys * 256


def test_simhash_neardup_stream_matches_batch(spark, tmp_path):
    """Streaming SimHash near-dup probe (stream-static band join +
    bit_count verify) == the same join run in batch, across multiple
    micro-batches, on the sf0.001 corpus split corpus/arrivals."""
    from daxos_spark.catalog import load_tables
    from daxos_spark.streaming.pipelines import (
        run_to_memory,
        simhash_corpus_index,
        simhash_neardup_stream,
    )

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 25)
    arriving = docs.filter(F.col("doc_id") >= 25)
    idx = simhash_corpus_index(corpus)
    idx.persist().count()

    batch = {
        (r["doc_id"], r["match_id"], r["hamming"])
        for r in simhash_neardup_stream(arriving, idx).collect()
    }

    arr_dir = str(tmp_path / "arriving_docs")
    # two files → two micro-batches with maxFilesPerTrigger=1
    arriving.filter(F.col("doc_id") < 38).coalesce(1).write.parquet(arr_dir)
    arriving.filter(F.col("doc_id") >= 38).coalesce(1).write.mode("append").parquet(
        arr_dir
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(arr_dir)
    )
    run_to_memory(
        simhash_neardup_stream(stream, idx, unbounded_ok=True),
        "simdup",
        output_mode="append",
    )
    got = {
        (r["doc_id"], r["match_id"], r["hamming"])
        for r in spark.sql("SELECT * FROM simdup").collect()
    }
    assert got == batch
    assert batch  # the corpus plants near-identical docs across the split
    idx.unpersist()


def test_streaming_dedup_state_contract(spark, tmp_path):
    """The state-bounding contract is LOUD: a streaming input without a
    watermark and without unbounded_ok=True is refused; a watermark
    bounds the dedup state via dropDuplicatesWithinWatermark and the
    results still match the unbounded run; batch inputs are exempt."""
    import pytest

    from daxos_spark.catalog import load_tables
    from daxos_spark.streaming.pipelines import (
        run_to_memory,
        simhash_corpus_index,
        simhash_neardup_stream,
    )

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 25)
    arriving = docs.filter(F.col("doc_id") >= 25)
    idx = simhash_corpus_index(corpus)
    idx.persist().count()

    arr_dir = str(tmp_path / "arriving_docs_wm")
    arriving.coalesce(1).write.parquet(arr_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(arr_dir)

    # refusal path: streaming + no watermark + no explicit opt-in
    with pytest.raises(ValueError, match="state grows without bound"):
        simhash_neardup_stream(stream, idx)

    # watermark path: event-time column bounds the dedup state; the
    # admitted set equals the batch (unbounded) run on the same docs
    wm_stream = stream.withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id"))
    )
    run_to_memory(
        simhash_neardup_stream(wm_stream, idx, watermark_col="ts"),
        "simdup_wm",
        output_mode="append",
    )
    got = {
        (r["doc_id"], r["match_id"], r["hamming"])
        for r in spark.sql("SELECT doc_id, match_id, hamming FROM simdup_wm").collect()
    }
    want = {
        (r["doc_id"], r["match_id"], r["hamming"])
        for r in simhash_neardup_stream(arriving, idx).collect()
    }
    assert got == want and want

    # batch inputs carry no streaming state — contract does not apply
    assert not simhash_neardup_stream(arriving, idx).isStreaming
    idx.unpersist()


def test_dedup_against_corpus_stream_refusal(spark, tmp_path):
    """dedup_against_corpus_stream refuses an unwatermarked unbounded
    stream unless the caller explicitly accepts unbounded state."""
    import pandas as pd
    import pytest

    from daxos_spark.functions.text import fingerprint
    from daxos_spark.streaming.pipelines import dedup_against_corpus_stream

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["alpha beta"]})
    ).select(fingerprint(F.col("text")).alias("fp"))
    batch_dir = str(tmp_path / "arr_refusal")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["gamma delta"]})
    ).write.parquet(batch_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(batch_dir)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
    )
    with pytest.raises(ValueError, match="dedup_against_corpus_stream"):
        dedup_against_corpus_stream(stream, corpus)


def test_html_extract_stream_matches_batch(spark, tmp_path):
    """Streaming HTML extraction (stateless jusText-lite projection) ==
    the same expressions in batch, across micro-batches, on pages
    synthesized from the sf0.001 documents via the htmlpipe template."""
    from daxos_spark.plans.htmlpipe import _html_spark
    from daxos_spark.streaming.pipelines import html_extract_stream, run_to_memory

    from daxos_spark.functions import text as T

    docs = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    pages = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("tk")
    ).select("doc_id", _html_spark().alias("html"))

    want = {
        (r["doc_id"], r["text"], r["n_blocks"], r["n_kept"], r["boiler_chars"])
        for r in html_extract_stream(pages).collect()
    }

    pg_dir = str(tmp_path / "pages")
    pages.filter(F.col("doc_id") < 25).coalesce(1).write.parquet(pg_dir)
    pages.filter(F.col("doc_id") >= 25).coalesce(1).write.mode("append").parquet(pg_dir)
    stream = (
        spark.readStream.schema("doc_id long, html string")
        .option("maxFilesPerTrigger", 1)
        .parquet(pg_dir)
    )
    run_to_memory(html_extract_stream(stream), "htmlex", output_mode="append")
    got = {
        (r["doc_id"], r["text"], r["n_blocks"], r["n_kept"], r["boiler_chars"])
        for r in spark.sql("SELECT * FROM htmlex").collect()
    }
    assert got == want
    assert all(n == 6 for _, _, n, _, _ in got)  # template: 6 non-empty blocks
    assert all(k <= 2 for _, _, _, k, _ in got)  # at most the 2 paragraphs kept
