"""Multimodal binary-column plumbing: attach, decode stub, frame fan-out."""

from __future__ import annotations

from daxos_spark.multimodal.columns import (
    _decode_fake,
    attach_blob,
    decode_image_stats,
    sample_frames,
)


def _assets(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 600), (3, ""), (4, "Zürich €42")],
        "doc_id long, text string",
    )
    return attach_blob(df, "doc_id", "text", mime="text/plain")


def test_attach_blob_schema_and_meta(spark):
    a = _assets(spark)
    assert [f.name for f in a.schema.fields] == ["asset_id", "blob", "meta"]
    rows = {r["asset_id"]: r for r in a.collect()}
    assert bytes(rows[1]["blob"]) == b"hello world"
    assert rows[1]["meta"]["n_bytes"] == 11
    assert rows[4]["meta"]["n_bytes"] == len("Zürich €42".encode())  # multibyte
    assert rows[3]["meta"]["n_bytes"] == 0


def test_decode_stats_deterministic_and_batched(spark):
    a = _assets(spark).repartition(3)  # force multiple Arrow batches/partitions
    out = {r["asset_id"]: r for r in decode_image_stats(a).collect()}
    assert set(out) == {1, 2, 3, 4}
    for aid in out:
        assert out[aid]["decoder"] in ("fake", "pillow")
    # fake decoder is a pure function of the bytes
    w, h, luma, _ = _decode_fake(b"hello world")
    assert out[1]["width"] == w and out[1]["height"] == h
    assert abs(out[1]["mean_luma"] - luma) < 1e-12


def test_sample_frames_fanout_counts(spark):
    a = _assets(spark)
    frames = sample_frames(a, frame_bytes=256, stride=2).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 600 bytes → 3 frames (256,256,88) → stride 2 keeps idx 0,2
    assert sorted(r["frame_idx"] for r in by_asset[2]) == [0, 2]
    assert sorted(r["frame_bytes"] for r in by_asset[2]) == [88, 256]
    # 11 bytes → 1 frame
    assert [r["frame_bytes"] for r in by_asset[1]] == [11]
    # empty blob → no frames
    assert 3 not in by_asset
    # frame payloads reassemble the original prefix
    fr0 = next(r for r in by_asset[2] if r["frame_idx"] == 0)
    assert bytes(fr0["frame"]) == b"x" * 256


def test_resize_blob_exact_bytes(spark):
    import pandas as pd
    from daxos_spark.multimodal.columns import attach_blob, resize_blob

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["abcdefghij", "xyz"]})
    assets = attach_blob(spark.createDataFrame(pdf), "doc_id", "text")
    got = {r["asset_id"]: bytes(r["blob"]) for r in resize_blob(assets, factor=3).collect()}
    assert got == {1: b"adgj", 2: b"x"}


def test_byte_histogram_matches_python(spark):
    import numpy as np
    import pandas as pd
    from daxos_spark.multimodal.columns import attach_blob, byte_histogram

    texts = ["hello world", "AAAAaaaa", "0123456789"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    assets = attach_blob(spark.createDataFrame(pdf), "doc_id", "text")
    got = {r["asset_id"]: r["features"] for r in byte_histogram(assets, 8).collect()}
    for i, t in enumerate(texts):
        arr = np.frombuffer(t.encode(), dtype=np.uint8)
        want = np.bincount(arr // 32, minlength=8)[:8].tolist()
        assert got[i] == want, t
        assert sum(got[i]) == len(t.encode())


def test_cdc_chunks_content_defined_property(spark):
    """The property CDC exists for: chunk boundaries are functions of
    local content, so prepending bytes re-chunks only the prefix — the
    downstream chunk hashes are unchanged (fixed-size chunking would
    shift every one). Verified with a python replay of the same
    window-hash rule, plus the engine row for the real corpus."""
    import hashlib

    from daxos_spark.plans.blobpipe import _CDC_D, _CDC_W, m_cdc_chunks

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    def chunks(text: str) -> list[str]:
        cuts = {1, len(text) + 1}
        for i in range(2, len(text) - _CDC_W + 2):
            if h(text[i - 1 : i - 1 + _CDC_W]) % _CDC_D == 0:
                cuts.add(i)
        cs = sorted(cuts)
        return [text[a - 1 : b - 1] for a, b in zip(cs, cs[1:])]

    base = "the quick brown fox jumps over the lazy dog " * 8
    # regression: chunks("") must be [] (the oracle's range(1,1)), and
    # the Spark plan below must not crash on an empty-text document
    assert chunks("") == []
    edited = "INSERTED PREFIX " + base
    cb, ce = chunks(base), chunks(edited)
    # all but the first O(1) chunks survive the edit with identical
    # content AND order: the edited stream's chunk sequence ends with
    # the base's sequence minus its first chunk
    assert len(cb) > 3
    assert ce[-(len(cb) - 1):] == cb[1:]

    # engine output matches the replay on the real corpus (per source)
    import pandas as pd

    rows = {r.source: r for r in m_cdc_chunks(spark, "/root/testdata/sf0.001").collect()}
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    for src, g in docs.groupby("source"):
        n_chunks, uniq, total = 0, set(), 0
        for txt in g["text"]:
            cs = chunks(txt)
            n_chunks += len(cs)
            uniq |= {h(c) for c in cs}
            total += sum(len(c) for c in cs)
        r = rows[src]
        assert (r.n_assets, r.n_chunks, r.n_unique_chunks, r.total_bytes) == (
            len(g),
            n_chunks,
            len(uniq),
            total,
        )


def test_cdc_chunks_empty_doc(spark, tmp_path):
    """An empty-text document must yield zero chunks, not crash: the
    unguarded sequence(1, size(cuts)-1) = sequence(1, 0) is DESCENDING
    in Spark and element_at(cuts, 0) raises. Both m_cdc_chunks and
    m_asset_neardup hit the same transform."""
    import os

    import pandas as pd

    from daxos_spark.plans.blobpipe import m_asset_neardup, m_cdc_chunks

    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(src, f), tmp_path / f)
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["", "alpha beta gamma delta " * 6, "a"],
            "lang": ["en"] * 3,
            "source": ["s0", "s0", "s1"],
            "n_chars": [0, 138, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    rows = {r.source: r for r in m_cdc_chunks(spark, str(tmp_path)).collect()}
    # empty doc contributes no chunks; the other s0 doc still counts
    assert rows["s0"].n_assets == 1  # countDistinct(doc_id) over chunk rows
    assert rows["s0"].n_chunks >= 1
    assert rows["s1"].n_chunks == 1  # single-char doc → one chunk "a"
    m_asset_neardup(spark, str(tmp_path)).collect()  # must not raise
