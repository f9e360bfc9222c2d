"""Multimodal (binary-column) queries over text-backed blobs.

The blob payloads are UTF-8-encoded document text (no codec libs ship
here — see daxos_spark/multimodal), so the binary plumbing is fully
oracle-checkable: duckdb's encode()/octet_length/md5 agree byte-for-
byte with Spark's encode/octet_length/md5.

q_frame_counts is the interesting one: the Spark side runs the REAL
mapInPandas frame fan-out operator and counts its output; the oracle
computes the expected frame count arithmetically — so the gate checks
the distributed fan-out, not just column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..multimodal.columns import attach_blob, sample_frames
from .registry import QuerySpec, register

_FRAME_BYTES = 256
_STRIDE = 2


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        register(QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=("multimodal",)))
        return fn

    return deco


# --------------------------------------------------------------------------
# blob metadata stats — binary length + content hash per source bucket.
@_q(
    "m_blob_stats",
    """
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           COUNT(DISTINCT md5(text)) AS n_distinct
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def m_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    assets = attach_blob(d, "doc_id", "text", mime="text/plain")
    j = assets.join(d.select(F.col("doc_id").alias("asset_id"), "source"), "asset_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
            F.max(F.col("meta.n_bytes")).alias("max_bytes"),
            F.countDistinct(F.md5("blob")).alias("n_distinct"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# frame fan-out counts — REAL mapInPandas frame sampler on the Spark
# side; arithmetic expectation on the oracle side.
@_q(
    "m_frame_counts",
    f"""
    SELECT source,
           CAST(SUM(CEIL(CEIL(octet_length(encode(text)) / {_FRAME_BYTES}.0) / {_STRIDE}.0)) AS BIGINT)
             AS n_frames,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def m_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    assets = attach_blob(d, "doc_id", "text")
    frames = sample_frames(assets, frame_bytes=_FRAME_BYTES, stride=_STRIDE)
    per_asset = frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("nf"))
    sizes = assets.select("asset_id", F.col("meta.n_bytes").alias("nb"))
    j = (
        per_asset.join(sizes, "asset_id")
        .join(d.select(F.col("doc_id").alias("asset_id"), "source"), "asset_id")
    )
    return (
        j.groupBy("source")
        .agg(F.sum("nf").alias("n_frames"), F.sum("nb").alias("total_bytes"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# resize fan-in — REAL mapInPandas byte-stride resize on the Spark side;
# ceil-arithmetic byte expectation on the oracle side.
@_q(
    "m_resize_bytes",
    """
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(CAST(CEIL(octet_length(encode(text)) / 4.0) AS BIGINT)) AS BIGINT)
             AS resized_bytes,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS original_bytes
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def m_resize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import resize_blob

    d = load_tables(spark, sf_dir)["documents"]
    assets = attach_blob(d, "doc_id", "text")
    small = resize_blob(assets, factor=4)
    j = small.join(
        assets.select("asset_id", F.col("meta.n_bytes").alias("orig")), "asset_id"
    ).join(d.select(F.col("doc_id").alias("asset_id"), "source"), "asset_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("resized_bytes"),
            F.sum("orig").alias("original_bytes"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# feature-extraction fan-in — REAL vectorized byte-histogram extractor;
# the oracle checks the Σhistogram == Σbytes invariant per source.
@_q(
    "m_byte_histogram",
    """
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_binned
    FROM documents
    GROUP BY source ORDER BY source
    """,
)
def m_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.columns import byte_histogram

    d = load_tables(spark, sf_dir)["documents"]
    assets = attach_blob(d, "doc_id", "text")
    feats = byte_histogram(assets, n_buckets=8)
    j = feats.join(d.select(F.col("doc_id").alias("asset_id"), "source"), "asset_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("total_binned").alias("total_binned"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# magic-byte MIME sniffing — the first pass any multimodal ingest runs
# over opaque binary columns: classify each asset by its leading bytes
# before routing to a decoder. Headers here are planted deterministically
# (doc_id % 4 picks PNG/JPEG/GIF/PDF) so the duckdb twin reproduces the
# corpus; the sniff itself reads only the first 4 bytes of the blob —
# at 100 TB this runs as a map-side projection over the binary column
# with no shuffle until the tiny per-MIME rollup.
_MAGIC = [
    ("89504E47", "image/png"),
    ("FFD8FFE0", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
]


@_q(
    "m_magic_sniff",
    f"""
    WITH b AS (
      SELECT doc_id,
             unhex(CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN '{_MAGIC[0][0]}' WHEN 1 THEN '{_MAGIC[1][0]}'
                     WHEN 2 THEN '{_MAGIC[2][0]}' ELSE '{_MAGIC[3][0]}' END)
               || encode(text) AS blob
      FROM documents
    )
    SELECT CASE UPPER(substr(hex(blob), 1, 8))
             WHEN '{_MAGIC[0][0]}' THEN '{_MAGIC[0][1]}'
             WHEN '{_MAGIC[1][0]}' THEN '{_MAGIC[1][1]}'
             WHEN '{_MAGIC[2][0]}' THEN '{_MAGIC[2][1]}'
             WHEN '{_MAGIC[3][0]}' THEN '{_MAGIC[3][1]}'
             ELSE 'application/octet-stream' END AS mime,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes
    FROM b GROUP BY 1 ORDER BY 1
    """,
    doc="magic-byte MIME sniff over binary asset columns (map-side, 4-byte read)",
)
def m_magic_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    hdr = F.when(F.pmod("doc_id", F.lit(4)) == 0, F.lit(_MAGIC[0][0]))
    for i in (1, 2):
        hdr = hdr.when(F.pmod("doc_id", F.lit(4)) == i, F.lit(_MAGIC[i][0]))
    hdr = hdr.otherwise(F.lit(_MAGIC[3][0]))
    blob = F.concat(F.unhex(hdr), F.encode(F.col("text"), "UTF-8"))
    head = F.upper(F.substring(F.hex(blob), 1, 8))
    mime = F.when(head == _MAGIC[0][0], F.lit(_MAGIC[0][1]))
    for i in (1, 2, 3):
        mime = mime.when(head == _MAGIC[i][0], F.lit(_MAGIC[i][1]))
    mime = mime.otherwise(F.lit("application/octet-stream"))
    return (
        d.select(mime.alias("mime"), F.octet_length(blob).alias("nb"))
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("nb").alias("total_bytes"),
        )
        .orderBy("mime")
    )
