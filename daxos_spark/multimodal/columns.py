"""Binary-column operators: attach, decode, frame-sample.

Layout convention: one row per asset, ``blob: binary`` plus
``meta: struct<mime, n_bytes, ...>``. All per-blob compute runs in
``mapInPandas`` (Arrow-batched bytes → pandas, no per-row Python
round-trips); fan-out operators (frame sampling) emit multiple rows
per input row from the same iterator, which keeps peak memory at
one Arrow batch regardless of asset count.

Scale notes: blobs are opaque to Catalyst, so predicate pushdown works
on the metadata columns (filter on meta.n_bytes or mime never touches
blob bytes — parquet column pruning skips the binary chunk entirely).
Large assets should be size-capped per partition via
``spark.sql.files.maxPartitionBytes``; the decode stage is linear,
stateless, and embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("decoder", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)


def attach_blob(df: DataFrame, id_col: str, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Turn a string column into the standard (blob, meta) layout —
    the ingest shim used by tests and by any text-backed asset store."""
    blob = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        blob.alias("blob"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_real(buf: bytes):
    """Real image decode — requires pillow, which is not in this
    environment. Gated so the engine picks it up automatically when
    present."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    img = Image.open(io.BytesIO(buf)).convert("L")
    import numpy as np

    arr = np.asarray(img, dtype="float64")
    return img.width, img.height, float(arr.mean()), "pillow"


def _decode_fake(buf: bytes):
    """Deterministic stand-in decoder: derives (width, height,
    mean_luma) purely from the bytes so the distributed plumbing can be
    tested bit-for-bit without codec libraries. NOT an image decoder."""
    n = len(buf)
    width = max(1, n % 640)
    height = max(1, (n * 31) % 480)
    mean_luma = (sum(buf[:256]) / max(1, min(n, 256))) if n else 0.0
    return width, height, float(mean_luma), "fake"


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """Per-asset decode → (width, height, mean_luma) via mapInPandas.

    Uses pillow when importable, else the deterministic fake. The
    Arrow batch shape — bytes in, small fixed-width rows out — is the
    real production plumbing either way.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["blob"]):
                buf = bytes(buf)
                got = _decode_real(buf) or _decode_fake(buf)
                rows.append((int(aid), got[0], got[1], got[2], got[3]))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "mean_luma", "decoder"]
            )

    return assets.select("asset_id", "blob").mapInPandas(decode, PIXEL_STATS_SCHEMA)


def sample_frames(assets: DataFrame, frame_bytes: int = 256, stride: int = 2) -> DataFrame:
    """Fan a "video" blob out into every ``stride``-th fixed-size frame
    (1 input row → N output rows, streamed per Arrow batch).

    A real deployment would seek keyframes via a codec; the fixed-size
    slicing here exercises the identical fan-out plan shape (narrow
    transform, no shuffle, output rows >> input rows).
    """
    import pandas as pd

    def cut(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["blob"]):
                buf = bytes(buf)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append((int(aid), i, fr, len(fr)))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame", "frame_bytes"])

    return assets.select("asset_id", "blob").mapInPandas(cut, FRAME_SCHEMA)


def resize_blob(assets: DataFrame, factor: int = 4) -> DataFrame:
    """Per-asset "resize": keep every ``factor``-th payload byte
    (1:1 row map, narrow, no shuffle). A real deployment decodes with
    a codec and re-encodes at the target resolution; byte-stride
    downsampling is the deterministic stand-in with the identical plan
    shape and output contract (smaller blob + refreshed metadata).
    Output bytes per asset = ceil(n_bytes / factor) — arithmetically
    checkable by the duckdb oracle.
    """
    import pandas as pd

    def shrink(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["blob"]):
                small = bytes(buf)[::factor]
                rows.append((int(aid), small, len(small)))
            yield pd.DataFrame(rows, columns=["asset_id", "blob", "n_bytes"])

    return assets.select("asset_id", "blob").mapInPandas(
        shrink, "asset_id long, blob binary, n_bytes long"
    )


def byte_histogram(assets: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Per-asset feature extraction: bucketed byte-value histogram as
    an ``array<long>`` feature vector (vectorized numpy per Arrow
    batch — the plumbing a real embedding extractor would use, with
    the model call swapped in for the bincount). Invariant for the
    oracle: sum(histogram) == n_bytes.
    """
    import numpy as np
    import pandas as pd

    width = 256 // n_buckets

    def feat(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["blob"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_buckets)[:n_buckets]
                rows.append((int(aid), hist.tolist(), int(hist.sum())))
            yield pd.DataFrame(rows, columns=["asset_id", "features", "total_binned"])

    return assets.select("asset_id", "blob").mapInPandas(
        feat, "asset_id long, features array<long>, total_binned long"
    )
