"""Multimodal (binary) column surface.

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct — the Spark-side plumbing (schemas,
Arrow-batched mapInPandas decode, frame fan-out, partition sizing) is
real and tested; the actual codec calls are stubbed behind
``try: import`` gates because no image/audio libraries ship in this
environment (a deterministic byte-statistics fake stands in, so tests
pin the full distributed path end-to-end).
"""

from .columns import (
    BLOB_META_SCHEMA,
    FRAME_SCHEMA,
    PIXEL_STATS_SCHEMA,
    attach_blob,
    decode_image_stats,
    sample_frames,
)

__all__ = [
    "BLOB_META_SCHEMA",
    "PIXEL_STATS_SCHEMA",
    "FRAME_SCHEMA",
    "attach_blob",
    "decode_image_stats",
    "sample_frames",
]
