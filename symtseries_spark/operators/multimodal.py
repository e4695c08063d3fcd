"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container): ``decode_image_stub`` raises NotImplementedError
unless ``fake=True``, in which case it produces a deterministic fake
"decoded" feature so the full Spark plumbing — schema, Arrow batch shape,
partition sizing, UDF signatures — is real and tested end to end.

Operators:
  * with_media_metadata — typed metadata struct extracted from the binary
    header bytes (magic sniffing is real: JPEG/PNG/GIF/WAV/MP4 signatures).
  * extract_features    — mapInPandas batch decode → fixed-dim float array
    (stub kernel, real batching/schema).
  * sample_frames       — video frame sampling plumbing: emits (media_id,
    frame_idx, frame_bytes) rows with deterministic fake frames.

Scale notes: binary payloads ride in their own column so column pruning
keeps them out of every stage that doesn't decode; decode stages use
mapInPandas (streaming Arrow batches, no grouped shuffle) and should run
on a table pre-partitioned to ≤ maxPartitionBytes of *payload*, not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with a 4-byte size
    (b"<htm", "text/html"),
    (b"<!DO", "text/html"),
    (b"<html"[:4], "text/html"),
]


def sniff_mime(col: str = "payload"):
    """Magic-byte MIME sniff as a pure Column expression (JVM-side substring
    compare on the first 4 bytes; the binary column itself is not decoded)."""
    head = F.substring(F.col(col), 1, 4)
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(
            F.substring(F.col(col), 1, len(magic)) == F.lit(magic), mime
        ).otherwise(expr)
    return expr.alias("mime")


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    return df.select(
        "*",
        sniff_mime(payload_col),
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.xxhash64(F.col(payload_col)).alias("content_hash"),
    )


def decode_image_stub(payload: bytes, fake: bool) -> np.ndarray:
    """STUB: real deployments plug a Pillow/libvips decode here.

    fake=True → deterministic 8-dim feature derived from the payload bytes
    (stable across runs/partitions) so tests can assert the plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; pass fake=True for the deterministic test kernel"
        )
    b = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return b.reshape(8, 8).mean(axis=1).astype(np.float32) / 255.0


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Batch decode → fixed-dim features via mapInPandas (streaming Arrow
    batches; payload bytes never shuffle)."""

    def _batches(it):
        for pdf in it:
            feats = [
                decode_image_stub(p, fake).tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": pdf.get("mime", pd.Series(["?"] * len(pdf))),
                    "feature": feats,
                }
            )

    cols = [id_col, payload_col] + (["mime"] if "mime" in media.columns else [])
    return media.select(*cols).mapInPandas(_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8,
    id_col: str = "media_id", payload_col: str = "payload", fake: bool = True,
) -> DataFrame:
    """Image resize plumbing: (media_id, width, height, pixels).

    The resample kernel is STUBBED (no Pillow/libvips in this container):
    fake=True produces a deterministic width×height grayscale buffer by
    area-averaging the payload bytes with numpy — byte-stable across runs
    and partitions, so the Arrow batch shape, output schema, and payload
    column pruning are tested for real. A production deployment swaps the
    inner function for a real decoder+resampler; nothing else changes.
    """
    if not fake:
        raise NotImplementedError("image resampling not available in this container")
    n = width * height

    def _batches(it):
        for pdf in it:
            ids, bufs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                src = np.frombuffer(
                    payload[: 16 * n].ljust(16 * n, b"\0"), dtype=np.uint8
                )
                px = src.reshape(n, 16).mean(axis=1).astype(np.uint8)
                ids.append(mid)
                bufs.append(px.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.full(len(ids), width, dtype=np.int32),
                    "height": np.full(len(ids), height, dtype=np.int32),
                    "pixels": bufs,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(_batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4,
    id_col: str = "media_id", payload_col: str = "payload", fake: bool = True,
) -> DataFrame:
    """Video frame-sampling plumbing: (media_id, frame_idx, frame_bytes).

    The decoder is stubbed: fake frames are deterministic byte slices. The
    row-explosion shape (1 video → max_frames rows) and Arrow batching are
    the production path.
    """
    if not fake:
        raise NotImplementedError("video decoding not available in this container")

    def _batches(it):
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for i in range(max_frames):
                    off = i * every_n
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + 16]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select(id_col, payload_col).mapInPandas(_batches, FRAME_SCHEMA)
