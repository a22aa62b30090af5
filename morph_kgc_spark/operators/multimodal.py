"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real Spark-side plumbing (schemas, Arrow batch shapes, partition-safe
mapInPandas) with the codec layer stubbed: the image/audio libraries are
not in this container, so ``decode`` routes to a deterministic fake
(seeded from the content hash) unless a real decoder is injected. The
UDF signatures, batch iteration, and output schemas are production-real;
swapping ``_fake_decode`` for PIL/torchaudio is a one-function change.

Scale design: all operators are ``mapInPandas`` over the binary column —
per-partition Arrow batches, no shuffle; heavy media rows should be
stored in their own parquet column chunk (done automatically) so column
pruning skips them for metadata-only queries.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("content", BinaryType()),
    StructField("mime", StringType()),
])

IMAGE_META_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("content_hash", StringType()),
])


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder (no codec libs in this
    container): dimensions derived from the content hash. Replace with
    PIL.Image.open in production — the schema and call shape are final.
    """
    h = hashlib.md5(content).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def image_metadata(media: DataFrame,
                   decode: Optional[Callable[[bytes], tuple[int, int, int]]] = None
                   ) -> DataFrame:
    """Decode → (media_id, width, height, n_channels, content_hash)."""
    decode = decode or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode(c) if c is not None else (None, None, None)
                    for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_channels": [d[2] for d in dims],
                "content_hash": [hashlib.md5(c).hexdigest() if c is not None else None
                                 for c in pdf["content"]],
            })

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: REAL batching/schema, stubbed pixel work.

    Raises NotImplementedError inside the batch fn if a real resize is
    requested without an injected decoder — clearly marked per brief.
    """
    out_schema = StructType([
        StructField("media_id", StringType()),
        StructField("content", BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize needs a codec library (PIL) not present in this "
            "container; inject a decoder or run on a full image")
        yield  # pragma: no cover

    return media.mapInPandas(batches, out_schema)


def sample_video_frames(media: DataFrame, every_n_seconds: int = 10) -> DataFrame:
    """Frame-sampling stub: emits deterministic fake frame records so the
    downstream plumbing (one row per sampled frame) is testable."""
    out_schema = StructType([
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                n_frames = 1 + hashlib.md5(c).digest()[2] % 4
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(
                        hashlib.md5(c + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, out_schema)
