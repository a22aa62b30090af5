"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

IMAGE decode/resize is REAL: PNG (zlib is stdlib; unfiltering is numpy),
BMP, and P6-PPM are handled by :mod:`morph_kgc_spark.operators.imagecodec`
without any codec library. Unrecognized formats (JPEG etc. — those DO
need external codecs) fall back per configuration: metadata extraction
uses a deterministic content-hash fake (documented), resize raises.
VIDEO frame sampling stays a deterministic fake — container demuxing is
genuinely out of reach without ffmpeg — with production-real schemas
and batch shapes.

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
    DoubleType,
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


# synthetic P6 fixture parameters shared with the DuckDB oracle
# (oracles.multimodal_decode_stats): width/height from the id, raster
# bytes from the id's md5 hex repeated — every piece SQL-replayable.
SYNTH_W_BASE, SYNTH_W_MOD = 4, 5
SYNTH_H_BASE, SYNTH_H_MOD = 3, 4


def synth_ppm_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL P6-PPM binaries from an integer id column.

    (media_id, kind, content, mime) per row: width = 4 + id % 5,
    height = 3 + id % 4, raster = md5-hex(id) repeated to w·h·3 bytes.
    mapInPandas (Arrow batches, zero shuffle) — the production shape for
    media ingestion; the image libs absent from this container are not
    needed because the codec is the stdlib one in imagecodec.py.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "kind": [], "content": [], "mime": []}
            for v in pdf[id_col]:
                i = int(v)
                w = SYNTH_W_BASE + i % SYNTH_W_MOD
                h = SYNTH_H_BASE + i % SYNTH_H_MOD
                need_hex = w * h * 3 * 2
                hx = hashlib.md5(str(i).encode()).hexdigest()
                px = (hx * -(-need_hex // len(hx)))[:need_hex]
                rows["media_id"].append(str(i))
                rows["kind"].append("image")
                rows["content"].append(
                    b"P6\n%d %d\n255\n" % (w, h) + bytes.fromhex(px))
                rows["mime"].append("image/x-portable-pixmap")
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(batches, MEDIA_SCHEMA)


# synthetic PCM-WAV fixture parameters shared with the DuckDB oracle
# (oracles.audio_decode_stats): rate/channels/frames from the id,
# int16 samples from the id's md5 hex — every piece SQL-replayable.
SYNTH_WAV_RATES = (8000, 10000, 20000)   # n_frames/rate terminates <= 6
SYNTH_WAV_F_BASE, SYNTH_WAV_F_MOD = 40, 25  # decimal digits for all rates


def synth_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL PCM RIFF/WAVE binaries from an integer id.

    (media_id, kind, content, mime) per row: channels = 1 + id % 2,
    sample_rate = SYNTH_WAV_RATES[id % 3], n_frames = 40 + id % 25,
    int16 samples = consecutive 4-hex-char groups of md5-hex(id)
    repeated, parsed big-endian and recentred to signed. Encoded with
    the real writer (:func:`imagecodec.encode_wav`) so the decode side
    exercises the actual RIFF chunk walk. mapInPandas, zero shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from morph_kgc_spark.operators.imagecodec import encode_wav

        for pdf in it:
            rows = {"media_id": [], "kind": [], "content": [], "mime": []}
            for v in pdf[id_col]:
                i = int(v)
                channels = 1 + i % 2
                rate = SYNTH_WAV_RATES[i % len(SYNTH_WAV_RATES)]
                n_frames = SYNTH_WAV_F_BASE + i % SYNTH_WAV_F_MOD
                need_hex = n_frames * channels * 4
                hx = hashlib.md5(str(i).encode()).hexdigest()
                hx = (hx * -(-need_hex // len(hx)))[:need_hex]
                # vectorized hex→u16(BE)→signed: identical values to the
                # per-char int(hx[p:p+4], 16) loop (guide §4.2)
                u = np.frombuffer(bytes.fromhex(hx), dtype=">u2") \
                    .astype(np.int32)
                samples = np.where(u >= 32768, u - 65536, u) \
                    .reshape(n_frames, channels)
                rows["media_id"].append(str(i))
                rows["kind"].append("audio")
                rows["content"].append(encode_wav(samples, rate))
                rows["mime"].append("audio/wav")
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(batches, MEDIA_SCHEMA)


AUDIO_STATS_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("sample_hash", StringType()),
])


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode → header fields + a hash of the decoded SAMPLES.

    ``sample_hash`` is md5 of the comma-joined decimal sample values in
    frame-major order — value space, not byte space, so the DuckDB
    oracle replays it with string building (no blob hashing) while still
    proving the PCM payload round-tripped bit-for-bit; header fields
    alone would pass on a fmt-chunk sniff. mapInPandas, zero shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from morph_kgc_spark.operators.imagecodec import decode_wav

        for pdf in it:
            rows = {k.name: [] for k in AUDIO_STATS_SCHEMA.fields}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                meta, samples = decode_wav(bytes(c))
                joined = ",".join(str(int(x)) for x in samples.flatten())
                rows["media_id"].append(mid)
                rows["channels"].append(meta["channels"])
                rows["sample_rate"].append(meta["sample_rate"])
                rows["bits"].append(meta["bits"])
                rows["n_frames"].append(meta["n_frames"])
                rows["duration_s"].append(meta["duration_s"])
                rows["sample_hash"].append(
                    hashlib.md5(joined.encode()).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, AUDIO_STATS_SCHEMA)


PIXEL_STATS_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("pixel_hash", StringType()),
])


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL decode → (media_id, width, height, n_channels, pixel_hash).

    ``pixel_hash`` is md5 of the decoded raster's lowercase hex STRING
    (not the raw bytes): hashing in hex-string space lets the DuckDB
    oracle replay the exact value without blob hashing, proving the
    decode produced the raster byte-for-byte — dimensions alone would
    pass on a header-only sniff.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from morph_kgc_spark.operators.imagecodec import decode_image

        for pdf in it:
            rows = {k.name: [] for k in PIXEL_STATS_SCHEMA.fields}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                arr = decode_image(bytes(c))
                h, w = arr.shape[:2]
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_channels"].append(
                    arr.shape[2] if arr.ndim == 3 else 1)
                rows["pixel_hash"].append(hashlib.md5(
                    arr.tobytes().hex().encode()).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, PIXEL_STATS_SCHEMA)


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for formats that DO need external codecs
    (JPEG/WebP): dimensions derived from the content hash."""
    h = hashlib.md5(content).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def _real_decode(content: bytes) -> tuple[int, int, int]:
    """PNG/BMP/PPM via the stdlib codec; hash-fake for other formats."""
    from morph_kgc_spark.operators.imagecodec import decode_image, sniff_format

    if sniff_format(content) is None:
        return _fake_decode(content)
    arr = decode_image(content)
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    return w, h, c


def image_metadata(media: DataFrame,
                   decode: Optional[Callable[[bytes], tuple[int, int, int]]] = None
                   ) -> DataFrame:
    """Decode → (media_id, width, height, n_channels, content_hash)."""
    decode = decode or _real_decode

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
    """Real image resize: decode (PNG/BMP/PPM) → deterministic
    nearest-neighbor resize → re-encode as PNG. Per-partition Arrow
    batches, no shuffle. Unrecognized formats raise inside the batch
    (a production deployment swaps in a full codec; the plumbing,
    schema, and determinism contract are final here).
    """
    out_schema = StructType([
        StructField("media_id", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from morph_kgc_spark.operators.imagecodec import (
            decode_image,
            encode_png,
            resize_nearest,
        )

        for pdf in it:
            out = {"media_id": [], "content": [], "width": [], "height": []}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                arr = resize_nearest(decode_image(bytes(c)), width, height)
                out["media_id"].append(mid)
                out["content"].append(encode_png(arr))
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

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


AUDIO_META_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("content_hash", StringType()),
])


def audio_metadata(media: DataFrame) -> DataFrame:
    """REAL WAV (PCM RIFF) header parse → per-clip metadata; formats
    needing external codecs (mp3/ogg) yield null fields. mapInPandas
    over the binary column, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from morph_kgc_spark.operators.imagecodec import decode_wav

        for pdf in it:
            rows = {k.name: [] for k in AUDIO_META_SCHEMA.fields}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                try:
                    meta, _ = decode_wav(bytes(c))
                except ValueError:
                    meta = {"channels": None, "sample_rate": None,
                            "bits": None, "n_frames": None}
                rows["media_id"].append(mid)
                rows["channels"].append(meta["channels"])
                rows["sample_rate"].append(meta["sample_rate"])
                rows["bits"].append(meta["bits"])
                rows["n_frames"].append(meta["n_frames"])
                rows["content_hash"].append(hashlib.md5(bytes(c)).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, AUDIO_META_SCHEMA)
