"""Pure-stdlib media codecs (image + WAV audio) for multimodal operators.

This container has no PIL/opencv, but PNG is just zlib (stdlib) plus
per-scanline unfiltering, and BMP/PPM are plain structs — so the decode
step the brief allows to stub is implemented for real here, with numpy
doing the pixel work. Supported:

- PNG (non-interlaced, bit depth 8; color types gray / gray+alpha /
  RGB / RGBA / palette) — decode + encode (filter 0 + zlib);
- BMP (BITMAPINFOHEADER, uncompressed 24/32-bit bottom-up);
- PPM binary (P6, maxval 255).

Everything is deterministic and engine-portable (no dithering, integer
nearest-neighbor resize), so decoded hashes are stable across runs —
required for the per-row invariant checks and checkpoint/resume.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → channels
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(content: bytes) -> str | None:
    if content.startswith(PNG_MAGIC):
        return "png"
    if content.startswith(b"BM"):
        return "bmp"
    if content.startswith(b"P6"):
        return "ppm"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunks(data: bytes):
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §6): filters 0-4."""
    stride = width * channels
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    raw_arr = np.frombuffer(raw, dtype=np.uint8)
    for y in range(height):
        row = raw_arr[y * (stride + 1):(y + 1) * (stride + 1)]
        ft, line = int(row[0]), row[1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = line.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average (sequential in x)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth (sequential in x)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(height, width, channels)


def decode_png(content: bytes) -> np.ndarray:
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    palette = None
    for ctype, body in _png_chunks(content):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    arr = _unfilter(raw, width, height, channels)
    if color_type == 3:  # palette → RGB
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit gray/GA/RGB/RGBA, filter 0, one IDAT."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = binascii.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------


def decode_bmp(content: bytes) -> np.ndarray:
    (offset,) = struct.unpack_from("<I", content, 10)
    (header_size,) = struct.unpack_from("<I", content, 14)  # BITMAPINFOHEADER
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression, = struct.unpack_from("<I", content, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={compression}, bpp={bpp})")
    channels = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * channels + 3) & ~3
    arr = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(content, dtype=np.uint8,
                            count=width * channels,
                            offset=offset + y * row_size)
        row = row.reshape(width, channels)
        dest = height - 1 - y if bottom_up else y
        arr[dest] = row[:, [2, 1, 0]]  # BGR(A) → RGB
    return arr


def decode_ppm(content: bytes) -> np.ndarray:
    # P6 <ws> width <ws> height <ws> maxval <ONE ws> raster — the spec
    # mandates exactly one whitespace byte before the raster, so the
    # header is matched by offset (a whitespace split would silently eat
    # raster bytes that happen to be 0x20/0x09/0x0A)
    import re as _re

    m = _re.match(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", content)
    if not m:
        raise ValueError("only binary PPM (P6) supported")
    width, height, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    raster = content[m.end():]
    return np.frombuffer(raster, dtype=np.uint8,
                         count=width * height * 3).reshape(height, width, 3)


def decode_image(content: bytes) -> np.ndarray:
    fmt = sniff_format(content)
    if fmt == "png":
        return decode_png(content)
    if fmt == "bmp":
        return decode_bmp(content)
    if fmt == "ppm":
        return decode_ppm(content)
    raise ValueError("unrecognized image format (PNG/BMP/P6-PPM supported)")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic integer nearest-neighbor resize (same pixel choice
    on every engine — no rounding-mode ambiguity)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV audio (RIFF) — header parse + PCM frame access, stdlib-only
# ---------------------------------------------------------------------------


def decode_wav(content: bytes) -> tuple[dict, np.ndarray]:
    """Parse a RIFF/WAVE file → (meta, samples[frames, channels] int).

    Supports PCM (format 1) at 8/16/32-bit depth — the shapes real
    ingest pipelines normalize to before feature extraction. Returns
    sample values as int32 regardless of depth (8-bit unsigned is
    re-centered to signed, per the WAV spec).
    """
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV without fmt/data chunks")
    audio_fmt, channels, rate, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_fmt})")
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}.get(bits)
    if dtype is None:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    raw = np.frombuffer(data, dtype=dtype)
    n_frames = len(raw) // channels
    samples = raw[: n_frames * channels].reshape(n_frames, channels).astype(np.int32)
    if bits == 8:
        samples -= 128  # 8-bit WAV is unsigned
    meta = {"channels": channels, "sample_rate": rate, "bits": bits,
            "n_frames": n_frames,
            "duration_s": round(n_frames / rate, 6) if rate else None}
    return meta, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal 16-bit PCM WAV writer (frames × channels int array)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
