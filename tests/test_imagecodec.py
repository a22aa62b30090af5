"""Pure-stdlib image codec: PNG/BMP/PPM decode, PNG encode, resize.

The PNG filter coverage matters: real encoders emit Sub/Up/Average/Paeth
rows, so each filter gets a hand-built scanline test.
"""

import struct
import zlib

import numpy as np
import pytest

from morph_kgc_spark.operators.imagecodec import (
    PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    resize_nearest,
    sniff_format,
)


def _img(h, w, c=3, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_png_roundtrip_rgb():
    arr = _img(13, 17, 3)
    out = decode_png(encode_png(arr))
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    arr = _img(5, 9, channels)
    out = decode_png(encode_png(arr))
    assert np.array_equal(out, arr)


def _png_with_filters(arr, filters):
    """Hand-build a PNG whose scanlines use the given filter per row."""
    import binascii

    h, w, c = arr.shape
    a32 = arr.astype(np.int32)
    rows = []
    prev = np.zeros((w, c), np.int32)
    for y, ft in zip(range(h), filters):
        cur = a32[y]
        if ft == 0:
            enc = cur
        elif ft == 1:  # Sub
            left = np.zeros_like(cur)
            left[1:] = cur[:-1]
            enc = (cur - left) % 256
        elif ft == 2:  # Up
            enc = (cur - prev) % 256
        elif ft == 3:  # Average
            left = np.zeros_like(cur)
            left[1:] = cur[:-1]
            enc = (cur - (left + prev) // 2) % 256
        elif ft == 4:  # Paeth
            enc = np.zeros_like(cur)
            for x in range(w):
                for ch in range(c):
                    a = int(cur[x - 1, ch]) if x else 0
                    b = int(prev[x, ch])
                    cc = int(prev[x - 1, ch]) if x else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    enc[x, ch] = (int(cur[x, ch]) - pred) % 256
        rows.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype, body):
        crc = binascii.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_png_all_filter_types_decode():
    arr = _img(5, 6, 3, seed=3)
    png = _png_with_filters(arr, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(png), arr)


def test_png_palette():
    import binascii

    # 2x2 palette image: indices into a 3-color palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(ctype, body):
        crc = binascii.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(png)
    assert np.array_equal(out, palette[idx])


def test_bmp_decode_24bit_bottom_up():
    h, w = 3, 2
    arr = _img(h, w, 3, seed=5)
    row_size = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, [2, 1, 0]].tobytes()  # RGB→BGR
        body += row + b"\x00" * (row_size - len(row))
    offset = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    out = decode_bmp(bytes(header + body))
    assert np.array_equal(out, arr)


def test_ppm_decode():
    arr = _img(4, 3, 3, seed=11)
    ppm = b"P6\n3 4\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(ppm), arr)
    assert sniff_format(ppm) == "ppm"


def test_ppm_decode_raster_starting_with_whitespace_bytes():
    """P6 mandates exactly ONE whitespace after maxval; raster bytes that
    happen to be 0x20/0x09/0x0A must NOT be eaten by a whitespace split
    (they are pixel data)."""
    arr = _img(2, 2, 3, seed=5).copy()
    arr[0, 0] = (0x20, 0x0A, 0x09)  # raster starts with ws-looking bytes
    ppm = b"P6\n2 2\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(ppm), arr)


def test_resize_nearest_deterministic():
    arr = _img(8, 8, 3)
    small = resize_nearest(arr, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, arr[::2, ::2])  # exact integer mapping
    up = resize_nearest(arr, 16, 16)
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], arr)


def test_decode_image_dispatch_and_reject():
    arr = _img(3, 3)
    assert sniff_format(encode_png(arr)) == "png"
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"\xff\xd8\xff not really jpeg")


def test_resize_images_end_to_end(spark):
    """mapInPandas resize over real PNG bytes: shape + pixel-exactness."""
    from morph_kgc_spark.operators.multimodal import image_metadata, resize_images

    arr = _img(10, 12, 3)
    media = spark.createDataFrame(
        [("a", "image", bytearray(encode_png(arr)), "image/png")],
        "media_id string, kind string, content binary, mime string")
    meta = image_metadata(media).collect()[0]
    assert (meta.width, meta.height, meta.n_channels) == (12, 10, 3)

    out = resize_images(media, 6, 5).collect()[0]
    assert (out.width, out.height) == (6, 5)
    got = decode_png(bytes(out.content))
    assert np.array_equal(got, resize_nearest(arr, 6, 5))


def test_wav_roundtrip_and_metadata(spark):
    from morph_kgc_spark.operators.imagecodec import decode_wav, encode_wav
    from morph_kgc_spark.operators.multimodal import audio_metadata

    t = np.arange(4000)
    samples = (np.sin(t / 20.0) * 12000).astype(np.int32)
    stereo = np.stack([samples, -samples], axis=1)
    wav = encode_wav(stereo, 16000)
    meta, back = decode_wav(wav)
    assert meta == {"channels": 2, "sample_rate": 16000, "bits": 16,
                    "n_frames": 4000, "duration_s": 0.25}
    assert np.array_equal(back, stereo)

    media = spark.createDataFrame(
        [("w1", "audio", bytearray(wav), "audio/wav"),
         ("bad", "audio", bytearray(b"not a wav"), "audio/mpeg")],
        "media_id string, kind string, content binary, mime string")
    rows = {r.media_id: r for r in audio_metadata(media).collect()}
    assert rows["w1"].sample_rate == 16000 and rows["w1"].n_frames == 4000
    assert rows["bad"].sample_rate is None


def test_wav_8bit_unsigned_recentered():
    from morph_kgc_spark.operators.imagecodec import decode_wav
    import struct as st

    data = bytes([0, 128, 255])  # min, mid, max unsigned 8-bit
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data + b"\x00")
    wav = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body
    meta, samples = decode_wav(wav)
    assert meta["bits"] == 8 and samples[:, 0].tolist() == [-128, 0, 127]
