"""Real pure-numpy codecs: PPM/BMP images, WAV PCM16 audio."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import multimodal as mm


def test_ppm_roundtrip_local():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    back = mm.decode_ppm(mm.encode_ppm(img))
    np.testing.assert_array_equal(back, img)


def test_bmp_decode_local():
    # hand-build a 2x3 24-bit BMP (bottom-up, padded rows)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    stride = (3 * 3 + 3) & ~3
    rows = b""
    for r in img[::-1]:  # bottom-up
        line = r[:, ::-1].tobytes()  # RGB->BGR
        rows += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    hdr = (b"BM" + (off + len(rows)).to_bytes(4, "little") + b"\x00" * 4
           + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (3).to_bytes(4, "little", signed=True)
           + (2).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + b"\x00" * 24)
    back = mm.decode_bmp(hdr + rows)
    np.testing.assert_array_equal(back, img)


def test_decode_image_real_ppm_distributed(spark):
    rng = np.random.default_rng(3)
    rows = []
    imgs = {}
    for i in range(20):
        h, w = 8 + i % 5, 6 + i % 7
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        imgs[i] = img
        rows.append((i, "image", bytearray(mm.encode_ppm(img)), 0, 0, 0, "ppm"))
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = mm.decode_image(df).collect()
    for r in out:
        img = imgs[r["media_id"]]
        assert (r["height"], r["width"]) == img.shape[:2]
        np.testing.assert_array_equal(
            np.asarray(r["pixels"], np.uint8).reshape(img.shape), img
        )


def test_decode_image_jpeg_raises(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"\xff\xd8\xff\xe0junk"), 4, 4, 0, "jpeg")],
        schema=mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="JPEG"):
        mm.decode_image(df).collect()


def test_wav_features_distributed(spark):
    rate = 8000
    t = np.arange(rate) / rate
    rows = []
    for i, freq in enumerate([440.0, 880.0, 1760.0]):
        x = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        rows.append((i, "audio", bytearray(mm.encode_wav_pcm16(x, rate)),
                     0, 0, 1000, "pcm16"))
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"]
           for r in mm.audio_features(df).collect()}
    # spectral centroid tracks the tone frequency
    assert abs(out[0][3] - 440) < 30
    assert abs(out[1][3] - 880) < 30
    assert abs(out[2][3] - 1760) < 60
    # rms of a full-scale-ish sine ~ 0.61/sqrt(2)
    assert 0.3 < out[0][0] < 0.5


def _png_filter_encode(img, ftype):
    """Reference scalar PNG row filterer (spec definitions) — builds a
    stream our decoder must invert for every filter type."""
    import struct, zlib
    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        filt = np.zeros(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0          # left (recon)
            b = prev[i]                                 # up (recon)
            c = prev[i - ch] if i >= ch else 0          # upper-left
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (row[i] - pred) % 256
        out += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = row
    color = {1: 0, 3: 2, 4: 6}[ch]
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


def test_png_roundtrip_all_shapes():
    from xarray_spatial_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in ((13, 17), (13, 17, 3), (13, 17, 4)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        back = decode_png(encode_png(img))
        np.testing.assert_array_equal(img, back)


def test_png_all_filter_types_decode():
    from xarray_spatial_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    for ftype in range(5):
        got = decode_png(_png_filter_encode(img, ftype))
        np.testing.assert_array_equal(img, got, err_msg=f"filter {ftype}")
    gray = rng.integers(0, 256, (7, 5)).astype(np.uint8)
    for ftype in (1, 3, 4):
        np.testing.assert_array_equal(gray, decode_png(_png_filter_encode(gray, ftype)))


def test_png_through_sniff_and_image_features(spark):
    from xarray_spatial_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    buf = mm.encode_png(img)
    np.testing.assert_array_equal(mm.sniff_and_decode(buf), img)
    df = spark.createDataFrame(
        [(1, "image", bytearray(buf), 16, 16, 0, "png")],
        schema=mm.MEDIA_SCHEMA)
    feats = mm.image_features(mm.decode_image(df)).collect()
    assert len(feats) == 1 and feats[0]["width"] == 16
    assert len(feats[0]["features"]) == 14
    # decoded mean matches the source image exactly
    np.testing.assert_allclose(feats[0]["features"][0], img[:, :, 0].mean())
