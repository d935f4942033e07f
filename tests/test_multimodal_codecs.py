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
