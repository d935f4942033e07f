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


def test_decode_image_webp_distributed(spark):
    """Lossless WebP (VP8L) decodes natively through the Spark path;
    lossy VP8 stays a named boundary."""
    from xarray_spatial_spark.operators.webp import encode_webp_lossless

    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (5 + i, 7, 3)).astype(np.uint8)
            for i in range(3)]
    rows = [(i, "image", bytearray(encode_webp_lossless(im)), 0, 0, 0,
             "webp") for i, im in enumerate(imgs)]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.decode_image(df).collect()}
    for i, im in enumerate(imgs):
        assert (out[i]["height"], out[i]["width"]) == im.shape[:2]
        got = np.array(out[i]["pixels"], dtype=np.uint8).reshape(im.shape)
        np.testing.assert_array_equal(got, im)

    lossy = bytearray(
        encode_webp_lossless(imgs[0]).replace(b"VP8L", b"VP8 ", 1))
    bad = spark.createDataFrame(
        [(9, "image", lossy, 4, 4, 0, "webp")], schema=mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="VP8"):
        mm.decode_image(bad).collect()


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


def _palette():
    return np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [255, 255, 255]], dtype=np.uint8)


def test_gif_roundtrip_still(spark):
    from xarray_spatial_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    pal = _palette()
    idx = rng.integers(0, len(pal), size=(23, 31)).astype(np.uint8)
    buf = mm.encode_gif(idx, pal)
    img = mm.decode_gif(buf)
    np.testing.assert_array_equal(img, pal[idx])
    # sniff dispatch reaches the GIF path
    np.testing.assert_array_equal(mm.sniff_and_decode(buf), pal[idx])


def test_gif_interlaced_roundtrip(spark):
    from xarray_spatial_spark.operators import multimodal as mm

    rng = np.random.default_rng(13)
    pal = _palette()
    idx = rng.integers(0, len(pal), size=(17, 9)).astype(np.uint8)
    buf = mm.encode_gif(idx, pal, interlace=True)
    np.testing.assert_array_equal(mm.decode_gif(buf), pal[idx])


def test_gif_animation_frames_and_transparency(spark):
    from xarray_spatial_spark.operators import multimodal as mm

    pal = _palette()
    f0 = np.full((8, 8), 1, dtype=np.uint8)          # red field
    f1 = np.full((8, 8), 0, dtype=np.uint8)          # transparent idx 0
    f1[2:4, 2:4] = 2                                  # green patch
    buf = bytearray(mm.encode_gif([f0, f1], pal, delays_ms=[40, 60]))
    # mark frame 2's GCE transparent-color flag for index 0: find the
    # second 0x21 0xF9 extension and set flag+index
    pos = bytes(buf).find(b"\x21\xf9", bytes(buf).find(b"\x21\xf9") + 2)
    buf[pos + 3] |= 0x01   # packed: transparency on
    buf[pos + 6] = 0       # transparent index
    frames, delays = mm.decode_gif_frames(bytes(buf))
    assert delays == [40, 60]
    np.testing.assert_array_equal(frames[0], pal[f0])
    want = pal[f0].copy()
    want[2:4, 2:4] = pal[2]   # transparent pixels keep frame 0's red
    np.testing.assert_array_equal(frames[1], want)


def test_gif_frames_operator(spark):
    from xarray_spatial_spark.operators import multimodal as mm

    pal = _palette()
    rng = np.random.default_rng(17)
    rows = []
    for mid in range(4):
        frames = [rng.integers(0, len(pal), size=(6, 7)).astype(np.uint8)
                  for _ in range(3)]
        rows.append((mid, bytearray(mm.encode_gif(frames, pal,
                                                  delays_ms=[30, 30, 30]))))
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    out = mm.gif_frames(df).collect()
    assert len(out) == 12
    by_key = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert by_key[(2, 2)]["ts_ms"] == 60
    r = by_key[(1, 0)]
    img = np.frombuffer(r["rgb"], np.uint8).reshape(r["h"], r["w"], 3)
    assert img.shape == (6, 7, 3)


def test_jpeg_dct_pair_and_huffman_canonical():
    from xarray_spatial_spark.operators import jpeg

    rng = np.random.default_rng(0)
    b = rng.uniform(-128, 127, (8, 8))
    np.testing.assert_allclose(jpeg.idct2(jpeg.fdct2(b)), b, atol=1e-10)
    codes = jpeg._huff_codes(*jpeg.HUFF_DC_LUMA)
    assert codes[0] == (0b00, 2)       # T.81 canonical: first len-2 code
    assert codes[11] == (0b111111110, 9)
    lens = sorted(ln for _, ln in codes.values())
    assert lens == sorted(lens)        # canonical lengths are feasible


def test_jpeg_roundtrip_gray(spark):
    from xarray_spatial_spark.operators import jpeg

    flat = np.full((16, 16), 128, dtype=np.uint8)
    assert (jpeg.decode_jpeg(jpeg.encode_jpeg(flat)) == 128).all()
    yy, xx = np.mgrid[0:30, 0:37]  # non-multiple-of-8 dims
    img = (150 + 80 * np.sin(yy / 9.0) * np.cos(xx / 12.0)).clip(0, 255).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 10 and err.mean() < 2.0


def test_jpeg_roundtrip_rgb_and_sniff(spark):
    from xarray_spatial_spark.operators import jpeg, multimodal as mm

    yy, xx = np.mgrid[0:32, 0:40]
    base = (150 + 80 * np.sin(yy / 9.0) * np.cos(xx / 12.0)).clip(0, 255)
    img = np.stack([base, np.roll(base, 5, 0), np.roll(base, 3, 1)],
                   axis=2).astype(np.uint8)
    buf = jpeg.encode_jpeg(img)
    out = jpeg.decode_jpeg(buf)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 5.0  # lossy: chroma table is coarse
    sniffed = mm.sniff_and_decode(buf)
    np.testing.assert_array_equal(sniffed, out)


def test_jpeg_decode_image_operator(spark):
    from xarray_spatial_spark.operators import jpeg, multimodal as mm
    from pyspark.sql import functions as F

    yy, xx = np.mgrid[0:16, 0:16]
    rows = []
    for i in range(6):
        img = ((yy * 5 + xx * 3 + i * 17) % 200 + 20).astype(np.uint8)
        rows.append((i, bytearray(jpeg.encode_jpeg(img)), 16, 16))
    df = spark.createDataFrame(
        rows, schema="media_id long, payload binary, width int, height int"
    )
    out = mm.decode_image(df)
    got = out.select("media_id", F.size("pixels").alias("n")).collect()
    assert {r["n"] for r in got} == {16 * 16 * 3}


@pytest.mark.skipif(not __import__("glob").glob("/root/reference/img/*.png"),
                    reason="reference image assets not present")
def test_png_decodes_real_world_files():
    """Third-party-encoded PNGs (reference repo's doc images — real
    encoder output with mixed row filters) must all decode; shapes and
    channel counts must be sane."""
    import glob

    n = 0
    # sample: the per-pixel Paeth path makes big files ~2 s each
    for p in sorted(glob.glob("/root/reference/img/*.png"))[:8]:
        img = mm.decode_png(open(p, "rb").read())
        assert img.dtype == np.uint8
        assert img.ndim in (2, 3) and img.shape[0] > 0 and img.shape[1] > 0
        if img.ndim == 3:
            assert img.shape[2] in (3, 4)
        n += 1
    assert n >= 5


def test_gif_local_color_table_compositing():
    """Per-frame local palettes must not recolor earlier frames: the
    canvas composites in RGB, not indices."""
    from xarray_spatial_spark.operators import multimodal as mm

    pal = _palette()
    f0 = np.full((6, 6), 1, dtype=np.uint8)  # red via global table
    buf = bytearray(mm.encode_gif(f0, pal))
    # append a second frame covering only a 2x2 subrect, with a LOCAL
    # 4-entry table where index 0 = green
    local = np.array([[0, 255, 0], [1, 2, 3], [4, 5, 6], [7, 8, 9]],
                     dtype=np.uint8)
    buf = buf[:-1]  # drop trailer
    buf += bytes([0x2C]) + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    buf += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    buf += bytes([0x80 | 0x01])  # local table, 4 entries
    buf += local.tobytes()
    data = mm._gif_lzw_encode(np.zeros(4, dtype=np.uint8), 2)
    buf += bytes([2, len(data)]) + data + b"\x00\x3B"
    frames, _ = mm.decode_gif_frames(bytes(buf))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[1][0, 0], [255, 0, 0])   # still red
    np.testing.assert_array_equal(frames[1][2, 2], [0, 255, 0])   # local green
    np.testing.assert_array_equal(frames[1][5, 5], [255, 0, 0])


def test_gif_encode_rejects_mixed_shapes():
    from xarray_spatial_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="share one shape"):
        mm.encode_gif([np.zeros((8, 8), np.uint8), np.zeros((4, 4), np.uint8)],
                      _palette())


def test_jpeg_fill_bytes_and_scan_mismatch():
    from xarray_spatial_spark.operators import jpeg

    img = np.full((8, 8), 100, dtype=np.uint8)
    buf = jpeg.encode_jpeg(img)
    # insert a fill byte before the first DQT marker — still spec-valid
    i = buf.index(b"\xff\xdb")
    padded = buf[:i] + b"\xff" + buf[i:]
    np.testing.assert_array_equal(jpeg.decode_jpeg(padded),
                                  jpeg.decode_jpeg(buf))
    # a single-component (non-interleaved) scan of a 3-component frame
    # is legal sequential JPEG: the Y scan decodes, unscanned chroma
    # stays at neutral 128 — for a black image the output is identical
    rgb = jpeg.encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    j = rgb.index(b"\xff\xda")
    ln = int.from_bytes(rgb[j + 2: j + 4], "big")
    y_only = rgb[:j] + b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1]) \
        + rgb[j + 5: j + 7] + rgb[j + 2 + ln - 3: j + 2 + ln] \
        + rgb[j + 2 + ln:]
    np.testing.assert_array_equal(jpeg.decode_jpeg(y_only),
                                  np.zeros((8, 8, 3), np.uint8))


def test_jpeg_16bit_quant_tables_decode():
    """Pq=1 DQT segments (16-bit quant values, T.81 B.2.4.1): rewrite
    the encoder's 8-bit tables as 16-bit with identical values — the
    decode must be pixel-identical to the 8-bit stream."""
    import struct

    from xarray_spatial_spark.operators import jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    buf = jpeg.encode_jpeg(img)

    out, pos = bytearray(buf[:2]), 2
    while pos + 1 < len(buf):
        marker = buf[pos + 1]
        if buf[pos] != 0xFF or marker in (0x00, 0xFF) or marker == 0xDA:
            out += buf[pos:]
            break
        seg_len = struct.unpack(">H", buf[pos + 2: pos + 4])[0]
        seg = buf[pos + 2 + 2: pos + 2 + seg_len]
        if marker == 0xDB:
            pq_tq, vals = seg[0], seg[1:65]
            assert pq_tq >> 4 == 0 and len(seg) == 65
            body = bytes([0x10 | pq_tq]) + b"".join(
                struct.pack(">H", v) for v in vals)
            out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
        else:
            out += buf[pos: pos + 2 + seg_len]
        pos += 2 + seg_len

    np.testing.assert_array_equal(jpeg.decode_jpeg(bytes(out)),
                                  jpeg.decode_jpeg(buf))
