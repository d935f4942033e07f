"""Perceptual image hashing (pHash/dHash) + generic banded-Hamming
near-dup: codec invariance, jitter robustness, brute-force parity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import multimodal as mm


def _img(seed: int, h: int = 40, w: int = 56) -> np.ndarray:
    """Structured deterministic image: mid-frequency sinusoids at big,
    varied amplitudes + hard-edged blobs.  Texture matters — on an
    ULTRA-SMOOTH gradient most low-freq DCT coefficients sit at ~0
    (the median), so pHash bits flip under tiny noise; that's the
    documented pHash caveat, not a bug, and real photos are textured."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.zeros((h, w))
    for amp in (90, 60, 40, 25):
        fy, fx = rng.uniform(1.5, 6, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        base += amp * np.sin(2 * np.pi * fy * yy / h + py) * np.cos(
            2 * np.pi * fx * xx / w + px)
    for _ in range(3):
        y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
        base[y0:y0 + rng.integers(4, 12),
             x0:x0 + rng.integers(4, 12)] += rng.uniform(-80, 80)
    img = np.stack(
        [base * rng.uniform(0.7, 1.3) + rng.uniform(60, 160)
         for _ in range(3)], axis=2)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_phash_codec_invariance():
    """Same pixels through PNG and BMP encode/decode -> same hash."""
    img = _img(7)
    png = mm.sniff_and_decode(mm.encode_png(img))
    # BMP writer is 24-bit BGR rows; round-trip through our own codec
    from xarray_spatial_spark.operators.multimodal import decode_bmp

    hdr_px = mm.encode_ppm(img)
    ppm = mm.sniff_and_decode(hdr_px)
    assert mm._phash_bits(png) == mm._phash_bits(img)
    assert mm._phash_bits(ppm) == mm._phash_bits(img)
    assert mm._dhash_bits(png) == mm._dhash_bits(img)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_jitter_and_resize_robust_distinct_far():
    img = _img(3)
    h0 = mm._phash_bits(img)
    # small pixel noise
    rng = np.random.default_rng(0)
    noisy = np.clip(
        img.astype(np.int16) + rng.integers(-3, 4, img.shape), 0, 255
    ).astype(np.uint8)
    assert _hamming(h0, mm._phash_bits(noisy)) <= 6
    # brightness shift moves only DC-adjacent ordering
    bright = np.clip(img.astype(np.int16) + 12, 0, 255).astype(np.uint8)
    assert _hamming(h0, mm._phash_bits(bright)) <= 8
    # 2x upscale (nearest) keeps the hash close: area resize smooths it
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert _hamming(h0, mm._phash_bits(up)) <= 6
    # structurally different images land far apart
    dists = [
        _hamming(mm._phash_bits(_img(a)), mm._phash_bits(_img(b)))
        for a, b in [(1, 2), (2, 5), (5, 9), (9, 11)]
    ]
    assert min(dists) >= 16, dists


def test_perceptual_hash_distributed_matches_local(spark):
    imgs = [_img(s) for s in range(6)]
    rows = [
        (i, im.shape[1], im.shape[0], im.ravel().astype(np.int32).tolist())
        for i, im in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, schema="media_id long, width int, height int, pixels array<int>"
    )
    got = {r["media_id"]: r["phash"]
           for r in mm.perceptual_hash(df).collect()}
    for i, im in enumerate(imgs):
        assert got[i] == mm._phash_bits(im)
    with pytest.raises(ValueError):
        mm.perceptual_hash(df, kind="md5")


def test_phash_near_duplicates_planted(spark):
    """Planted jittered copies are recovered via the banded join; the
    pairs list carries exact hamming distances."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(12):
        im = _img(100 + i)
        rows.append((i, im))
        if i < 4:  # plant a near-dup twin of the first four
            tw = np.clip(
                im.astype(np.int16) + rng.integers(-2, 3, im.shape), 0, 255
            ).astype(np.uint8)
            rows.append((100 + i, tw))
    df = spark.createDataFrame(
        [
            (i, im.shape[1], im.shape[0],
             im.ravel().astype(np.int32).tolist())
            for i, im in rows
        ],
        schema="media_id long, width int, height int, pixels array<int>",
    )
    pairs = mm.phash_near_duplicates(df, max_hamming=6, n_blocks=8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(4):
        assert (i, 100 + i) in got, (i, got)
    assert all(r["hamming"] <= 6 for r in pairs)


def test_hamming_near_duplicates_brute_force_parity(spark):
    """Generic banded join == O(n^2) brute force on random hashes
    (pigeonhole recall is exact, verify filter is exact)."""
    from xarray_spatial_spark.functions.dedup import hamming_near_duplicates

    rng = np.random.default_rng(1)
    base = rng.integers(-(2 ** 63), 2 ** 63, size=60, dtype=np.int64)
    # plant close pairs: flip <= 4 random bits of some hashes
    hashes = [int(v) for v in base]
    for i in range(10):
        v = int(base[i])
        for b in rng.choice(64, size=int(rng.integers(0, 5)), replace=False):
            v ^= 1 << int(b)
        v &= (1 << 64) - 1
        hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(hashes)),
                      "h": pd.array(hashes, dtype="int64")})
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_duplicates(
            df, hash_col="h", max_hamming=4, n_blocks=6
        ).collect()
    }
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                want[(i, j)] = d
    assert got == want


# ---------------------------------------------------------------------------
# video near-dup over animated GIF (the from-scratch video container)
# ---------------------------------------------------------------------------

_GRAYS = np.stack([np.arange(64) * 4] * 3, axis=1).astype(np.uint8)


def _gif_video(seed: int, n_frames: int = 6, jitter: int = 0) -> bytes:
    """Animated GIF of textured frames; index jitter simulates a
    re-encode (±1 palette step = ±4 luma)."""
    frames = []
    for f in range(n_frames):
        img = _img(seed * 100 + f)
        idx = (img.mean(axis=2) / 4).astype(np.int64)
        if jitter:
            rng = np.random.default_rng(seed * 997 + f)
            idx = idx + rng.integers(-jitter, jitter + 1, idx.shape)
        frames.append(np.clip(idx, 0, 63).astype(np.uint8))
    return mm.encode_gif(frames, _GRAYS, delays_ms=[100] * n_frames)


def test_video_near_duplicates_planted(spark):
    rows = [(i, _gif_video(i)) for i in range(6)]
    # re-encoded twin of video 0 (jittered indices), same frames
    rows.append((100, _gif_video(0, jitter=1)))
    # subset clip: first 3 frames of video 1
    sub = _gif_video(1)
    frames, delays = mm.decode_gif_frames(sub)
    idx_frames = [(fr.mean(axis=2) / 4).astype(np.uint8) for fr in frames[:3]]
    rows.append((200, mm.encode_gif(idx_frames, _GRAYS, delays_ms=[100] * 3)))
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]): r for r in mm.video_near_duplicates(
        df, max_hamming=6, frame_match_frac=0.5, n_blocks=8).collect()}
    assert (0, 100) in pairs, pairs.keys()
    assert pairs[(0, 100)]["frac_a"] == 1.0
    assert (1, 200) in pairs, pairs.keys()  # subset clip caught
    assert pairs[(1, 200)]["frac_b"] == 1.0  # all of the clip matches
    # distinct videos never pair
    for a, b in pairs:
        assert {a, b} <= {0, 100} or {a, b} <= {1, 200}, (a, b)


def test_video_near_duplicates_order_invariant(spark):
    """Re-cut (reversed frame order) still matches: set semantics."""
    vid = _gif_video(3)
    frames, _ = mm.decode_gif_frames(vid)
    rev = [(fr.mean(axis=2) / 4).astype(np.uint8) for fr in frames[::-1]]
    rows = [(0, vid), (1, mm.encode_gif(rev, _GRAYS, delays_ms=[100] * len(rev)))]
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    pairs = mm.video_near_duplicates(
        df, max_hamming=6, frame_match_frac=0.9, n_blocks=8).collect()
    assert len(pairs) == 1 and pairs[0]["frac_a"] == 1.0
    import pytest
    with pytest.raises(ValueError):
        mm.video_near_duplicates(df, frame_match_frac=0.0)


def test_media_kind_and_mixed_near_duplicates(spark):
    from xarray_spatial_spark.operators import audio as au

    img = _img(1)
    img_tw = np.clip(img.astype(np.int16) + np.random.default_rng(0)
                     .integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    t = np.arange(19200) / 16000.0
    rng = np.random.default_rng(5)
    spec = np.fft.rfft(rng.standard_normal(19200))
    spec /= np.sqrt(np.fft.rfftfreq(19200, 1 / 16000.0) + 20.0)
    bed = np.fft.irfft(spec, 19200)
    wav = np.sin(2 * np.pi * 700 * t) + 1.5 * bed / np.std(bed)
    wav = (wav / np.max(np.abs(wav)) * 0.7).astype(np.float32)
    pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    pcm_tw = (np.clip(0.4 * wav, -1, 1) * 32767).astype(np.int16)
    rows = [
        (0, mm.encode_png(img)),
        (1, mm.encode_png(img_tw)),
        (2, au.encode_wav(pcm, 16000, "pcm")),
        (3, au.encode_wav(pcm_tw, 16000, "pcm")),
        (4, _gif_video(2)),
        (5, _gif_video(2, jitter=1)),
        (6, b"\x00\x01unknown-payload"),
        (7, mm.encode_ppm(_img(9))),           # lone image, no twin
        (8, b"%PDF-1.7 minimal"),              # document routing
        (9, bytes(4) + b"ftypisom" + bytes(8)),  # ISO-BMFF routing
    ]
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    kinds = {r["media_id"]: r["k"] for r in df.select(
        "media_id", mm.media_kind(mm.F.col("payload")).alias("k")).collect()}
    assert kinds == {0: "image", 1: "image", 2: "audio", 3: "audio",
                     4: "video", 5: "video", 6: "other", 7: "image",
                     8: "document", 9: "video"}
    # WebP payloads are RIFF but route as image
    from xarray_spatial_spark.operators import webp
    wimg = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    wp = spark.createDataFrame(
        [(0, webp.encode_webp_lossless(wimg))],
        schema="media_id long, payload binary")
    assert wp.select(mm.media_kind(mm.F.col("payload"))).collect()[0][0] == "image"

    pairs = mm.media_near_duplicates(df, n_blocks=8).collect()
    got = {(r["modality"], r["id_a"], r["id_b"]) for r in pairs}
    assert got == {("image", 0, 1), ("audio", 2, 3), ("video", 4, 5)}, got
    assert all(0.0 < r["similarity"] <= 1.0 for r in pairs)


def test_image_quality_signals(spark):
    """The media Gopher gate: flat fills, slivers and tiny images are
    dropped; textured real-size images keep."""
    rng2 = np.random.default_rng(3)
    textured = rng2.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    flat = np.full((64, 64, 3), 200, np.uint8)
    sliver = rng2.integers(0, 256, (8, 200, 3)).astype(np.uint8)
    tiny = rng2.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    rows = [
        (0, mm.encode_png(textured)),
        (1, mm.encode_png(flat)),
        (2, mm.encode_png(sliver)),
        (3, mm.encode_png(tiny)),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = {r["id"]: r for r in mm.image_quality_signals(df).collect()}
    assert out[0]["keep"] and out[0]["px_entropy"] > 4
    assert not out[1]["keep"] and out[1]["px_std"] == 0.0
    assert not out[2]["keep"] and out[2]["aspect"] == 25.0
    assert not out[3]["keep"] and (out[3]["width"], out[3]["height"]) == (4, 4)
    assert not out[4]["keep"] and out[4]["err"]
    assert out[0]["err"] is None
