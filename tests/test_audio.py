"""Compressed-audio tier: from-scratch WAV codecs oracled against
CPython's audioop C implementation, handcrafted MP3/Ogg/FLAC headers
for the metadata parsers, distributed == direct for the mapInPandas
stages, and skip-clean system-lib decode tests (libmpg123 /
libvorbisfile are absent from this image)."""

import numpy as np
import pytest

from xarray_spatial_spark.operators import audio as au

try:
    import audioop  # removed in py3.13; tests below skip without it
except ImportError:
    audioop = None

needs_audioop = pytest.mark.skipif(audioop is None, reason="no audioop")


# ---------------------------------------------------------------------------
# G.711 tables vs the CPython C oracle
# ---------------------------------------------------------------------------


@needs_audioop
def test_ulaw_table_matches_audioop():
    raw = bytes(range(256))
    want = np.frombuffer(audioop.ulaw2lin(raw, 2), "<i2")
    np.testing.assert_array_equal(au.ULAW_TABLE, want)


@needs_audioop
def test_alaw_table_matches_audioop():
    raw = bytes(range(256))
    want = np.frombuffer(audioop.alaw2lin(raw, 2), "<i2")
    np.testing.assert_array_equal(au.ALAW_TABLE, want)


@needs_audioop
def test_ulaw_wav_roundtrip_vs_audioop_encoder():
    """Fixture encoded by audioop.lin2ulaw (third party), decoded by
    our WAV path — sample-exact agreement with audioop's decode."""
    rng = np.random.default_rng(5)
    pcm = (rng.uniform(-1, 1, 4000) * 32767).astype(np.int16)
    encoded = audioop.lin2ulaw(pcm.astype("<i2").tobytes(), 2)
    # wrap the audioop-encoded stream in a WAV container by hand
    wav = au.encode_wav(np.zeros(0, np.int16), 8000, "ulaw")
    wav = wav[: wav.rindex(b"data") + 8 - 4] + len(encoded).to_bytes(
        4, "little") + encoded
    got, rate = au.decode_wav_any(wav)
    want = np.frombuffer(audioop.ulaw2lin(encoded, 2), "<i2")
    np.testing.assert_array_equal((got * 32768.0).astype(np.int16), want)
    assert rate == 8000


# ---------------------------------------------------------------------------
# IMA ADPCM vs audioop (same step tables, nibble order swapped)
# ---------------------------------------------------------------------------


@needs_audioop
def test_ima_step_function_matches_audioop():
    """Decode a random nibble stream from a seeded state with our
    kernel and with audioop.adpcm2lin (state=(pred, index)); audioop
    packs HIGH nibble first, WAV packs LOW first."""
    rng = np.random.default_rng(11)
    nibs = rng.integers(0, 16, 1000).astype(np.uint8)
    pred, index = 123, 7
    ours, fp, fi = au.ima_adpcm_decode_nibbles(nibs, pred, index)
    packed = bytes((int(nibs[i]) << 4) | int(nibs[i + 1])
                   for i in range(0, len(nibs), 2))
    want_b, (wp, wi) = audioop.adpcm2lin(packed, 2, (pred, index))
    want = np.frombuffer(want_b, "<i2")
    np.testing.assert_array_equal(ours, want)
    assert (fp, fi) == (wp, wi)


def test_ima_adpcm_wav_roundtrip_snr():
    """encode -> container -> decode reconstructs a smooth signal
    with high SNR (ADPCM is lossy; ~20 dB+ on a sine)."""
    t = np.arange(6000)
    pcm = (8000 * np.sin(2 * np.pi * t * 220 / 16000)).astype(np.int16)
    wav = au.encode_wav(pcm, 16000, "ima-adpcm")
    got, rate = au.decode_wav_any(wav)
    assert rate == 16000
    x = got[: len(pcm)] * 32768.0
    err = x - pcm[: len(x)]
    snr = 10 * np.log10(np.mean(pcm[: len(x)] ** 2.0)
                        / max(np.mean(err ** 2.0), 1e-9))
    assert snr > 20, snr


def test_alaw_pcm_wavs_agree():
    """A-law round trip stays within one quantization level of PCM."""
    rng = np.random.default_rng(3)
    pcm = (rng.uniform(-0.5, 0.5, 2000) * 32767).astype(np.int16)
    a, _ = au.decode_wav_any(au.encode_wav(pcm, 8000, "alaw"))
    p, _ = au.decode_wav_any(au.encode_wav(pcm, 8000, "pcm"))
    # max A-law quantization step at half scale is < 1024/32768
    assert np.max(np.abs(a - p)) < 1024 / 32768.0


def test_unknown_wav_codec_raises_by_name():
    wav = bytearray(au.encode_wav(np.zeros(8, np.int16), 8000, "pcm"))
    wav[20] = 0x55  # bogus codec id in fmt
    with pytest.raises(NotImplementedError, match="0x55"):
        au.decode_wav_any(bytes(wav))


# ---------------------------------------------------------------------------
# MP3 frame headers (handcrafted from the public spec)
# ---------------------------------------------------------------------------


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0, mono=False) -> bytes:
    """One MPEG-1 Layer III frame: 0xFFFB = sync + MPEG1 + LIII."""
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    hdr = bytes([0xFF, 0xFB, b2, b3])
    h = au.mp3_frame_header(hdr)
    return hdr + bytes(h["frame_bytes"] - 4)


def test_mp3_frame_header_fields():
    h = au.mp3_frame_header(_mp3_frame()[:4])
    assert h == {"version": "1", "layer": 3, "bitrate": 128000,
                 "sample_rate": 44100, "channels": 2,
                 "frame_bytes": 417, "frame_samples": 1152}
    h2 = au.mp3_frame_header(_mp3_frame(padding=1)[:4])
    assert h2["frame_bytes"] == 418
    # MPEG-2 layer III: 0xFFF3 version bits = 2
    h3 = au.mp3_frame_header(bytes([0xFF, 0xF3, 0x92, 0x00]))
    assert (h3["sample_rate"], h3["frame_samples"]) == (22050, 576)
    assert au.mp3_frame_header(b"\x00\x00\x00\x00") is None
    assert au.mp3_frame_header(bytes([0xFF, 0xFB, 0xF0, 0])) is None  # bad br


def test_mp3_metadata_walks_frames_and_skips_id3():
    frames = b"".join(_mp3_frame() for _ in range(10))
    tag = b"ID3\x04\x00\x00\x00\x00\x01\x10" + bytes(0x90)  # syncsafe 0x90
    m = au.mp3_metadata(tag + frames)
    assert m["frames"] == 10 and m["sample_rate"] == 44100
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert m["bitrate"] == 128000 and m["channels"] == 2


def test_mp3_metadata_xing_frame_count():
    first = bytearray(_mp3_frame())
    xing = b"Xing" + (1).to_bytes(4, "big") + (9999).to_bytes(4, "big")
    first[40:40 + len(xing)] = xing
    m = au.mp3_metadata(bytes(first))
    assert m["frames"] == 9999
    assert m["duration_ms"] == 9999 * 1152 * 1000 // 44100


def test_mp3_false_sync_rejected():
    # 0xFF followed by garbage that parses as a header must be
    # confirmed by a second frame — a lone sync mid-noise is skipped
    noise = b"\x00" * 7 + bytes([0xFF, 0xFB, 0x92, 0x00]) + b"\x00" * 50
    with pytest.raises(ValueError):
        au.mp3_metadata(noise)


# ---------------------------------------------------------------------------
# Ogg/Vorbis + FLAC metadata (handcrafted)
# ---------------------------------------------------------------------------


def _ogg_vorbis(rate=48000, channels=2, granule=480000) -> bytes:
    ident = (b"\x01vorbis" + (0).to_bytes(4, "little")
             + bytes([channels]) + rate.to_bytes(4, "little")
             + (0).to_bytes(4, "little", signed=True)
             + (160000).to_bytes(4, "little", signed=True)
             + (0).to_bytes(4, "little", signed=True) + b"\xb8\x01")
    page0 = (b"OggS\x00\x02" + (0).to_bytes(8, "little")
             + (1).to_bytes(4, "little") + (0).to_bytes(4, "little")
             + (0).to_bytes(4, "little") + bytes([1, len(ident)]) + ident)
    last = (b"OggS\x00\x04" + granule.to_bytes(8, "little")
            + (1).to_bytes(4, "little") + (7).to_bytes(4, "little")
            + (0).to_bytes(4, "little") + bytes([1, 4]) + b"\x00\x00\x00\x00")
    return page0 + last


def test_ogg_vorbis_metadata():
    m = au.ogg_vorbis_metadata(_ogg_vorbis())
    assert m == {"codec": "vorbis", "sample_rate": 48000, "channels": 2,
                 "duration_ms": 10000, "bitrate": 160000}


def _flac(rate=44100, channels=1, total=44100 * 3) -> bytes:
    packed = (rate << 44) | ((channels - 1) << 41) | (16 - 1) << 36 | total
    si = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + b"\x80" + len(si).to_bytes(3, "big") + si


def test_flac_metadata():
    m = au.flac_metadata(_flac())
    assert (m["sample_rate"], m["channels"], m["duration_ms"]) == (
        44100, 1, 3000)


def test_sniff_audio():
    assert au.sniff_audio(au.encode_wav(np.zeros(4, np.int16), 8000,
                                        "ima-adpcm")) == "wav-ima-adpcm"
    assert au.sniff_audio(_ogg_vorbis()) == "ogg-vorbis"
    assert au.sniff_audio(_flac()) == "flac"
    assert au.sniff_audio(_mp3_frame()) == "mp3"
    assert au.sniff_audio(b"ID3\x04" + bytes(20)) == "mp3"
    assert au.sniff_audio(b"garbage!") == "unknown"


# ---------------------------------------------------------------------------
# distributed stages
# ---------------------------------------------------------------------------


def _media_df(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i, codec in enumerate(["pcm", "ulaw", "alaw", "ima-adpcm"] * 2):
        pcm = (rng.uniform(-0.7, 0.7, 1500 + 100 * i) * 32767).astype(np.int16)
        rows.append((i, au.encode_wav(pcm, 8000 + 1000 * i, codec)))
    rows.append((100, _mp3_frame() * 5))
    rows.append((101, _ogg_vorbis()))
    rows.append((102, _flac()))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_audio_metadata_distributed_matches_direct(spark):
    df = _media_df(spark)
    got = {r["media_id"]: r for r in au.audio_metadata(df).collect()}
    for r in df.collect():
        want = au.audio_metadata_bytes(bytes(r["payload"]))
        g = got[r["media_id"]]
        for k in ("codec", "sample_rate", "channels", "duration_ms"):
            assert g[k] == want[k], (r["media_id"], k)
    assert got[100]["codec"] == "mp3" and got[100]["duration_ms"] > 0
    assert got[101]["sample_rate"] == 48000
    assert got[102]["codec"] == "flac"


def test_decode_audio_distributed_matches_direct(spark):
    df = _media_df(spark).filter("media_id < 100")  # WAV family
    out = {r["media_id"]: r for r in au.decode_audio(df).collect()}
    for r in df.collect():
        want, rate = au.decode_audio_bytes(bytes(r["payload"]))
        g = out[r["media_id"]]
        assert g["sample_rate"] == rate
        np.testing.assert_allclose(
            np.asarray(g["samples"], np.float32), want, atol=1e-6)


def test_decode_audio_compressed_raises_by_name(spark):
    """Without system libs, MP3/Ogg decode raises naming the library
    (skip-variant: decodes fine when a lib IS present)."""
    if au._libmpg123() is not None:
        x, rate = au.decode_mp3(_mp3_frame() * 20)
        assert rate == 44100 and len(x) > 0
    else:
        with pytest.raises(NotImplementedError, match="libmpg123"):
            au.decode_mp3(_mp3_frame() * 5)
    if au._libvorbisfile() is None:
        with pytest.raises(NotImplementedError, match="libvorbisfile"):
            au.decode_ogg(_ogg_vorbis())


# ---------------------------------------------------------------------------
# acoustic fingerprint (Haitsma-Kalker-style) + near-dup
# ---------------------------------------------------------------------------


def _tone_mix(seed: int, secs: float = 1.2, rate: int = 16000) -> np.ndarray:
    """Deterministic BROADBAND clip: tones + AM envelope over a shaped
    1/f noise bed.  Broadband matters — on a pure-tone mix most log
    bands hold only FFT leakage, so adjacent-band comparisons are
    sign-of-noise and the fingerprint degenerates (same caveat as
    pHash on ultra-smooth gradients); real speech/music is broadband."""
    rng = np.random.default_rng(seed)
    n = int(secs * rate)
    t = np.arange(n) / rate
    x = np.zeros_like(t)
    for _ in range(5):
        f = rng.uniform(350, 4500)
        x += rng.uniform(0.2, 1.0) * np.sin(
            2 * np.pi * f * t + rng.uniform(0, 6))
    spec = np.fft.rfft(rng.standard_normal(n))
    spec /= np.sqrt(np.fft.rfftfreq(n, 1.0 / rate) + 20.0)
    bed = np.fft.irfft(spec, n)
    x += 1.5 * bed / np.std(bed)
    x *= 1 + 0.4 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
    return (x / np.max(np.abs(x)) * 0.7).astype(np.float32)


def _pcm16(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, -1, 1) * 32767).astype(np.int16)


def _ham64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_volume_invariant_noise_robust_distinct_far():
    x = _tone_mix(1)
    h0 = au._fingerprint_bits(x, 16000)
    assert h0 != 0
    # exact gain invariance: every band scales by the same constant
    assert au._fingerprint_bits(0.25 * x, 16000) == h0
    assert au._fingerprint_bits(0.03 * x, 16000) == h0
    # light additive noise (re-encode-artifact grade) flips few bits
    rng = np.random.default_rng(0)
    noisy = x + 0.02 * rng.standard_normal(len(x)).astype(np.float32)
    assert _ham64(h0, au._fingerprint_bits(noisy, 16000)) <= 6
    # 16-bit quantization round-trip is a tiny perturbation
    q = _pcm16(x).astype(np.float32) / 32768.0
    assert _ham64(h0, au._fingerprint_bits(q, 16000)) <= 4
    # different material lands far away
    d = [_ham64(au._fingerprint_bits(_tone_mix(a), 16000),
                au._fingerprint_bits(_tone_mix(b), 16000))
         for a, b in [(1, 2), (2, 5), (5, 9), (3, 7)]]
    assert min(d) >= 12, d
    # degenerate inputs hash to 0, never raise
    assert au._fingerprint_bits(np.zeros(100, np.float32), 16000) == 0
    assert au._fingerprint_bits(np.zeros(50000, np.float32), 16000) == 0


def test_audio_near_duplicates_planted(spark):
    rows = []
    rng = np.random.default_rng(42)
    for i in range(10):
        x = _tone_mix(100 + i)
        rows.append((i, au.encode_wav(_pcm16(x), 16000, "pcm")))
        if i < 4:  # plant a re-encoded twin: gain + light noise + quant
            tw = 0.4 * x + 0.01 * rng.standard_normal(len(x)).astype(
                np.float32)
            rows.append((1000 + i, au.encode_wav(_pcm16(tw), 16000, "pcm")))
    df = spark.createDataFrame(rows, schema="media_id long, payload binary")
    pairs = au.audio_near_duplicates(df, max_hamming=8, n_blocks=10).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(4):
        assert (i, 1000 + i) in got, (i, got)
    assert all(r["hamming"] <= 8 for r in pairs)


def test_audio_fingerprint_distributed_matches_local(spark):
    clips = [_tone_mix(s) for s in (3, 4)]
    df = spark.createDataFrame(
        [(i, au.encode_wav(_pcm16(c), 16000, "pcm"))
         for i, c in enumerate(clips)],
        schema="media_id long, payload binary")
    got = {r["media_id"]: r["afp"]
           for r in au.audio_fingerprint(df).collect()}
    for i, c in enumerate(clips):
        x, rate = au.decode_audio_bytes(
            au.encode_wav(_pcm16(c), 16000, "pcm"))
        assert got[i] == au._fingerprint_bits(x, rate)


def test_log_mel_spectrogram_tone_localization():
    """A pure tone concentrates energy in the mel band whose center is
    nearest the tone; silence sits at the log floor."""
    import numpy as np

    from xarray_spatial_spark.operators.audio import (
        _mel_filterbank, log_mel_spectrogram)

    rate = 16000
    t = np.arange(rate) / rate
    for hz in (500, 1000, 3000):
        m = log_mel_spectrogram(np.sin(2 * np.pi * hz * t), rate)
        assert m.shape == (61, 40)
        fb = _mel_filterbank(40, 512, rate)
        freqs = np.fft.rfftfreq(512, 1 / rate)
        centers = (fb * freqs).sum(1) / np.maximum(fb.sum(1), 1e-12)
        peak = centers[m.mean(axis=0).argmax()]
        assert abs(peak - hz) / hz < 0.25
    sil = log_mel_spectrogram(np.zeros(rate), rate)
    assert np.all(sil == np.log(1e-10))
    # shorter-than-window input pads instead of failing
    assert log_mel_spectrogram(np.ones(100), rate).shape[0] == 1


def test_audio_features_distributed(spark):
    import numpy as np

    from xarray_spatial_spark.operators import audio as au

    rate = 16000
    t = np.arange(rate) / rate
    pcm = (np.sin(2 * np.pi * 700 * t) * 20000).astype(np.int16)
    rows = [(0, au.encode_wav(pcm, rate, "pcm")),
            (1, b"not audio at all")]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = {r["id"]: r for r in au.audio_features(df, max_frames=10).collect()}
    assert out[0]["err"] is None
    assert (out[0]["n_frames"], out[0]["n_mels"]) == (10, 40)
    assert len(out[0]["features"]) == 400
    assert out[1]["err"] and out[1]["n_frames"] == 0
