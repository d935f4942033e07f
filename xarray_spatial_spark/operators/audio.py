"""Compressed-audio decode — the audio half of the multimodal tier.

Reference parity: xarray-spatial has no audio tier; this implements
the training-data-pipeline "multimodal columns" requirement (opaque
binary payloads + typed metadata, Arrow-batched decode stages) for
audio the way operators/multimodal.py + operators/webp.py do for
images.

Three honesty tiers, mirroring the image codecs:

- FROM-SCRATCH decode, pure numpy + stdlib, validated against
  CPython's ``audioop`` C implementation in tests: WAV containers
  carrying PCM16, G.711 mu-law (codec 7), G.711 A-law (codec 6) and
  IMA/DVI ADPCM (codec 0x11, 4 bits/sample).  These are the
  telephony/speech-corpus compression formats that need no
  perceptual model.
- FROM-SCRATCH metadata (no decode): MP3 frame headers (MPEG-1/2/2.5
  layers I-III, ID3v2 skip, Xing/Info VBR frame count), Ogg/Vorbis
  identification header + terminal granule position, FLAC
  STREAMINFO.  A crawl pipeline filters/buckets on (codec, rate,
  channels, duration) WITHOUT paying for PCM; this path is pure
  parsing and fully tested.
- SYSTEM-LIBRARY PCM decode for perceptual codecs, loaded per worker
  via ctypes exactly like operators/webp.py's lossy-VP8 path:
  MP3 through libmpg123 (feed API, no temp file), Ogg/Vorbis through
  libvorbisfile (``ov_fopen`` on a spooled temp file).  Absent the
  library — as in this image — ``decode_audio`` raises
  ``NotImplementedError`` naming the format and the library, and the
  oracle tests skip cleanly.

At 100 TB the plumbing is the same as decode_image: payloads stay in
parquet, ``mapInPandas`` streams Arrow batches through the decoder on
executors, and only the small outputs (metadata rows, feature
vectors) ever shuffle.  Cap Arrow batch bytes with
``spark.sql.execution.arrow.maxRecordsPerBatch`` for multi-MB blobs.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (tables built from the spec formulas; tests
# assert all 256 entries equal audioop.ulaw2lin / alaw2lin)
# ---------------------------------------------------------------------------


def _build_ulaw_table() -> np.ndarray:
    out = np.empty(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0x0F
        s = (((mant << 3) + 0x84) << exp) - 0x84
        out[b] = -s if u & 0x80 else s
    return out


def _build_alaw_table() -> np.ndarray:
    out = np.empty(256, np.int16)
    for b in range(256):
        a = b ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0x0F
        s = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
        out[b] = s if a & 0x80 else -s
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (4-bit).  Step tables from the IMA ADPCM spec;
# identical to CPython audioop's (the test seeds audioop with this
# decoder's block state and asserts sample-exact agreement).
# ---------------------------------------------------------------------------

IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32)
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)


def ima_adpcm_decode_nibbles(
    nibbles: np.ndarray, pred: int, index: int
) -> tuple[np.ndarray, int, int]:
    """Decode a 4-bit nibble sequence from state (pred, index).
    Returns (int16 samples, final pred, final index).  The per-sample
    dependency chain is inherent to ADPCM — the loop is per payload,
    not per row-batch, and blocks are independent (each WAV block
    header re-seeds the state), which is what makes the format
    splittable at scale."""
    out = np.empty(len(nibbles), np.int16)
    for i, nib in enumerate(nibbles):
        step = int(IMA_STEP_TABLE[index])
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(IMA_INDEX_TABLE[nib])))
        out[i] = pred
    return out, pred, index


def ima_adpcm_encode(samples: np.ndarray, block_samples: int = 505) -> bytes:
    """mono int16 -> WAV-layout IMA ADPCM blocks (4-byte header:
    int16 predictor, uint8 step index, reserved; then nibbles packed
    LOW nibble first).  block_samples counts the header sample plus
    an even nibble run; 505 -> the canonical 256-byte block."""
    samples = np.asarray(samples, np.int16)
    blocks = []
    index = 0
    i = 0
    while i < len(samples):
        chunk = samples[i:i + block_samples]
        pred = int(chunk[0])
        hdr = int(pred & 0xFFFF).to_bytes(2, "little") + bytes([index, 0])
        nibs = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            if delta < 0:
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[nib])))
            nibs.append(nib)
        if len(nibs) & 1:
            nibs.append(0)
        body = bytes(nibs[j] | (nibs[j + 1] << 4) for j in range(0, len(nibs), 2))
        blocks.append(hdr + body)
        i += block_samples
    return b"".join(blocks)


def _decode_ima_blocks(data: bytes, block_align: int, channels: int) -> np.ndarray:
    """WAV IMA ADPCM data chunk -> mono-mixed int16 samples."""
    outs = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off:off + block_align]
        chans = []
        for c in range(channels):
            h = c * 4
            pred = int.from_bytes(block[h:h + 2], "little", signed=True)
            index = min(88, block[h + 2])
            body = np.frombuffer(block, np.uint8, offset=4 * channels)
            # nibbles are packed low-first, interleaved in 4-byte
            # (8-sample) runs per channel
            by = body.reshape(-1, 4 * channels)[:, 4 * c:4 * (c + 1)].ravel() \
                if channels > 1 else body
            nibs = np.empty(by.size * 2, np.uint8)
            nibs[0::2] = by & 0x0F
            nibs[1::2] = by >> 4
            dec, _, _ = ima_adpcm_decode_nibbles(nibs, pred, index)
            chans.append(np.concatenate([[pred], dec]).astype(np.int32))
        n = min(len(ch) for ch in chans)
        outs.append(np.mean([ch[:n] for ch in chans], axis=0).astype(np.int16)
                    if channels > 1 else chans[0].astype(np.int16))
    return np.concatenate(outs) if outs else np.empty(0, np.int16)


# ---------------------------------------------------------------------------
# WAV container (all codecs this module decodes natively)
# ---------------------------------------------------------------------------

_WAV_CODECS = {1: "pcm", 6: "alaw", 7: "ulaw", 0x11: "ima-adpcm"}


def decode_wav_any(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (float32 samples in [-1, 1] mono-mixed, rate).
    Codecs: PCM16, G.711 A-law/mu-law, IMA ADPCM.  Others raise
    NotImplementedError by codec id."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt = 12, None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        sz = int.from_bytes(buf[i + 4:i + 8], "little")
        if cid == b"fmt ":
            fmt = buf[i + 8:i + 8 + sz]
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            codec = int.from_bytes(fmt[0:2], "little")
            channels = max(1, int.from_bytes(fmt[2:4], "little"))
            rate = int.from_bytes(fmt[4:8], "little")
            block_align = int.from_bytes(fmt[12:14], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            data = buf[i + 8:i + 8 + sz]
            if codec == 1 and bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float32)
            elif codec == 6:
                x = ALAW_TABLE[np.frombuffer(data, np.uint8)].astype(np.float32)
            elif codec == 7:
                x = ULAW_TABLE[np.frombuffer(data, np.uint8)].astype(np.float32)
            elif codec == 0x11:
                x = _decode_ima_blocks(data, block_align, channels)
                return np.asarray(x, np.float32) / 32768.0, rate
            else:
                raise NotImplementedError(
                    f"WAV codec 0x{codec:x}/{bits}bit not supported "
                    "(PCM16, A-law, mu-law, IMA ADPCM decode natively)")
            if channels > 1:
                x = x[: len(x) - len(x) % channels]
                x = x.reshape(-1, channels).mean(axis=1)
            return np.asarray(x, np.float32) / 32768.0, rate
        i += 8 + sz + (sz & 1)
    raise ValueError("no data chunk")


def encode_wav(samples: np.ndarray, rate: int, codec: str = "pcm") -> bytes:
    """mono int16 -> RIFF/WAVE in pcm / ulaw / alaw / ima-adpcm.
    The compressed encoders exist for fixtures and round-trip tests
    (same posture as webp.py's literal-only VP8L encoder); decode is
    the production path."""
    samples = np.asarray(samples, np.int16)
    if codec == "pcm":
        cid, bits, data = 1, 16, samples.astype("<i2").tobytes()
        block = 2
    elif codec in ("ulaw", "alaw"):
        table = ULAW_TABLE if codec == "ulaw" else ALAW_TABLE
        # nearest-level quantization via the decode table (exact
        # inverse on decoded levels, which is all the tests need)
        order = np.argsort(table, kind="stable")
        lv = table[order].astype(np.int32)
        idx = np.clip(np.searchsorted(lv, samples.astype(np.int32)), 0, 255)
        idx_lo = np.clip(idx - 1, 0, 255)
        pick = np.where(
            np.abs(lv[idx] - samples) <= np.abs(samples - lv[idx_lo]),
            idx, idx_lo)
        cid, bits = (7, 8) if codec == "ulaw" else (6, 8)
        data, block = order[pick].astype(np.uint8).tobytes(), 1
    elif codec == "ima-adpcm":
        cid, bits, block = 0x11, 4, 256
        data = ima_adpcm_encode(samples, block_samples=505)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    byte_rate = rate * block if codec != "pcm" else rate * 2
    fmt = (cid.to_bytes(2, "little") + (1).to_bytes(2, "little")
           + rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + block.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    if codec == "ima-adpcm":
        fmt += (2).to_bytes(2, "little") + (505).to_bytes(2, "little")
    return (b"RIFF" + (20 + len(fmt) + len(data)).to_bytes(4, "little")
            + b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)


# ---------------------------------------------------------------------------
# MP3 frame headers (metadata only — decode goes through libmpg123)
# ---------------------------------------------------------------------------

_MP3_BITRATES = {  # kbps; row = (version_group, layer), col = header index
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}  # by version bits (2.5 = 0)


def mp3_frame_header(hdr: bytes) -> dict | None:
    """Parse one 4-byte MPEG audio frame header; None if invalid."""
    if len(hdr) < 4 or hdr[0] != 0xFF or (hdr[1] & 0xE0) != 0xE0:
        return None
    version_bits = (hdr[1] >> 3) & 3          # 3=MPEG1 2=MPEG2 0=MPEG2.5
    layer_bits = (hdr[1] >> 1) & 3            # 3=I 2=II 1=III
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    vgroup = 1 if version_bits == 3 else 2
    br_idx = hdr[2] >> 4
    sr_idx = (hdr[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[version_bits][sr_idx]
    padding = (hdr[2] >> 1) & 1
    channels = 1 if (hdr[3] >> 6) & 3 == 3 else 2
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        frame_len = samples * bitrate // (8 * rate) + padding
    return {"version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
            "layer": layer, "bitrate": bitrate, "sample_rate": rate,
            "channels": channels, "frame_bytes": frame_len,
            "frame_samples": samples}


def _skip_id3(buf: bytes) -> int:
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    sz = ((buf[6] & 0x7F) << 21 | (buf[7] & 0x7F) << 14
          | (buf[8] & 0x7F) << 7 | (buf[9] & 0x7F))
    return 10 + sz


def mp3_metadata(buf: bytes) -> dict:
    """Walk the frame chain: (codec, sample_rate, channels,
    duration_ms, bitrate mean, frame count).  Honors a leading ID3v2
    tag and a Xing/Info VBR header's frame count when present.  Pure
    parsing — no PCM is produced."""
    pos = _skip_id3(buf)
    # resync: find the first valid header that is FOLLOWED by another
    # valid header (or end of buffer), the standard false-sync guard
    first = None
    while pos + 4 <= len(buf):
        h = mp3_frame_header(buf[pos:pos + 4])
        if h:
            nxt = pos + h["frame_bytes"]
            # a sync is real only if its frame fits in the buffer and
            # is the last one or chains into another valid header
            if nxt <= len(buf) and (nxt + 4 > len(buf)
                                    or mp3_frame_header(buf[nxt:nxt + 4])):
                first = h
                break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame found")
    # Xing/Info tag (VBR): frame count lives in the first frame;
    # located by magic rather than the version/channel side-info
    # offset table (equivalent, and robust to free-format edge cases)
    frames = 0
    total_br = 0
    xing = buf[pos + 4:pos + first["frame_bytes"]]
    xi = xing.find(b"Xing")
    if xi < 0:
        xi = xing.find(b"Info")
    if xi >= 0 and len(xing) >= xi + 12:
        flags = int.from_bytes(xing[xi + 4:xi + 8], "big")
        if flags & 1:
            frames = int.from_bytes(xing[xi + 8:xi + 12], "big")
    if frames == 0:
        p = pos
        while p + 4 <= len(buf):
            h = mp3_frame_header(buf[p:p + 4])
            if not h:
                break
            frames += 1
            total_br += h["bitrate"]
            p += h["frame_bytes"]
    dur = frames * first["frame_samples"] * 1000 // first["sample_rate"]
    return {"codec": "mp3", "sample_rate": first["sample_rate"],
            "channels": first["channels"], "frames": frames,
            "duration_ms": int(dur),
            "bitrate": (total_br // frames) if total_br else first["bitrate"]}


# ---------------------------------------------------------------------------
# Ogg/Vorbis + FLAC metadata (pure parsing)
# ---------------------------------------------------------------------------


def ogg_vorbis_metadata(buf: bytes) -> dict:
    """First Ogg page -> Vorbis identification header; duration from
    the LAST page's granule position (absolute PCM sample count)."""
    if buf[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    nseg = buf[26]
    body = buf[27 + nseg:]
    if body[:7] != b"\x01vorbis":
        raise NotImplementedError("Ogg stream is not Vorbis")
    channels = body[11]
    rate = int.from_bytes(body[12:16], "little")
    last = buf.rfind(b"OggS")
    granule = int.from_bytes(buf[last + 6:last + 14], "little", signed=True)
    dur = max(0, granule) * 1000 // rate if rate else 0
    return {"codec": "vorbis", "sample_rate": rate, "channels": channels,
            "duration_ms": int(dur), "bitrate":
            int.from_bytes(body[20:24], "little", signed=True)}


def flac_metadata(buf: bytes) -> dict:
    """fLaC STREAMINFO block -> rate / channels / duration."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    si = buf[8:42]  # first metadata block must be STREAMINFO (34 bytes)
    packed = int.from_bytes(si[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 7) + 1
    total = packed & ((1 << 36) - 1)
    return {"codec": "flac", "sample_rate": int(rate), "channels": channels,
            "duration_ms": int(total * 1000 // rate) if rate else 0,
            "bitrate": None}


# ---------------------------------------------------------------------------
# system-library decoders (ctypes, per-worker load — webp.py pattern)
# ---------------------------------------------------------------------------

_LIBMPG123: object = "unset"
_LIBVORBISFILE: object = "unset"


def _libmpg123():
    """System libmpg123 or None; cached per process."""
    global _LIBMPG123
    if _LIBMPG123 == "unset":
        _LIBMPG123 = None
        for name in ("libmpg123.so.0", "libmpg123.so",
                     ctypes.util.find_library("mpg123")):
            if not name:
                continue
            try:
                lib = ctypes.CDLL(name)
                lib.mpg123_init()
                lib.mpg123_new.restype = ctypes.c_void_p
                lib.mpg123_new.argtypes = [ctypes.c_char_p,
                                           ctypes.POINTER(ctypes.c_int)]
                _LIBMPG123 = lib
                break
            except OSError:
                continue
    return _LIBMPG123


def decode_mp3(buf: bytes) -> tuple[np.ndarray, int]:
    """MP3 -> (float32 mono samples, rate) via the system libmpg123
    (feed API — the payload never touches disk).  Raises by name
    when the library is absent."""
    lib = _libmpg123()
    if lib is None:
        raise NotImplementedError(
            "MP3 PCM decode needs the system libmpg123 (not installed); "
            "mp3_metadata() parses headers without it")
    err = ctypes.c_int()
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError("mpg123_new failed")
    try:
        lib.mpg123_open_feed(ctypes.c_void_p(h))
        lib.mpg123_feed(ctypes.c_void_p(h), buf, len(buf))
        rate = ctypes.c_long()
        ch = ctypes.c_int()
        enc = ctypes.c_int()
        chunks = []
        out = (ctypes.c_ubyte * 65536)()
        done = ctypes.c_size_t()
        while True:
            ret = lib.mpg123_read(ctypes.c_void_p(h), out, len(out),
                                  ctypes.byref(done))
            if done.value:
                chunks.append(bytes(out[:done.value]))
            if ret == -10:  # MPG123_NEED_MORE: payload exhausted
                break
            if ret == -11:  # MPG123_NEW_FORMAT
                lib.mpg123_getformat(ctypes.c_void_p(h), ctypes.byref(rate),
                                     ctypes.byref(ch), ctypes.byref(enc))
                continue
            if ret not in (0,):  # MPG123_OK
                break
        x = np.frombuffer(b"".join(chunks), "<i2").astype(np.float32)
        nch = max(1, ch.value)
        if nch > 1:
            x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
        return x / 32768.0, int(rate.value or 0)
    finally:
        lib.mpg123_delete(ctypes.c_void_p(h))


def _libvorbisfile():
    global _LIBVORBISFILE
    if _LIBVORBISFILE == "unset":
        _LIBVORBISFILE = None
        for name in ("libvorbisfile.so.3", "libvorbisfile.so",
                     ctypes.util.find_library("vorbisfile")):
            if not name:
                continue
            try:
                _LIBVORBISFILE = ctypes.CDLL(name)
                break
            except OSError:
                continue
    return _LIBVORBISFILE


def decode_ogg(buf: bytes) -> tuple[np.ndarray, int]:
    """Ogg/Vorbis -> (float32 mono samples, rate) via the system
    libvorbisfile (``ov_fopen`` on a spooled temp file — the memory-
    callback ABI is not worth hand-rolling in ctypes).  Raises by
    name when the library is absent."""
    lib = _libvorbisfile()
    if lib is None:
        raise NotImplementedError(
            "Ogg/Vorbis PCM decode needs the system libvorbisfile (not "
            "installed); ogg_vorbis_metadata() parses headers without it")
    import os
    import tempfile

    meta = ogg_vorbis_metadata(buf)
    vf = (ctypes.c_ubyte * 1024)()  # OggVorbis_File is ~720 bytes
    fd, path = tempfile.mkstemp(suffix=".ogg")
    try:
        os.write(fd, buf)
        os.close(fd)
        if lib.ov_fopen(path.encode(), vf) != 0:
            raise ValueError("libvorbisfile failed to open payload")
        try:
            chunks = []
            out = (ctypes.c_char * 65536)()
            bs = ctypes.c_int()
            while True:
                n = lib.ov_read(vf, out, len(out), 0, 2, 1, ctypes.byref(bs))
                if n <= 0:
                    break
                chunks.append(out.raw[:n])
            x = np.frombuffer(b"".join(chunks), "<i2").astype(np.float32)
            nch = meta["channels"]
            if nch > 1:
                x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
            return x / 32768.0, meta["sample_rate"]
        finally:
            lib.ov_clear(vf)
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# sniffing + distributed stages
# ---------------------------------------------------------------------------


def sniff_audio(buf: bytes) -> str:
    """Container/codec from magic bytes: wav-pcm / wav-alaw /
    wav-ulaw / wav-ima-adpcm / mp3 / ogg-vorbis / flac / unknown."""
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(buf):
            if buf[i:i + 4] == b"fmt ":
                codec = int.from_bytes(buf[i + 8:i + 10], "little")
                return "wav-" + _WAV_CODECS.get(codec, f"0x{codec:x}")
            i += 8 + int.from_bytes(buf[i + 4:i + 8], "little")
        return "wav-pcm"
    if buf[:4] == b"OggS":
        return "ogg-vorbis"
    if buf[:4] == b"fLaC":
        return "flac"
    if buf[:3] == b"ID3" or (len(buf) > 1 and buf[0] == 0xFF
                             and (buf[1] & 0xE0) == 0xE0):
        return "mp3"
    return "unknown"


def decode_audio_bytes(buf: bytes) -> tuple[np.ndarray, int]:
    """Dispatch one payload to its decoder."""
    kind = sniff_audio(buf)
    if kind.startswith("wav-"):
        return decode_wav_any(buf)
    if kind == "mp3":
        return decode_mp3(buf)
    if kind == "ogg-vorbis":
        return decode_ogg(buf)
    raise NotImplementedError(f"no decoder for audio format {kind!r}")


def audio_metadata_bytes(buf: bytes) -> dict:
    kind = sniff_audio(buf)
    if kind.startswith("wav-"):
        x, rate = decode_wav_any(buf)
        return {"codec": kind, "sample_rate": rate, "channels": 1,
                "duration_ms": int(len(x) * 1000 // rate) if rate else 0,
                "bitrate": None}
    if kind == "mp3":
        m = mp3_metadata(buf)
        return {k: m[k] for k in
                ("codec", "sample_rate", "channels", "duration_ms", "bitrate")}
    if kind == "ogg-vorbis":
        return ogg_vorbis_metadata(buf)
    if kind == "flac":
        return flac_metadata(buf)
    raise NotImplementedError(f"no metadata parser for format {kind!r}")


def audio_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary -> codec/sample_rate/channels/duration_ms/bitrate
    columns, NO PCM decode — works for every recognized format with
    no codec library (MP3/Vorbis/FLAC metadata is pure parsing).
    This is the 100-TB filter/bucket stage: run it first, route only
    the rows you keep into decode_audio."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += (", codec string, sample_rate int, channels int, "
               "duration_ms long, bitrate int")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [audio_metadata_bytes(bytes(p)) for p in pdf[payload_col]]
            yield pdf.assign(
                codec=[m["codec"] for m in metas],
                sample_rate=[m["sample_rate"] for m in metas],
                channels=[m["channels"] for m in metas],
                duration_ms=[m["duration_ms"] for m in metas],
                bitrate=pd.array([m["bitrate"] for m in metas],
                                 dtype="Int32"),
            )

    return df.mapInPandas(_op, schema=schema)


def decode_audio(
    df: DataFrame, payload_col: str = "payload", out_col: str = "samples"
) -> DataFrame:
    """binary -> float32 sample array + sample_rate per row, Arrow-
    batched on executors.  WAV family decodes from scratch; MP3/Ogg
    through system libs when present (per-worker ctypes load), else
    a NotImplementedError naming format + library."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += f", {out_col} array<float>, sample_rate int"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples, rates = [], []
            for p in pdf[payload_col]:
                x, rate = decode_audio_bytes(bytes(p))
                samples.append(x)
                rates.append(rate)
            yield pdf.assign(**{out_col: samples},
                             sample_rate=np.asarray(rates, np.int32))

    return df.mapInPandas(_op, schema=schema)


# ---------------------------------------------------------------------------
# acoustic fingerprint + near-dup (Haitsma & Kalker 2002, simplified)
# ---------------------------------------------------------------------------

#: fingerprint band layout: 66 log-spaced edges -> 65 bands -> 64
#: adjacent-band energy comparisons = 64 bits (H&K use 33 bands/32
#: bits per frame; we widen to 64 so the doc hash plugs into the
#: shared banded-Hamming join machinery)
_FP_LO_HZ = 300.0
_FP_HI_HZ = 6000.0
_FP_FRAME = 2048
_FP_HOP = 1024


def _fingerprint_bits(x: np.ndarray, rate: int) -> int:
    """64-bit acoustic fingerprint of one mono signal.

    Per frame (2048 samples, 50% hop, Hann window): rFFT power in 65
    log-spaced bands over 300-6000 Hz (66 edges), each frame's bands
    normalized to sum 1 (gain drops out exactly — volume scaling
    multiplies every band by one constant) and ACCUMULATED across
    frames; bit m = mean_band[m] > mean_band[m+1] (spectral-slope
    sign, the Haitsma-Kalker comparison restricted to the spectral
    axis; time-averaging trades their temporal bits for doc-level
    stability, which is what a DEDUP hash wants — their per-frame
    matcher tolerates BER up to 35%, far looser than a 64-bit join
    key can afford).  Additive noise flips only bands whose
    neighbors are near-equal; re-encode-grade perturbation (gain +
    quantization + light noise) measures <= 8 bits in tests while
    distinct material sits >= 20.  Too-short/silent audio hashes
    to 0."""
    if rate <= 0 or len(x) < _FP_FRAME:
        return 0
    hi = min(_FP_HI_HZ, rate / 2.0)
    edges = np.logspace(np.log10(_FP_LO_HZ), np.log10(hi), 66)
    freqs = np.fft.rfftfreq(_FP_FRAME, 1.0 / rate)
    idx = np.searchsorted(freqs, edges)
    win = np.hanning(_FP_FRAME)
    n_frames = 1 + (len(x) - _FP_FRAME) // _FP_HOP
    acc = np.zeros(65, dtype=np.float64)
    total = 0
    for f in range(n_frames):
        seg = x[f * _FP_HOP:f * _FP_HOP + _FP_FRAME] * win
        power = np.abs(np.fft.rfft(seg)) ** 2
        cum = np.concatenate([[0.0], np.cumsum(power)])
        bands = cum[idx[1:]] - cum[idx[:-1]]
        s = bands.sum()
        if s <= 0:
            continue  # silent frame: no contribution
        acc += bands / s
        total += 1
    if total == 0:
        return 0
    bits = acc[:-1] > acc[1:]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "afp",
) -> DataFrame:
    """Per-row 64-bit acoustic fingerprint column (long) from the
    binary payload — decode + fingerprint ride ONE Arrow pass, and
    only (id, 8-byte hash) ever reaches a shuffle downstream."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += f", {out_col} bigint"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for p in pdf[payload_col]:
                x, rate = decode_audio_bytes(bytes(p))
                fps.append(_fingerprint_bits(x, rate))
            yield pdf.assign(**{out_col: pd.array(fps, dtype="int64")})

    return df.mapInPandas(_op, schema=schema)


def audio_near_duplicates(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_blocks: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Audio near-dup pairs: fingerprint -> the SAME banded-Hamming
    join as simhash (text) and phash (images) — pigeonhole recall,
    exact bit_count verify, 8 bytes/clip in the self-join exchange."""
    from xarray_spatial_spark.functions.dedup import hamming_near_duplicates

    sig = audio_fingerprint(df, payload_col=payload_col).select(
        id_col, "afp").persist()
    return hamming_near_duplicates(
        sig, hash_col="afp", id_col=id_col,
        max_hamming=max_hamming, n_blocks=n_blocks, n_docs=n_docs,
    )


# ---------------------------------------------------------------------------
# log-mel spectrogram features (ML feature extraction, from scratch)
# ---------------------------------------------------------------------------


def _mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale, public formula
    m = 2595 log10(1 + f/700)): (n_mels, n_fft//2 + 1)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)

    mels = np.linspace(0.0, hz_to_mel(rate / 2), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def log_mel_spectrogram(
    samples: np.ndarray, rate: int,
    n_fft: int = 512, hop: int = 256, n_mels: int = 40,
) -> np.ndarray:
    """(frames, n_mels) log-mel energies — Hann window, rFFT power
    spectrum, triangular mel filterbank, natural log with a 1e-10
    floor.  Pure numpy (np.fft)."""
    x = np.asarray(samples, np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    win = np.hanning(n_fft)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop][:n_frames]
    spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
    fb = _mel_filterbank(n_mels, n_fft, rate)
    return np.log(np.maximum(spec @ fb.T, 1e-10))


def audio_features(
    df: DataFrame, payload_col: str = "payload",
    n_fft: int = 512, hop: int = 256, n_mels: int = 40,
    max_frames: int | None = None,
) -> DataFrame:
    """binary audio -> per-row log-mel feature matrix (flattened) +
    shape columns — the ML feature-extraction stage.  Decode routes
    through decode_audio_bytes (WAV family native, MP3/Ogg via system
    libs); per-row errors surface in ``err``; scan-stage mapInPandas,
    only the (small) feature vectors continue downstream."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += (", n_frames int, n_mels int, features array<float>"
               ", err string")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nf, nm, feats, errs = [], [], [], []
            for p in pdf[payload_col]:
                try:
                    x, rate = decode_audio_bytes(bytes(p))
                    m = log_mel_spectrogram(x, rate, n_fft, hop, n_mels)
                    if max_frames is not None:
                        m = m[:max_frames]
                    nf.append(m.shape[0])
                    nm.append(n_mels)
                    feats.append(m.astype(np.float32).ravel())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — crawl robustness
                    nf.append(0)
                    nm.append(0)
                    feats.append(np.array([], np.float32))
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            yield pdf.assign(
                n_frames=pd.array(nf, dtype="int32"),
                n_mels=pd.array(nm, dtype="int32"),
                features=feats, err=errs)

    return df.mapInPandas(_op, schema=schema)
