"""Multimodal columns — images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/resize/frame-sample stages.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested.  Codecs:

- REAL decoders, pure numpy (no external libs): PPM (P6), BMP
  (24-bit uncompressed), WAV (PCM16) — sniffed from magic bytes.
- Compressed formats (JPEG/PNG/MP3/...) need codec libraries absent
  from this environment: ``decode_image`` raises
  ``NotImplementedError`` naming the format, or pass ``fake=True``
  for a clearly-marked deterministic stand-in (keyed hash stream of
  the payload) that exercises every downstream stage.

At 100 TB the pattern is: binary column stays in parquet (never
collected), mapInPandas streams Arrow batches through the decoder,
and feature vectors (small) are what shuffles.  Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for video workloads where one row is megabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table with the canonical schema."""
    i = F.col("id")
    return spark.range(n).select(
        i.alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), i.cast("string")), "UTF-8").alias(
            "payload"
        ),
        (i % 64 + 16).cast("int").alias("width"),
        (i % 48 + 16).cast("int").alias("height"),
        (i * 33 % 10000).cast("int").alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """DETERMINISTIC FAKE — stands in for a real image codec.  Pixels
    are a keyed hash stream of the payload, so every stage downstream
    sees stable, content-dependent values."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8.  Pure numpy."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts, i = [], 2
    while len(parts) < 3:
        while i < len(buf) and buf[i] in b" \t\r\n":
            i += 1
        if buf[i:i + 1] == b"#":  # comment line
            i = buf.index(b"\n", i) + 1
            continue
        j = i
        while buf[j] not in b" \t\r\n":
            j += 1
        parts.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return np.frombuffer(buf, np.uint8, count=h * w * 3, offset=i).reshape(
        h, w, 3
    )


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB.  Pure numpy
    (BITMAPINFOHEADER, bottom-up or top-down, 4-byte row padding)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP (got {bpp}bpp/c{comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, np.uint8, count=h * stride, offset=off)
    img = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR -> RGB


def sniff_and_decode(buf: bytes) -> np.ndarray:
    """Dispatch on magic bytes.  Real decode for the lib-free formats;
    compressed formats name themselves in the error."""
    if buf.startswith(b"P6"):
        return decode_ppm(buf)
    if buf.startswith(b"BM"):
        return decode_bmp(buf)
    for magic, name in ((b"\xff\xd8", "JPEG"), (b"\x89PNG", "PNG"),
                        (b"GIF8", "GIF"), (b"RIFF", "RIFF/WebP")):
        if buf.startswith(magic):
            raise NotImplementedError(
                f"{name} decoding requires a codec library not present in "
                "this environment (PPM/BMP decode natively; or fake=True)"
            )
    raise NotImplementedError("unrecognized image format")


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
    out_col: str = "pixels",
) -> DataFrame:
    """binary -> flattened pixel array + decoded shape columns.

    PPM (P6) and 24-bit BMP payloads decode natively (pure numpy, no
    codec libs).  Compressed formats raise ``NotImplementedError``
    per-row with the format name unless ``fake=True`` (deterministic
    stand-in keyed on the payload hash).  width/height are REPLACED by
    the decoded dimensions on the real path."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema if f.name not in ("width", "height"))
    schema += f", width int, height int, {out_col} array<int>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, ws, hs = [], [], []
            for p, h, w in zip(pdf[payload_col], pdf["height"], pdf["width"]):
                if fake:
                    img = _fake_decode(bytes(p), int(h), int(w))
                else:
                    img = sniff_and_decode(bytes(p))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                pixels.append(img.ravel().astype(np.int32))
            res = pdf.drop(columns=["width", "height"])
            res = res.assign(width=np.asarray(ws, np.int32),
                             height=np.asarray(hs, np.int32))
            res[out_col] = pixels
            yield res

    return df.mapInPandas(_op, schema=schema)


# ---------------------------------------------------------------------------
# audio (WAV PCM16 — real decode, pure numpy)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 samples -> minimal RIFF/WAVE PCM16 bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(data)
    hdr = (b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVEfmt "
           + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
           + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
           + (16).to_bytes(2, "little") + b"data" + n.to_bytes(4, "little"))
    return hdr + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (samples float32 in [-1, 1], sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    fmt = None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        sz = int.from_bytes(buf[i + 4:i + 8], "little")
        if cid == b"fmt ":
            fmt = buf[i + 8:i + 8 + sz]
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            codec = int.from_bytes(fmt[0:2], "little")
            channels = int.from_bytes(fmt[2:4], "little")
            rate = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if codec != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV decodes natively")
            x = np.frombuffer(buf, "<i2", count=sz // 2, offset=i + 8)
            if channels > 1:
                x = x.reshape(-1, channels).mean(axis=1)
            return (np.asarray(x, np.float32) / 32768.0, rate)
        i += 8 + sz + (sz & 1)
    raise ValueError("no data chunk")


def audio_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "features"
) -> DataFrame:
    """WAV PCM16 -> 12-float feature vector per row (rms, peak,
    zero-crossing rate, spectral centroid/rolloff, 7-band log-energy)
    — vectorized numpy per Arrow batch, shuffles only the features."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema += f", {out_col} array<double>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                x, rate = decode_wav(bytes(p))
                if len(x) == 0:
                    feats.append([0.0] * 12)
                    continue
                rms = float(np.sqrt(np.mean(x * x)))
                peak = float(np.max(np.abs(x)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(x)))))
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
                power = spec * spec
                tot = power.sum() or 1.0
                centroid = float((freqs * power).sum() / tot)
                cum = np.cumsum(power)
                roll = float(freqs[np.searchsorted(cum, 0.85 * cum[-1])])
                edges = np.linspace(0, len(power), 8, dtype=int)
                bands = [float(np.log1p(power[a:b].sum()))
                         for a, b in zip(edges[:-1], edges[1:])]
                feats.append([rms, peak, zcr, centroid, roll] + bands)
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(_op, schema=schema)


def image_features(
    df: DataFrame, pixels_col: str = "pixels", out_col: str = "features"
) -> DataFrame:
    """Per-image feature vector (channel means/stds + 8-bin luma
    histogram = 14 floats) — vectorized numpy per Arrow batch."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema += f", {out_col} array<double>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for px, h, w in zip(pdf[pixels_col], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w), 3)
                luma = img.mean(axis=2)
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                f1 = img.mean(axis=(0, 1))
                f2 = img.std(axis=(0, 1))
                feats.append(
                    np.concatenate([f1, f2, hist / luma.size]).tolist()
                )
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(_op, schema=schema)


def resize_image(
    df: DataFrame, out_h: int, out_w: int, pixels_col: str = "pixels"
) -> DataFrame:
    """Nearest-neighbor resize (pure numpy indexing — no codec needed).
    Output pixel arrays all have shape (out_h*out_w*3,)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
        if f.name not in ("width", "height")
    )
    schema += f", width int, height int"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, h, w in zip(pdf[pixels_col], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w), 3)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out_px.append(img[yi][:, xi].ravel().astype(np.int32))
            res = pdf.drop(columns=["width", "height"]).assign(
                **{pixels_col: out_px}
            )
            res["width"] = out_w
            res["height"] = out_h
            yield res

    return df.mapInPandas(_op, schema=schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video -> frame rows: (media_id, frame_idx, ts_ms).  Pure
    expressions; the frame *decode* would attach via decode_image."""
    n_frames = F.greatest(
        (F.col(duration_col) / every_ms).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )
