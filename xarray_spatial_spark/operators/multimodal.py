"""Multimodal columns — images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/resize/frame-sample stages.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested.  Codecs:

- REAL decoders, pure numpy + stdlib (no external libs): PPM (P6),
  BMP (24-bit uncompressed), PNG (8-bit gray/RGB/RGBA, zlib inflate +
  all five row filters), GIF (LZW, still + animated — the lib-free
  "video" container for ``gif_frames``), sequential + progressive JPEG
  (operators/jpeg.py: Huffman + DCT + YCbCr), lossless WebP
  (operators/webp.py: VP8L entropy + transforms), WAV (PCM16) —
  sniffed from magic bytes.
- Remaining image formats (MP4 video, AVIF, ...) need
  codec libraries absent from this environment: ``decode_image``
  raises ``NotImplementedError`` naming the format, or pass
  ``fake=True`` for a clearly-marked deterministic stand-in (keyed
  hash stream of the payload) that exercises every downstream stage.
  Lossy VP8 WebP routes through the system libwebp when installed.
- Compressed audio lives in operators/audio.py: WAV
  G.711/IMA-ADPCM decode from scratch (audioop-oracled), MP3/Ogg/
  FLAC metadata parsed from scratch, MP3/Ogg PCM via system
  libmpg123/libvorbisfile when installed (named raise without).

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA -> PNG
    (8-bit, non-interlaced, filter 0 rows, stdlib zlib deflate)."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, h, w = 0, *img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        color, (h, w) = 2, img.shape[:2]
    elif img.ndim == 3 and img.shape[2] == 4:
        color, (h, w) = 6, img.shape[:2]
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    flat = img.reshape(h, -1)
    raw = b"".join(b"\x00" + row.tobytes() for row in flat)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG -> uint8 array: (h, w) gray, (h, w, 3) RGB, (h, w, 4) RGBA.

    Pure stdlib zlib + numpy: 8-bit depth, color types 0/2/6,
    non-interlaced.  Filters 0 (None) and 2 (Up) unfilter as one
    vectorized row op; 1 (Sub) is a per-row uint8 prefix accumulate;
    3 (Average) / 4 (Paeth) reference the reconstructed left pixel so
    they run a per-pixel column loop (bpp-vectorized) — correct for
    any encoder's output, fastest for our own (filter-0) streams."""
    import struct
    import zlib

    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), None
    idat = []
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in (0, 2, 6) or inter != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={inter} "
                    "unsupported (8-bit gray/RGB/RGBA, non-interlaced)")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = {0: 1, 2: 3, 6: 4}[color]
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if len(data) != h * stride:
        raise ValueError("PNG data length mismatch")
    rows = data.reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        raw = rows[y, 1:]
        if ft == 0:
            rec = raw.copy()
        elif ft == 2:
            rec = raw + prev
        elif ft == 1:
            rec = np.add.accumulate(
                raw.reshape(w, ch), axis=0, dtype=np.uint8).reshape(-1)
        else:
            rec = np.zeros(w * ch, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint16)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                up = prev[sl].astype(np.uint16)
                if ft == 3:
                    pred = (left + up) >> 1
                else:  # Paeth
                    ul = (np.zeros(ch, dtype=np.uint16) if x == 0
                          else prev[(x - 1) * ch:x * ch].astype(np.uint16))
                    p = left.astype(np.int32) + up.astype(np.int32) \
                        - ul.astype(np.int32)
                    pa, pb, pc = (np.abs(p - left.astype(np.int32)),
                                  np.abs(p - up.astype(np.int32)),
                                  np.abs(p - ul.astype(np.int32)))
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul)).astype(np.uint16)
                rec[sl] = (raw[sl].astype(np.uint16) + pred).astype(np.uint8)
                left = rec[sl].astype(np.uint16)
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# GIF (87a/89a): pure-stdlib LZW — still images AND animations, which
# makes animated GIF the lib-free "video" container for the
# frame-sampling path (gif_frames)
# ---------------------------------------------------------------------------


def _gif_interlace_rows(h: int) -> list[int]:
    """GIF 4-pass interlace row order (start/step: 0/8, 4/8, 2/4, 1/2)."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF LZW -> pixel indices (uint8, length ``expected``).  Per-code
    Python loop with a small rolling bit buffer (O(n)); codecs are the
    correctness path, throughput lives in the Arrow batching above."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < code_size and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("truncated GIF image data")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Minimal valid GIF LZW: each pixel emitted as a literal code with
    a CLEAR before the code table would force a width change — decodes
    everywhere, compresses nothing (encoder exists for round-trip
    tests and synthetic fixtures)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << code_size) - end - 2  # literals before width would grow
    for i, px in enumerate(indices.tolist()):
        if i and i % max(budget, 1) == 0:
            emit(clear)
        emit(int(px))
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif_frames(
    buf: bytes, max_frames: int | None = None
) -> tuple[list[np.ndarray], list[int]]:
    """GIF87a/89a -> (frames as (h, w, 3) uint8 RGB, per-frame delay
    ms).  Handles global/local color tables, interlace, transparency,
    and disposal 0-3.  Frames composite in RGB space — each frame's
    pixels go through ITS OWN color table before landing on the
    canvas, so palette-optimized animations (per-frame local tables)
    keep earlier frames' true colors."""
    if buf[:4] != b"GIF8":
        raise ValueError("not a GIF")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    bg_idx = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, count=sz * 3, offset=pos).reshape(sz, 3)
        pos += sz * 3
    bg_rgb = (gct[min(bg_idx, len(gct) - 1)] if gct is not None
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[pos]
            pos += 1
            subs = []
            while buf[pos]:
                ln = buf[pos]
                subs.append(buf[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and subs:  # graphic control
                gce = subs[0]
                disposal = (gce[0] >> 2) & 0x07
                transparent = gce[3] if gce[0] & 0x01 else None
                delay_ms = int.from_bytes(gce[1:3], "little") * 10
            continue
        if block != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx = int.from_bytes(buf[pos: pos + 2], "little")
        fy = int.from_bytes(buf[pos + 2: pos + 4], "little")
        fw = int.from_bytes(buf[pos + 4: pos + 6], "little")
        fh = int.from_bytes(buf[pos + 6: pos + 8], "little")
        ipk = buf[pos + 8]
        pos += 9
        ct = gct
        if ipk & 0x80:
            sz = 2 << (ipk & 0x07)
            ct = np.frombuffer(buf, np.uint8, count=sz * 3, offset=pos).reshape(sz, 3)
            pos += sz * 3
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = buf[pos]
        pos += 1
        chunks = []
        while buf[pos]:
            ln = buf[pos]
            chunks.append(buf[pos + 1: pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(b"".join(chunks), min_code, fw * fh).reshape(fh, fw)
        if ipk & 0x40:  # interlaced: rows arrive in 4-pass order
            dest = np.empty_like(idx)
            dest[_gif_interlace_rows(fh)] = idx
            idx = dest
        before = canvas.copy() if disposal == 3 else None
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        region = canvas[fy: fy + fh, fx: fx + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background
            region[:] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas[:] = before
        transparent = None
        disposal = 0
        delay_ms = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame of a GIF as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(buf, max_frames=1)[0][0]


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Palette-indexed frames -> GIF89a (store-only LZW).  ``frames``
    are (h, w) uint8 INDEX arrays into ``palette`` (n, 3); exists for
    round-trip tests and deterministic fixtures."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    if any(fr.shape != (h, w) for fr in frames):
        raise ValueError("encode_gif frames must share one shape")
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    sz = 1 << bits
    pal = np.zeros((sz, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += pal.tobytes()
    for i, fr in enumerate(frames):
        if delays_ms is not None:
            out += bytes([0x21, 0xF9, 4, 0])
            out += (delays_ms[i] // 10).to_bytes(2, "little")
            out += bytes([0, 0])
        out += bytes([0x2C]) + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0])
        arr = fr
        if interlace:
            arr = fr[_gif_interlace_rows(h)]
        data = _gif_lzw_encode(arr.reshape(-1).astype(np.uint8), bits)
        out += bytes([bits])
        for off in range(0, len(data), 255):
            blk = data[off: off + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def gif_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int | None = None,
) -> DataFrame:
    """Animated-GIF frame explode — the REAL frame-sampling path for
    the one video-ish container this environment can decode natively:
    (id, frame_idx, ts_ms, h, w, rgb binary) rows via Arrow batches."""
    schema = (f"{id_col} long, frame_idx int, ts_ms long, "
              "h int, w int, rgb binary")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    (id_col, "frame_idx", "ts_ms", "h", "w", "rgb")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, delays = decode_gif_frames(bytes(payload), max_frames)
                ts = 0
                for j, (fr, d) in enumerate(zip(frames, delays)):
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(j)
                    rows["ts_ms"].append(ts)
                    rows["h"].append(fr.shape[0])
                    rows["w"].append(fr.shape[1])
                    rows["rgb"].append(fr.tobytes())
                    ts += d
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_op, schema=schema)


def sniff_and_decode(buf: bytes) -> np.ndarray:
    """Dispatch on magic bytes.  Real decode for the lib-free formats
    plus PNG (stdlib zlib); remaining compressed formats name
    themselves in the error."""
    if buf.startswith(b"P6"):
        return decode_ppm(buf)
    if buf.startswith(b"BM"):
        return decode_bmp(buf)
    if buf.startswith(_PNG_SIG):
        img = decode_png(buf)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img[:, :, :3]  # drop alpha for the (h, w, 3) contract
    if buf.startswith(b"GIF8"):
        return decode_gif(buf)
    if buf.startswith(b"\xff\xd8"):
        from xarray_spatial_spark.operators.jpeg import decode_jpeg

        img = decode_jpeg(buf)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    if buf.startswith(b"RIFF"):
        from xarray_spatial_spark.operators.webp import decode_webp

        img = decode_webp(buf)  # lossless VP8L decodes natively
        return img[:, :, :3]  # drop alpha for the (h, w, 3) contract
    raise NotImplementedError("unrecognized image format")


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
    out_col: str = "pixels",
) -> DataFrame:
    """binary -> flattened pixel array + decoded shape columns.

    PPM (P6), 24-bit BMP, PNG, GIF, sequential + progressive JPEG, and lossless WebP
    (VP8L) payloads decode natively (pure stdlib + numpy, no codec
    libs); lossy VP8 WebP decodes through the system libwebp when one
    is installed (ctypes, per-worker load).  Remaining formats raise
    ``NotImplementedError`` per-row with the format name unless
    ``fake=True`` (deterministic stand-in keyed on the payload hash).
    width/height are REPLACED by the decoded dimensions on the real
    path."""
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


def _luma_area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, 3) uint8 -> (out_h, out_w) float64 luma, AREA-average
    downsample (reduceat over variable-width boxes — smooth like the
    classic pHash preprocessing, unlike nearest-neighbor which aliases
    and breaks hash stability across re-encodes at other sizes)."""
    luma = np.asarray(img, dtype=np.float64).mean(axis=2)
    h, w = luma.shape
    ri = (np.arange(out_h) * h // out_h).astype(np.intp)
    ci = (np.arange(out_w) * w // out_w).astype(np.intp)
    sums = np.add.reduceat(np.add.reduceat(luma, ri, axis=0), ci, axis=1)
    rn = np.diff(np.append(ri, h)).astype(np.float64)
    cn = np.diff(np.append(ci, w)).astype(np.float64)
    return sums / rn[:, None] / cn[None, :]


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n x n): row k = c_k cos((2j+1)k pi/2n)."""
    j = np.arange(n, dtype=np.float64)
    k = j[:, None]
    m = np.cos((2 * j[None, :] + 1) * k * np.pi / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def _phash_bits(img: np.ndarray) -> int:
    """64-bit perceptual hash (classic pHash): 32x32 area-averaged
    luma -> 2-D DCT-II -> top-left 8x8 coefficient block -> bit i =
    coefficient > median(block).  Robust to re-encoding, resizing and
    small pixel noise; brightness shifts touch only the DC bit's
    neighborhood."""
    small = _luma_area_resize(img, 32, 32)
    d = _DCT32 @ small @ _DCT32.T
    low = d[:8, :8].ravel()
    bits = low > np.median(low)
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # two's complement


def _dhash_bits(img: np.ndarray) -> int:
    """64-bit difference hash: 9x8 luma, bit = px[r, c+1] > px[r, c]."""
    small = _luma_area_resize(img, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def perceptual_hash(
    df: DataFrame,
    pixels_col: str = "pixels",
    out_col: str = "phash",
    kind: str = "phash",
) -> DataFrame:
    """Per-image 64-bit perceptual fingerprint column (long).

    ``kind='phash'`` = DCT hash (re-encode/resize/noise robust),
    ``kind='dhash'`` = row-gradient hash (cheaper, crop-sensitive).
    Arrow-batched mapInPandas over decoded pixel rows — the decode
    (``decode_image``) is already per-blob Python, so the hash rides
    the same pass when composed.  Downstream near-dup joins are
    banded-Hamming (:func:`~xarray_spatial_spark.functions.dedup.
    hamming_near_duplicates`) — never all-pairs."""
    if kind not in ("phash", "dhash"):
        raise ValueError(f"kind must be 'phash' or 'dhash', got {kind!r}")
    fn = _phash_bits if kind == "phash" else _dhash_bits
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += f", {out_col} bigint"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for px, h, w in zip(pdf[pixels_col], pdf["height"], pdf["width"]):
                img = np.asarray(px, dtype=np.uint8).reshape(
                    int(h), int(w), 3)
                hashes.append(fn(img))
            yield pdf.assign(
                **{out_col: pd.array(hashes, dtype="int64")})

    return df.mapInPandas(_op, schema=schema)


def phash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
    n_blocks: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Image near-dup pairs: perceptual hash -> banded Hamming join
    (pigeonhole recall guarantee; bit_count(xor) verifies exactly).
    The decoded frame collapses to (id, phash) BEFORE the self-join —
    8 bytes/image shuffle, pixels never enter the exchange — and the
    signature subtree persists because both join sides consume it."""
    from xarray_spatial_spark.functions.dedup import hamming_near_duplicates

    sig = perceptual_hash(df, pixels_col=pixels_col).select(
        id_col, "phash").persist()
    return hamming_near_duplicates(
        sig, hash_col="phash", id_col=id_col,
        max_hamming=max_hamming, n_blocks=n_blocks, n_docs=n_docs,
    )


def frame_phash(
    frames_df: DataFrame,
    id_col: str = "media_id",
    out_col: str = "fhash",
) -> DataFrame:
    """(id, frame_idx, fhash) from :func:`gif_frames` rows — the
    per-frame pHash over the rgb binary column, one Arrow pass."""
    schema = f"{id_col} long, frame_idx int, {out_col} bigint"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for rgb, h, w in zip(pdf["rgb"], pdf["h"], pdf["w"]):
                img = np.frombuffer(bytes(rgb), np.uint8).reshape(
                    int(h), int(w), 3)
                hashes.append(_phash_bits(img))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "frame_idx": pdf["frame_idx"],
                out_col: pd.array(hashes, dtype="int64"),
            })

    return frames_df.mapInPandas(_op, schema=schema)


#: frame_idx packs into the low bits of the frame uid; bounds frames
#: per video at 2^20 (~1M — far above any sane max_frames cap)
_FRAME_UID_BITS = 20


def video_near_duplicates(
    df: DataFrame,
    max_hamming: int = 6,
    frame_match_frac: float = 0.5,
    max_frames: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_blocks: int | None = None,
) -> DataFrame:
    """Video near-dup pairs over animated GIF payloads — the one video
    container this environment decodes FROM SCRATCH, so the whole path
    is real: frames (capped at ``max_frames``) -> per-frame pHash ->
    frame-level banded-Hamming join (the shared pigeonhole core) ->
    per-video-pair coverage verify.

    Two videos pair when ``greatest(matched_a/n_a, matched_b/n_b) >=
    frame_match_frac``: most of ONE video's frames have a near-dup
    frame in the other, which catches both full re-encodes and
    subset clips; frame ORDER never enters (re-cut/reordered dups
    still match).  Returns (id_a, id_b, frac_a, frac_b, n_matched).

    Scale shape: pixels collapse to (video, frame, 8-byte hash) inside
    the decode pass; the self-join exchange carries ~max_frames x 8
    bytes per video; the coverage verify is a count-distinct
    aggregation over MATCHED pairs only, never all-pairs."""
    if not (0.0 < frame_match_frac <= 1.0):
        raise ValueError(
            f"frame_match_frac must be in (0, 1], got {frame_match_frac}")
    from xarray_spatial_spark.functions.dedup import hamming_near_duplicates

    frames = gif_frames(df, payload_col=payload_col, id_col=id_col,
                        max_frames=max_frames)
    fh = frame_phash(frames, id_col=id_col)
    sig = fh.select(
        (F.col(id_col) * (1 << _FRAME_UID_BITS)
         + F.col("frame_idx")).alias("_fuid"),
        "fhash",
    ).persist()
    nf = fh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nf"))
    fpairs = hamming_near_duplicates(
        sig, hash_col="fhash", id_col="_fuid",
        max_hamming=max_hamming, n_blocks=n_blocks,
    )
    va = F.shiftrightunsigned(F.col("id_a"), _FRAME_UID_BITS)
    vb = F.shiftrightunsigned(F.col("id_b"), _FRAME_UID_BITS)
    cross = (
        fpairs.select(
            F.least(va, vb).alias("vid_a"),
            F.greatest(va, vb).alias("vid_b"),
            F.when(va <= vb, F.col("id_a")).otherwise(F.col("id_b"))
             .alias("_fa"),
            F.when(va <= vb, F.col("id_b")).otherwise(F.col("id_a"))
             .alias("_fb"),
        )
        .filter(F.col("vid_a") != F.col("vid_b"))
    )
    matched = cross.groupBy("vid_a", "vid_b").agg(
        F.count_distinct("_fa").alias("_ma"),
        F.count_distinct("_fb").alias("_mb"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    out = (
        matched
        .join(nf.select(F.col(id_col).alias("vid_a"),
                        F.col("_nf").alias("_na")), "vid_a")
        .join(nf.select(F.col(id_col).alias("vid_b"),
                        F.col("_nf").alias("_nb")), "vid_b")
        .withColumn("frac_a", F.col("_ma") / F.col("_na"))
        .withColumn("frac_b", F.col("_mb") / F.col("_nb"))
        .filter(F.greatest("frac_a", "frac_b") >= frame_match_frac)
        .select(
            F.col("vid_a").alias("id_a"), F.col("vid_b").alias("id_b"),
            "frac_a", "frac_b", "n_matched",
        )
    )
    return out


def media_kind(payload: Column) -> Column:
    """Modality from magic bytes, pure Catalyst (binary substring
    compares in the scan stage — no Python touches the payloads that
    only need routing): 'image' (PNG/BMP/PPM/JPEG/WebP), 'audio'
    (RIFF/WAVE), 'video' (GIF — still GIFs ride the video path, where
    a 1-frame match degenerates to exactly the image semantics),
    'document' (PDF — routes to operators/pdf.py:pdf_text), 'other'."""
    p4 = F.substring(payload, 1, 4)
    p2 = F.substring(payload, 1, 2)
    fmt = F.substring(payload, 9, 4)
    return (
        F.when(p4 == F.lit(b"RIFF"),
               F.when(fmt == F.lit(b"WAVE"), "audio")
                .when(fmt == F.lit(b"WEBP"), "image")
                .otherwise("other"))
        .when(p4 == F.lit(b"GIF8"), "video")
        .when(F.substring(payload, 5, 4) == F.lit(b"ftyp"), "video")
        .when(p4 == F.lit(b"\x89PNG"), "image")
        .when(p4 == F.lit(b"%PDF"), "document")
        .when(p2 == F.lit(b"BM"), "image")
        .when(p2 == F.lit(b"P6"), "image")
        .when(p2 == F.lit(b"\xff\xd8"), "image")
        .otherwise("other")
    )


def media_near_duplicates(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    image_hamming: int = 6,
    audio_hamming: int = 8,
    video_frame_frac: float = 0.5,
    n_blocks: int = 10,
) -> DataFrame:
    """One near-dup pass over a MIXED media table: route each payload
    by :func:`media_kind` into its modality's pipeline (image pHash /
    audio fingerprint / video frame-coverage), all three riding the
    shared banded-Hamming core, and union the pairs as
    (modality, id_a, id_b, similarity) — image/audio similarity =
    1 - hamming/64, video = the greater frame-coverage fraction.
    Cross-modality pairs are impossible by construction (each subset
    self-joins separately), which is also the scale win: three small
    self-joins instead of one mixed one."""
    from xarray_spatial_spark.operators import audio as au

    kinds = df.select(
        id_col, payload_col, media_kind(F.col(payload_col)).alias("_kind"))

    images = kinds.filter(F.col("_kind") == "image")
    for c in ("width", "height"):
        if c not in df.columns:
            images = images.withColumn(c, F.lit(0))
    img_pairs = phash_near_duplicates(
        decode_image(images), max_hamming=image_hamming, id_col=id_col,
        n_blocks=max(n_blocks, image_hamming + 2),
    ).select(
        F.lit("image").alias("modality"), "id_a", "id_b",
        (1.0 - F.col("hamming") / 64.0).alias("similarity"),
    )
    aud_pairs = au.audio_near_duplicates(
        kinds.filter(F.col("_kind") == "audio"),
        max_hamming=audio_hamming, id_col=id_col,
        payload_col=payload_col,
        n_blocks=max(n_blocks, audio_hamming + 2),
    ).select(
        F.lit("audio").alias("modality"), "id_a", "id_b",
        (1.0 - F.col("hamming") / 64.0).alias("similarity"),
    )
    # only GIF containers are frame-decodable lib-free; ISO-BMFF video
    # routes to video_metadata for cataloging but cannot be hashed here
    vid_pairs = video_near_duplicates(
        kinds.filter(
            (F.col("_kind") == "video")
            & (F.substring(F.col(payload_col), 1, 4) == F.lit(b"GIF8"))
        ),
        max_hamming=image_hamming, frame_match_frac=video_frame_frac,
        id_col=id_col, payload_col=payload_col,
        n_blocks=max(n_blocks, image_hamming + 2),
    ).select(
        F.lit("video").alias("modality"), "id_a", "id_b",
        F.greatest("frac_a", "frac_b").alias("similarity"),
    )
    return img_pairs.unionByName(aud_pairs).unionByName(vid_pairs)


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


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (ISO 14496-12) container metadata — pure struct walk
# ---------------------------------------------------------------------------


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i: i + 4], "big")
        btype = buf[i + 4: i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(buf[i + 8: i + 16], "big")
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < hdr or i + size > end:
            break  # truncated/corrupt: stop cleanly
        yield btype, i + hdr, i + size
        i += size


def _find_box(buf: bytes, start: int, end: int, path: list[bytes]):
    """First box at a nested path like [b'moov', b'trak']."""
    for btype, b0, b1 in _iter_boxes(buf, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            got = _find_box(buf, b0, b1, path[1:])
            if got is not None:
                return got
    return None


def mp4_metadata_bytes(buf: bytes) -> dict:
    """ISO-BMFF rollup: major brand, movie duration, per-track handler
    + sample-entry codec fourccs, video dimensions.  No sample data is
    touched — this is the crawl cataloging/filter stage; actual MP4
    DECODING needs a codec library and raises by name in decode paths."""
    buf = bytes(buf)
    if buf[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    brand = buf[8:12].decode("latin-1", "replace")
    out = {
        "brand": brand, "duration_ms": 0, "width": None, "height": None,
        "n_tracks": 0, "track_handlers": [], "codecs": [],
    }
    moov = _find_box(buf, 0, len(buf), [b"moov"])
    if moov is None:
        return out
    m0, m1 = moov
    mvhd = _find_box(buf, m0, m1, [b"mvhd"])
    if mvhd is not None:
        v = buf[mvhd[0]]
        if v == 1:
            ts = int.from_bytes(buf[mvhd[0] + 20: mvhd[0] + 24], "big")
            dur = int.from_bytes(buf[mvhd[0] + 24: mvhd[0] + 32], "big")
        else:
            ts = int.from_bytes(buf[mvhd[0] + 12: mvhd[0] + 16], "big")
            dur = int.from_bytes(buf[mvhd[0] + 16: mvhd[0] + 20], "big")
        out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    for btype, t0, t1 in _iter_boxes(buf, m0, m1):
        if btype != b"trak":
            continue
        out["n_tracks"] += 1
        hdlr = _find_box(buf, t0, t1, [b"mdia", b"hdlr"])
        if hdlr is not None:
            out["track_handlers"].append(
                buf[hdlr[0] + 8: hdlr[0] + 12].decode("latin-1", "replace"))
        stsd = _find_box(buf, t0, t1, [b"mdia", b"minf", b"stbl", b"stsd"])
        if stsd is not None:
            n = int.from_bytes(buf[stsd[0] + 4: stsd[0] + 8], "big")
            p = stsd[0] + 8
            for _ in range(n):
                if p + 8 > stsd[1]:
                    break
                esz = int.from_bytes(buf[p: p + 4], "big")
                out["codecs"].append(
                    buf[p + 4: p + 8].decode("latin-1", "replace"))
                p += max(esz, 8)
        tkhd = _find_box(buf, t0, t1, [b"tkhd"])
        if tkhd is not None and out["width"] is None:
            # width/height are the LAST two 16.16 fixed-point fields of
            # tkhd in both box versions — read from the box end
            w = int.from_bytes(buf[tkhd[1] - 8: tkhd[1] - 4], "big") >> 16
            h = int.from_bytes(buf[tkhd[1] - 4: tkhd[1]], "big") >> 16
            if w and h:
                out["width"], out["height"] = w, h
    return out


def video_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary -> container metadata columns for MP4/ISO-BMFF payloads
    (brand/duration/dims/handlers/codecs), error column per row —
    the catalog/filter stage that runs BEFORE any decode is attempted.
    Scan-stage mapInPandas; no shuffle."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += (", brand string, duration_ms long, width int, height int"
               ", n_tracks int, track_handlers array<string>"
               ", codecs array<string>, err string")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("brand", "duration_ms", "width",
                                    "height", "n_tracks",
                                    "track_handlers", "codecs", "err")}
            for p in pdf[payload_col]:
                try:
                    m = mp4_metadata_bytes(bytes(p))
                    err = None
                except Exception as e:  # noqa: BLE001 — crawl robustness
                    m = {"brand": None, "duration_ms": 0, "width": None,
                         "height": None, "n_tracks": 0,
                         "track_handlers": [], "codecs": []}
                    err = f"{type(e).__name__}: {e}"[:200]
                for k in m:
                    cols[k].append(m[k])
                cols["err"].append(err)
            yield pdf.assign(
                brand=cols["brand"],
                duration_ms=pd.array(cols["duration_ms"], dtype="int64"),
                width=pd.array(cols["width"], dtype="Int32"),
                height=pd.array(cols["height"], dtype="Int32"),
                n_tracks=pd.array(cols["n_tracks"], dtype="int32"),
                track_handlers=cols["track_handlers"],
                codecs=cols["codecs"],
                err=cols["err"],
            )

    return df.mapInPandas(_op, schema=schema)


# ---------------------------------------------------------------------------
# image quality signals — the media analog of the Gopher text gates
# ---------------------------------------------------------------------------


def image_quality_signals(
    df: DataFrame, payload_col: str = "payload",
    min_side: int = 32, max_aspect: float = 5.0,
    min_std: float = 4.0, min_entropy: float = 1.0,
) -> DataFrame:
    """Cheap per-image statistics + a keep rule — the crawl gate that
    drops tracking pixels, blank placeholders, banner slivers and
    single-color fills BEFORE any expensive downstream stage:

    * ``px_std``: luma standard deviation (0 for flat fills),
    * ``px_entropy``: 64-bin luma histogram entropy in bits,
    * dims / aspect ratio,
    * ``keep``: min side, aspect, std and entropy thresholds.

    Decode reuses the sniff_and_decode seam (errors -> err column,
    keep = false); scan-stage mapInPandas, payloads never shuffle."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema)
    schema += (", width int, height int, aspect double, px_std double"
               ", px_entropy double, keep boolean, err string")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, asp, std, ent, keep, errs = [], [], [], [], [], [], []
            for p in pdf[payload_col]:
                try:
                    img = sniff_and_decode(bytes(p))
                    if img.ndim == 3:
                        luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                                + 0.114 * img[..., 2])
                    else:
                        luma = img.astype(np.float64)
                    h, w = luma.shape
                    s = float(luma.std())
                    hist, _ = np.histogram(luma, bins=64, range=(0, 256))
                    pk = hist / max(hist.sum(), 1)
                    pk = pk[pk > 0]
                    e = float(-(pk * np.log2(pk)).sum())
                    a = max(w, h) / max(min(w, h), 1)
                    ws.append(w)
                    hs.append(h)
                    asp.append(a)
                    std.append(s)
                    ent.append(e)
                    keep.append(bool(
                        min(w, h) >= min_side and a <= max_aspect
                        and s >= min_std and e >= min_entropy))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — crawl robustness
                    ws.append(0)
                    hs.append(0)
                    asp.append(0.0)
                    std.append(0.0)
                    ent.append(0.0)
                    keep.append(False)
                    errs.append(f"{type(exc).__name__}: {exc}"[:200])
            yield pdf.assign(
                width=pd.array(ws, dtype="int32"),
                height=pd.array(hs, dtype="int32"),
                aspect=asp, px_std=std, px_entropy=ent, keep=keep, err=errs)

    return df.mapInPandas(_op, schema=schema)


def image_text_pairs(
    pages: DataFrame,
    media: DataFrame | None = None,
    url_col: str = "url",
    html_col: str = "html",
    media_url_col: str = "url",
    payload_col: str = "payload",
    min_alt_chars: int = 5,
    quality_gate: bool = True,
    include_og: bool = False,
) -> DataFrame:
    """LAION-shape image-caption pair mining: pages' ``<img>`` tags ->
    (page_url, img_url, caption, declared dims), deduplicated on
    (img_url, caption) — the same image embedded with the same alt on
    a thousand template pages is ONE training pair.

    Declared-dimension tracking pixels (either side <= 2) and too-
    short captions drop at the scan stage, BEFORE the dedup exchange.
    The exchange itself carries only (url, caption) strings — never
    page or image payloads.

    With ``media`` (a fetched-bytes table ``(url, payload)``), pairs
    join to their image bytes on the normalized URL and — under
    ``quality_gate`` — pass :func:`image_quality_signals` (real
    decoded dims/entropy, not the declared hints).  The join is a
    plain equi-join on the 2-sided key Spark can broadcast or
    shuffle as sizes dictate; payload bytes ride only the media side.
    """
    from xarray_spatial_spark.functions.html import extract_images
    from xarray_spatial_spark.functions.url import url_normalize

    imgs = pages.select(
        F.col(url_col).alias("page_url"),
        F.explode(
            extract_images(F.col(html_col), F.col(url_col))).alias("_i"),
    ).select(
        "page_url",
        url_normalize(F.col("_i.src")).alias("img_url"),
        F.trim(F.col("_i.alt")).alias("caption"),
        F.col("_i.width").alias("decl_width"),
        F.col("_i.height").alias("decl_height"),
    ).filter(
        (F.length("caption") >= min_alt_chars)
        & ~(F.coalesce(F.col("decl_width"), F.lit(3)) <= 2)
        & ~(F.coalesce(F.col("decl_height"), F.lit(3)) <= 2)
    )
    if include_og:
        # og:image + og:description/title — the publisher-curated
        # caption channel; dims undeclared, same downstream gates
        from xarray_spatial_spark.functions.html import og_metadata
        from xarray_spatial_spark.functions.url import (
            _resolve_link,
            url_host,
            url_path,
        )

        og = og_metadata(F.col(html_col))
        base = F.col(url_col)
        scheme = F.lower(F.regexp_extract(
            base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
        bdir = F.when(
            url_path(base).rlike("/"),
            F.regexp_replace(url_path(base), "/[^/]*$", ""),
        ).otherwise(F.lit(""))
        og_rows = pages.select(
            F.col(url_col).alias("page_url"),
            url_normalize(_resolve_link(
                og["image"], scheme, url_host(base), bdir)).alias("img_url"),
            F.coalesce(og["description"], og["title"]).alias("caption"),
            F.lit(None).cast("int").alias("decl_width"),
            F.lit(None).cast("int").alias("decl_height"),
        ).filter(
            F.col("img_url").isNotNull() & (F.col("img_url") != "")
            & (F.length(F.coalesce(F.col("caption"), F.lit("")))
               >= min_alt_chars)
        )
        imgs = imgs.unionByName(og_rows)
    pairs = imgs.groupBy("img_url", "caption").agg(
        F.min("page_url").alias("page_url"),
        F.count(F.lit(1)).alias("n_embeds"),
        F.min("decl_width").alias("decl_width"),
        F.min("decl_height").alias("decl_height"),
    )
    if media is None:
        return pairs
    m = media.select(
        url_normalize(F.col(media_url_col)).alias("img_url"),
        F.col(payload_col).alias("payload"),
    )
    joined = pairs.join(m, "img_url")
    if not quality_gate:
        return joined
    sig = image_quality_signals(joined, payload_col="payload")
    return sig.filter(F.col("keep")).drop("keep")
