"""MP4/ISO-BMFF metadata parser (operators/multimodal.py): spec-exact
hand-built containers — the crawl catalog stage that runs before any
decode is attempted."""

import pytest

from xarray_spatial_spark.operators import multimodal as mm


def box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def big_box(btype: bytes, body: bytes) -> bytes:
    """64-bit largesize form."""
    return (
        (1).to_bytes(4, "big") + btype
        + (16 + len(body)).to_bytes(8, "big") + body
    )


def mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version:
        body = bytes([1, 0, 0, 0]) + b"\x00" * 16 \
            + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
    else:
        body = bytes(4) + b"\x00" * 8 \
            + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
    return box(b"mvhd", body + b"\x00" * 80)


def tkhd(w: int, h: int) -> bytes:
    body = bytes(4) + b"\x00" * 76 \
        + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
    return box(b"tkhd", body)


def trak(handler: bytes, codec: bytes, w: int = 0, h: int = 0) -> bytes:
    hdlr = box(b"hdlr", bytes(8) + handler + b"\x00" * 14)
    entry = (86).to_bytes(4, "big") + codec + b"\x00" * 78
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    parts = (tkhd(w, h) if w else b"") + mdia
    return box(b"trak", parts)


def mp4(brand: bytes = b"isom", tracks: bytes = b"",
        timescale: int = 1000, duration: int = 5000,
        mvhd_version: int = 0) -> bytes:
    ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + b"isomiso2")
    moov = box(b"moov", mvhd(timescale, duration, mvhd_version) + tracks)
    mdat = box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def test_minimal_movie():
    buf = mp4(tracks=trak(b"vide", b"avc1", 640, 360)
              + trak(b"soun", b"mp4a"))
    m = mm.mp4_metadata_bytes(buf)
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 5000
    assert m["n_tracks"] == 2
    assert m["track_handlers"] == ["vide", "soun"]
    assert m["codecs"] == ["avc1", "mp4a"]
    assert (m["width"], m["height"]) == (640, 360)


def test_mvhd_version1_and_odd_timescale():
    buf = mp4(timescale=90000, duration=90000 * 7 + 45000, mvhd_version=1)
    m = mm.mp4_metadata_bytes(buf)
    assert m["duration_ms"] == 7500


def test_largesize_box():
    inner = mvhd(1000, 2000) + trak(b"vide", b"hev1", 16, 16)
    buf = box(b"ftyp", b"mp42" + bytes(4) + b"mp42") \
        + big_box(b"moov", inner)
    m = mm.mp4_metadata_bytes(buf)
    assert m["brand"] == "mp42"
    assert m["duration_ms"] == 2000
    assert m["codecs"] == ["hev1"]


def test_truncated_stops_cleanly():
    buf = mp4(tracks=trak(b"vide", b"avc1", 32, 32))
    m = mm.mp4_metadata_bytes(buf[: len(buf) // 2])
    assert m["brand"] == "isom"  # parses what exists, no raise


def test_not_bmff_raises():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        mm.mp4_metadata_bytes(b"RIFF....WAVE")


def test_video_metadata_distributed(spark):
    good = mp4(tracks=trak(b"vide", b"av01", 1920, 1080))
    rows = [(0, bytearray(good)), (1, bytearray(b"junk-not-a-container"))]
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    out = {r["id"]: r for r in mm.video_metadata(df).collect()}
    assert out[0]["err"] is None
    assert out[0]["codecs"] == ["av01"]
    assert (out[0]["width"], out[0]["height"]) == (1920, 1080)
    assert out[0]["duration_ms"] == 5000
    assert out[1]["err"] and out[1]["brand"] is None
