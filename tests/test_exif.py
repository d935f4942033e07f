"""EXIF/GPS extraction (operators/exif.py) — the test encodes EXIF
blocks INDEPENDENTLY (its own little-/big-endian TIFF writer) so the
parser is checked against the spec, not against itself."""

import struct

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.operators import exif as X


def _entry(end, tag, typ, cnt, val_bytes, heap, heap_base):
    unit = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}[typ]
    if unit * cnt <= 4:
        inline = val_bytes + b"\x00" * (4 - len(val_bytes))
        return struct.pack(end + "HHI", tag, typ, cnt) + inline, heap
    off = heap_base + len(heap)
    return (struct.pack(end + "HHI", tag, typ, cnt)
            + struct.pack(end + "I", off)), heap + val_bytes


def _ifd(end, entries, ifd_off):
    """entries: [(tag, typ, cnt, payload_bytes)] -> (ifd_bytes, heap)."""
    n = len(entries)
    heap_base = ifd_off + 2 + 12 * n + 4
    body, heap = b"", b""
    for tag, typ, cnt, payload in entries:
        e, heap = _entry(end, tag, typ, cnt, payload, heap, heap_base)
        body += e
    return (struct.pack(end + "H", n) + body
            + struct.pack(end + "I", 0) + heap)


def _rat(end, pairs):
    return b"".join(struct.pack(end + "II", a, b) for a, b in pairs)


def _exif_jpeg(end="<", lat=(51, 30, 26.0), lat_ref=b"N",
               lon=(0, 7, 39.0), lon_ref=b"W", make=b"CamCo\x00"):
    # GPS IFD first (placed after IFD0); lay out IFD0 at offset 8
    def dms(t):
        d, m, s = t
        return [(int(d), 1), (int(m), 1), (int(s * 100), 100)]

    # IFD0: make + GPS pointer; GPS IFD offset computed after IFD0 size
    ifd0_entries = 2
    ifd0_size = 2 + 12 * ifd0_entries + 4
    make_heap = make if len(make) > 4 else b""
    gps_off = 8 + ifd0_size + len(make_heap)
    ifd0 = _ifd(end, [
        (0x010F, 2, len(make), make),
        (0x8825, 4, 1, struct.pack(end + "I", gps_off)),
    ], 8)
    gps = _ifd(end, [
        (1, 2, 2, lat_ref + b"\x00"),
        (2, 5, 3, _rat(end, dms(lat))),
        (3, 2, 2, lon_ref + b"\x00"),
        (4, 5, 3, _rat(end, dms(lon))),
    ], gps_off)
    tiff = ((b"II" if end == "<" else b"MM")
            + struct.pack(end + "HI", 42, 8) + ifd0[:ifd0_size]
            + ifd0[ifd0_size:] + gps)
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"


class TestParseExif:
    def test_gps_both_endians(self):
        for end in ("<", ">"):
            d = X.parse_exif(_exif_jpeg(end=end))
            assert d["make"] == "CamCo", end
            assert d["lat"] == pytest.approx(51 + 30 / 60 + 26.0 / 3600)
            assert d["lon"] == pytest.approx(-(0 + 7 / 60 + 39.0 / 3600))

    def test_southern_hemisphere_sign(self):
        d = X.parse_exif(_exif_jpeg(lat=(33, 52, 4.0), lat_ref=b"S",
                                    lon=(151, 12, 26.0), lon_ref=b"E"))
        assert d["lat"] < 0 < d["lon"]

    def test_no_exif_and_garbage(self):
        assert X.parse_exif(b"") == {}
        assert X.parse_exif(b"\xff\xd8\xff\xd9") == {}
        assert X.parse_exif(b"not an image at all") == {}

    def test_truncation_never_raises(self):
        full = _exif_jpeg()
        for cut in range(0, len(full), 7):
            X.parse_exif(full[:cut])  # must not raise

    def test_bare_tiff_block(self):
        jpeg = _exif_jpeg()
        tiff = jpeg[jpeg.index(b"Exif\x00\x00") + 6:-2]
        d = X.parse_exif(tiff)
        assert d["make"] == "CamCo" and "lat" in d


class TestGeotagImages:
    def test_blobs_to_s2_cells(self, spark):
        from xarray_spatial_spark import s2
        import numpy as np

        london = _exif_jpeg()  # 51.5074-ish N, 0.1275 W
        sydney = _exif_jpeg(lat=(33, 52, 4.0), lat_ref=b"S",
                            lon=(151, 12, 26.0), lon_ref=b"E")
        rows = [(1, bytearray(london)), (2, bytearray(sydney)),
                (3, bytearray(b"\xff\xd8\xff\xd9")), (4, None)]
        df = spark.createDataFrame(rows, "id int, image binary")
        out = {r["id"]: r for r in
               X.geotag_images(df, "image", level=12).collect()}
        lat1, lon1 = out[1]["lat"], out[1]["lon"]
        want1 = int(s2.cell_of(np.array([lon1]), np.array([lat1]), 12)[0])
        assert out[1]["cell_id"] == want1
        assert out[2]["cell_id"] is not None
        assert out[1]["cell_id"] != out[2]["cell_id"]
        assert out[3]["cell_id"] is None and out[4]["cell_id"] is None
        assert out[1]["tile_id"] is not None
