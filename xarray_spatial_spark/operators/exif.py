"""EXIF metadata extraction — the multimodal↔geospatial bridge.

Real crawl geodata arrives two ways: page text geocoding (the
documents source) and GPS EXIF inside crawled images.  This module
parses the EXIF (TIFF) block out of JPEG APP1 segments FROM SCRATCH
against the public specs (JEITA CP-3451 / TIFF 6.0) — no imaging
library — and surfaces the crawl-relevant tags, most importantly the
GPS latitude/longitude that feed straight into the S2/tile assignment
operators: crawled image blob -> (lat, lon) -> cell id, the same
downstream path as geocoded pages.

Parsing is defensive by construction: every offset is bounds-checked,
unknown tags/types are skipped, and any truncation yields the fields
parsed so far — a crawl sees arbitrarily damaged files, and a decode
error must cost one NULL row, not a task.  Per-blob work is inherently
per-payload Python (like the codec tier) and runs inside Arrow-batched
``mapInPandas``/``pandas_udf``; the output is a plain struct column so
everything downstream stays in Catalyst.

Reference: xarray-spatial has no EXIF tier; this extends the
multimodal family (SURVEY.md §2 addenda) the way jpeg.py/webp.py do.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_exif", "exif_metadata", "geotag_images"]

# TIFF field types we interpret: id -> (size in bytes, struct code)
_TYPES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime"}
_EXIF_PTR, _GPS_PTR = 0x8769, 0x8825
_EXIF_TAGS = {0x9003: "datetime_original"}


def _read_value(data, off, typ, cnt, end):
    """One IFD entry's decoded value (list for multi-count), or None."""
    unit = _TYPES.get(typ)
    if unit is None:
        return None
    total = unit * cnt
    if total <= 4:
        raw = data[off:off + total]
    else:
        if off + 4 > len(data):
            return None
        ptr = struct.unpack(end + "I", data[off:off + 4])[0]
        if ptr + total > len(data):
            return None
        raw = data[ptr:ptr + total]
    if len(raw) < total:
        return None
    if typ == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ in (1, 7):
        return list(raw)
    if typ == 3:
        return list(struct.unpack(end + "H" * cnt, raw))
    if typ == 4:
        return list(struct.unpack(end + "I" * cnt, raw))
    if typ == 9:
        return list(struct.unpack(end + "i" * cnt, raw))
    # (S)RATIONAL pairs
    code = "ii" if typ == 10 else "II"
    flat = struct.unpack(end + code * cnt, raw)
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]


def _walk_ifd(data, ifd_off, end):
    """{tag: value} for one IFD; silently stops at any truncation."""
    out = {}
    if ifd_off + 2 > len(data):
        return out
    (n,) = struct.unpack(end + "H", data[ifd_off:ifd_off + 2])
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, typ, cnt = struct.unpack(end + "HHI", data[e:e + 8])
        val = _read_value(data, e + 8, typ, cnt, end)
        if val is not None:
            out[tag] = val
    return out


def _dms(rats, ref):
    """3 GPS rationals + hemisphere ref -> signed decimal degrees."""
    try:
        d = rats[0][0] / rats[0][1] if rats[0][1] else 0.0
        m = rats[1][0] / rats[1][1] if len(rats) > 1 and rats[1][1] else 0.0
        s = rats[2][0] / rats[2][1] if len(rats) > 2 and rats[2][1] else 0.0
    except (TypeError, IndexError, ZeroDivisionError):
        return None
    deg = d + m / 60.0 + s / 3600.0
    if isinstance(ref, str) and ref.upper() in ("S", "W"):
        deg = -deg
    return deg


def parse_exif(blob: bytes) -> dict:
    """EXIF fields from a JPEG byte string (or a bare TIFF block).

    Returns a dict with any of: ``make, model, orientation, datetime,
    datetime_original, lat, lon, alt_m`` — empty when there is no
    EXIF.  Never raises on malformed input; whatever parsed before
    the damage is returned."""
    if not blob or len(blob) < 8:
        return {}
    data = bytes(blob)
    tiff = None
    if data[:2] == b"\xff\xd8":  # JPEG: find APP1/Exif
        pos = 2
        while pos + 4 <= len(data) and data[pos] == 0xFF:
            marker, seglen = data[pos + 1], struct.unpack(
                ">H", data[pos + 2:pos + 4])[0]
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                tiff = data[pos + 10:pos + 2 + seglen]
                break
            if marker in (0xDA, 0xD9):  # image data starts; no EXIF
                break
            pos += 2 + seglen
    elif data[:2] in (b"II", b"MM"):
        tiff = data
    if not tiff or len(tiff) < 8:
        return {}
    end = "<" if tiff[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack(end + "HI", tiff[2:8])
    if magic != 42:
        return {}
    out = {}
    ifd = _walk_ifd(tiff, ifd0, end)
    for tag, name in _IFD0_TAGS.items():
        if tag in ifd:
            v = ifd[tag]
            out[name] = v[0] if isinstance(v, list) and len(v) == 1 else v
    if _EXIF_PTR in ifd:
        sub = _walk_ifd(tiff, ifd[_EXIF_PTR][0], end)
        for tag, name in _EXIF_TAGS.items():
            if tag in sub:
                out[name] = sub[tag]
    if _GPS_PTR in ifd:
        gps = _walk_ifd(tiff, ifd[_GPS_PTR][0], end)
        lat = _dms(gps.get(2, ()), gps.get(1))
        lon = _dms(gps.get(4, ()), gps.get(3))
        if lat is not None and lon is not None:
            out["lat"], out["lon"] = lat, lon
        alt = gps.get(6)
        if alt:
            num, den = alt[0]
            if den:
                sign = -1.0 if gps.get(5) in ([1], 1) else 1.0
                out["alt_m"] = sign * num / den
    return out


_SCHEMA = ("make string, model string, orientation int, "
           "datetime string, lat double, lon double, alt_m double")


def exif_metadata(blob: Column) -> Column:
    """Struct column of EXIF fields from an image binary column —
    Arrow-batched; a damaged blob yields NULL fields, never an
    error."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_SCHEMA)
    def _meta(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            d = parse_exif(b) if b is not None else {}
            o = d.get("orientation")
            rows.append((d.get("make"), d.get("model"),
                         int(o) if o is not None else None,
                         d.get("datetime"), d.get("lat"), d.get("lon"),
                         d.get("alt_m")))
        return pd.DataFrame(rows, columns=[
            "make", "model", "orientation", "datetime",
            "lat", "lon", "alt_m"])

    return _meta(blob)


def geotag_images(
    df: DataFrame,
    blob_col: str = "image",
    level: int = 12,
    tile_level: int | None = 8,
) -> DataFrame:
    """Crawled image blobs -> S2 cells: EXIF GPS feeds the same
    assign_cells_s2 path geocoded pages take.  Rows without GPS keep
    NULL cell ids (filter or route them to text geocoding); the EXIF
    pass and the cell encode both ride the scan stage — no exchange.
    Adds ``exif`` (struct), ``lat``, ``lon``, ``cell_id`` and
    optionally ``tile_id``."""
    from xarray_spatial_spark import s2

    out = df.withColumn("exif", exif_metadata(F.col(blob_col)))
    out = out.withColumn("lat", F.col("exif.lat")).withColumn(
        "lon", F.col("exif.lon"))
    has = F.col("lat").isNotNull() & F.col("lon").isNotNull()
    # coalesce the masked rows to (0, 0) so the vectorized encoder
    # never casts NaN (the when() discards those outputs anyway)
    out = out.withColumn(
        "cell_id",
        F.when(has, s2.cell_col(F.coalesce(F.col("lon"), F.lit(0.0)),
                                F.coalesce(F.col("lat"), F.lit(0.0)),
                                level)))
    if tile_level is not None:
        out = out.withColumn(
            "tile_id",
            F.when(has, s2.parent_col(F.col("cell_id"), tile_level)))
    return out
