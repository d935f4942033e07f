"""Surface family — fixed 3x3 stencils over halo tiles.

Reference kernels (all carried verbatim as vectorized numpy over the
padded tile; borders of the raster get NULL because the halo pad is
NaN there):

- slope (planar):  Horn gradient -> degrees      slope.py:56-76
- aspect:          compass downslope direction   aspect.py:56-90
- curvature:       -2(d+e)*100/cellsize^2        curvature.py:31-41
- hillshade:       np.gradient illumination      hillshade.py:20-35

Compute dtype float32 matches the reference kernels (slope.py:58)
before widening to double on output.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from xarray_spatial_spark.operators.halo import apply_stencil


def _nine(a: np.ndarray):
    """The 8 neighbors + center of every interior cell, named per the
    reference's slope kernel orientation (slope.py:62-70: a..i with
    y+1 = next row)."""
    c0 = a[1:-1, 1:-1]
    return {
        "am": a[2:, :-2], "bm": a[2:, 1:-1], "cm": a[2:, 2:],
        "dm": a[1:-1, :-2], "e": c0, "fm": a[1:-1, 2:],
        "gm": a[:-2, :-2], "hm": a[:-2, 1:-1], "im": a[:-2, 2:],
    }


def slope(
    df: DataFrame,
    cellsize_x: float = 1.0,
    cellsize_y: float = 1.0,
    value_col: str = "value",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
    compute_dtype=np.float32,
) -> DataFrame:
    """Horn slope in degrees (slope.py:56-76).  ``compute_dtype``
    defaults to float32 for bit-parity with the reference kernel
    (slope.py:58); pass float64 when comparing against a
    double-precision SQL oracle."""
    out = out_col or value_col
    fn, r = slope_stencil(cellsize_x, cellsize_y, value_col, out, compute_dtype)
    return apply_stencil(df, fn, r, (value_col,), (out,), tile_h, tile_w)


def slope_stencil(
    cellsize_x: float = 1.0,
    cellsize_y: float = 1.0,
    value_col: str = "value",
    out_col: str | None = None,
    compute_dtype=np.float32,
):
    """The Horn-slope kernel as a ``(fn, radius)`` pair, composable
    into multi-op single-exchange chains via ``tiled.fuse_stencils``
    (e.g. smooth -> slope -> smooth costs ONE halo shuffle)."""
    out = out_col or value_col

    def _fn(arrs):
        a = arrs[value_col].astype(compute_dtype)
        n = _nine(a)
        dz_dx = ((n["cm"] + 2 * n["fm"] + n["im"]) - (n["am"] + 2 * n["dm"] + n["gm"])) / (
            8 * cellsize_x
        )
        dz_dy = ((n["gm"] + 2 * n["hm"] + n["im"]) - (n["am"] + 2 * n["bm"] + n["cm"])) / (
            8 * cellsize_y
        )
        p = (dz_dx * dz_dx + dz_dy * dz_dy) ** 0.5
        return {out: np.arctan(p) * 57.29578}

    return _fn, 1


def aspect(
    df: DataFrame,
    value_col: str = "value",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Downslope compass direction 0-360, flat -> -1 (aspect.py:56-90).
    NOTE the reference's aspect kernel indexes rows opposite to slope's
    (a = data[y-1, x-1]); reproduced exactly."""
    out = out_col or value_col

    def _fn(arrs):
        arr = arrs[value_col].astype(np.float32)
        a = arr[:-2, :-2]
        b = arr[:-2, 1:-1]
        c = arr[:-2, 2:]
        d = arr[1:-1, :-2]
        f = arr[1:-1, 2:]
        g = arr[2:, :-2]
        h = arr[2:, 1:-1]
        i = arr[2:, 2:]
        dz_dx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
        dz_dy = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
        asp = np.arctan2(dz_dy, -dz_dx) * (180.0 / np.pi)
        compass = np.where(
            asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp)
        )
        flat = (dz_dx == 0) & (dz_dy == 0)
        res = np.where(flat, -1.0, compass)
        res = np.where(np.isnan(asp), np.nan, res)
        return {out: res}

    return apply_stencil(df, _fn, 1, (value_col,), (out,), tile_h, tile_w)


def curvature(
    df: DataFrame,
    cellsize: float = 1.0,
    value_col: str = "value",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Plus-shaped second derivative * 100 (curvature.py:31-41)."""
    out = out_col or value_col

    def _fn(arrs):
        a = arrs[value_col]
        d = (a[2:, 1:-1] + a[:-2, 1:-1]) / 2 - a[1:-1, 1:-1]
        e = (a[1:-1, 2:] + a[1:-1, :-2]) / 2 - a[1:-1, 1:-1]
        return {out: -2 * (d + e) * 100 / (cellsize * cellsize)}

    return apply_stencil(df, _fn, 1, (value_col,), (out,), tile_h, tile_w)


def hillshade(
    df: DataFrame,
    azimuth: float = 225,
    angle_altitude: float = 25,
    value_col: str = "value",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Illumination 0..1 from azimuth/altitude (hillshade.py:20-35).
    np.gradient central differences need exactly 1 halo cell; the
    raster's outermost ring is NULL (reference sets borders NaN)."""
    out = out_col or value_col

    def _fn(arrs):
        data = arrs[value_col].astype(np.float32)
        az = 360.0 - azimuth
        gx, gy = np.gradient(data)
        slope_r = np.pi / 2.0 - np.arctan(np.sqrt(gx * gx + gy * gy))
        aspect_r = np.arctan2(-gx, gy)
        azr = az * np.pi / 180.0
        altr = angle_altitude * np.pi / 180.0
        shaded = np.sin(altr) * np.sin(slope_r) + np.cos(altr) * np.cos(slope_r) * np.cos(
            (azr - np.pi / 2.0) - aspect_r
        )
        res = (shaded + 1) / 2
        return {out: res[1:-1, 1:-1]}

    return apply_stencil(df, _fn, 1, (value_col,), (out,), tile_h, tile_w)


# ---------------------------------------------------------------------------
# geodesic variants (WGS-84 ECEF + local-tangent-plane least squares)
# reference: xrspatial/geodesic.py:26-200, slope.py:167-264
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_B = 6356752.314245
WGS84_A2 = WGS84_A * WGS84_A
WGS84_B2 = WGS84_B * WGS84_B
_INV_2R = 1.0 / (2.0 * 6370994.884953014)  # geodesic.py:181 R_MEAN

Z_FACTORS = {"meter": 1.0, "meters": 1.0, "m": 1.0,
             "foot": 0.3048, "feet": 0.3048, "ft": 0.3048,
             "kilometer": 1000.0, "km": 1000.0,
             "mile": 1609.344, "miles": 1609.344}


def _ecef(lat_rad, lon_rad, h):
    cl, sl = np.cos(lat_rad), np.sin(lat_rad)
    co, so = np.cos(lon_rad), np.sin(lon_rad)
    N = WGS84_A2 / np.sqrt(WGS84_A2 * cl * cl + WGS84_B2 * sl * sl)
    return ((N + h) * cl * co, (N + h) * cl * so, (WGS84_B2 / WGS84_A2 * N + h) * sl)


def _geodesic_fit(elev, lat, lon, z_factor):
    """Vectorized plane fit over every interior cell of a padded tile.
    elev/lat/lon: (H, W) padded arrays.  Returns (A, B, invalid_mask)
    for the (H-2, W-2) interior (geodesic.py:54-129 semantics:
    any-NaN neighborhood -> invalid; degenerate det -> flat A=B=0)."""
    # stack the 9 neighbors: shape (9, h, w)
    def nine(a):
        return np.stack([
            a[dy:dy + a.shape[0] - 2, dx:dx + a.shape[1] - 2]
            for dy in range(3) for dx in range(3)
        ])

    e9v = nine(elev) * z_factor
    la9 = np.radians(nine(lat))
    lo9 = np.radians(nine(lon))
    lat_c = np.radians(lat[1:-1, 1:-1])
    lon_c = np.radians(lon[1:-1, 1:-1])
    hc = elev[1:-1, 1:-1] * z_factor

    invalid = np.isnan(e9v).any(axis=0) | np.isnan(la9).any(axis=0)

    Xc, Yc, Zc = _ecef(lat_c, lon_c, hc)
    Xk, Yk, Zk = _ecef(la9, lo9, e9v)
    dx, dy, dz = Xk - Xc, Yk - Yc, Zk - Zc

    cl, sl = np.cos(lat_c), np.sin(lat_c)
    co, so = np.cos(lon_c), np.sin(lon_c)
    # local tangent frame (geodesic.py:79-82)
    e = dx * (-so) + dy * co
    n = dx * (-sl * co) + dy * (-sl * so) + dz * cl
    u = dx * (cl * co) + dy * (cl * so) + dz * sl
    u = u + (e * e + n * n) * _INV_2R  # curvature correction

    me, mn, mu = e.mean(axis=0), n.mean(axis=0), u.mean(axis=0)
    de, dn, du = e - me, n - mn, u - mu
    See = (de * de).sum(axis=0)
    Snn = (dn * dn).sum(axis=0)
    Sen = (de * dn).sum(axis=0)
    Seu = (de * du).sum(axis=0)
    Snu = (dn * du).sum(axis=0)
    det = See * Snn - Sen * Sen
    degenerate = np.abs(det) < 1e-30
    safe = np.where(degenerate, 1.0, det)
    A = np.where(degenerate, 0.0, (Seu * Snn - Snu * Sen) / safe)
    B = np.where(degenerate, 0.0, (Snu * See - Seu * Sen) / safe)
    return A, B, invalid


def geodesic_slope(
    df: DataFrame,
    value_col: str = "value",
    lat_col: str = "lat",
    lon_col: str = "lon",
    z_unit: str = "meter",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Slope on the WGS-84 ellipsoid via ECEF plane fit
    (slope.py method='geodesic'; math geodesic.py:26-143)."""
    zf = Z_FACTORS[z_unit.lower()]
    out = out_col or value_col

    def _fn(arrs):
        A, B, invalid = _geodesic_fit(arrs[value_col], arrs[lat_col],
                                      arrs[lon_col], zf)
        s = np.degrees(np.arctan(np.sqrt(A * A + B * B)))
        return {out: np.where(invalid, np.nan, s)}

    return apply_stencil(df, _fn, 1, (value_col, lat_col, lon_col), (out,),
                         tile_h, tile_w)


def geodesic_aspect(
    df: DataFrame,
    value_col: str = "value",
    lat_col: str = "lat",
    lon_col: str = "lon",
    z_unit: str = "meter",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Downslope compass aspect on the ellipsoid (geodesic.py:146-166:
    flat |grad| < 1e-7 -> -1; atan2(-A, -B) folded to [0, 360))."""
    zf = Z_FACTORS[z_unit.lower()]
    out = out_col or value_col

    def _fn(arrs):
        A, B, invalid = _geodesic_fit(arrs[value_col], arrs[lat_col],
                                      arrs[lon_col], zf)
        mag = np.sqrt(A * A + B * B)
        a = np.degrees(np.arctan2(-A, -B))
        a = np.where(a < 0, a + 360.0, a)
        a = np.where(a >= 360.0, a - 360.0, a)
        res = np.where(mag < 1e-7, -1.0, a)
        return {out: np.where(invalid, np.nan, res)}

    return apply_stencil(df, _fn, 1, (value_col, lat_col, lon_col), (out,),
                         tile_h, tile_w)


def summarize_terrain(
    df: DataFrame,
    cellsize_x: float = 1.0,
    cellsize_y: float = 1.0,
    value_col: str = "value",
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """slope+curvature+aspect in ONE fused halo pass (the reference's
    analytics.py:6-87 runs three ops; Catalyst can't fuse across pandas
    UDFs, so we fuse manually per SURVEY §4)."""
    def _fn(arrs):
        a32 = arrs[value_col].astype(np.float32)
        n = _nine(a32)
        dzx = ((n["cm"] + 2 * n["fm"] + n["im"]) - (n["am"] + 2 * n["dm"] + n["gm"])) / (
            8 * cellsize_x
        )
        dzy = ((n["gm"] + 2 * n["hm"] + n["im"]) - (n["am"] + 2 * n["bm"] + n["cm"])) / (
            8 * cellsize_y
        )
        slope_out = np.arctan((dzx * dzx + dzy * dzy) ** 0.5) * 57.29578

        arr = a32
        aa = arr[:-2, :-2]; bb = arr[:-2, 1:-1]; cc = arr[:-2, 2:]
        dd = arr[1:-1, :-2]; ff = arr[1:-1, 2:]
        gg = arr[2:, :-2]; hh = arr[2:, 1:-1]; ii = arr[2:, 2:]
        adzx = ((cc + 2 * ff + ii) - (aa + 2 * dd + gg)) / 8.0
        adzy = ((gg + 2 * hh + ii) - (aa + 2 * bb + cc)) / 8.0
        asp = np.arctan2(adzy, -adzx) * (180.0 / np.pi)
        compass = np.where(
            asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp)
        )
        aspect_out = np.where((adzx == 0) & (adzy == 0), -1.0, compass)
        aspect_out = np.where(np.isnan(asp), np.nan, aspect_out)

        a = arrs[value_col]
        d2 = (a[2:, 1:-1] + a[:-2, 1:-1]) / 2 - a[1:-1, 1:-1]
        e2 = (a[1:-1, 2:] + a[1:-1, :-2]) / 2 - a[1:-1, 1:-1]
        curv_out = -2 * (d2 + e2) * 100 / (cellsize_x * cellsize_x)
        return {"slope": slope_out, "aspect": aspect_out, "curvature": curv_out}

    return apply_stencil(
        df, _fn, 1, (value_col,), ("slope", "aspect", "curvature"), tile_h, tile_w
    )
