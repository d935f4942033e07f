"""Kernel constructors + 2-D convolution.

Reference semantics: xrspatial/convolution.py (cellsize/distance
parsing :42-134, ellipse core :137-146, circle :149-196, annulus
:199-259, custom :262-282, convolve_2d :285-397).

Kernels are tiny numpy arrays built on the driver and closed over by
the stencil function (broadcast with the task).  Convolution is
NaN-propagating (reference `_convolve_2d_numpy` has no NaN skip) and
leaves a NaN ring of the kernel half-size at raster edges.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame

from xarray_spatial_spark.operators.halo import apply_stencil, windows

DEFAULT_UNIT = "meter"
METER = 1
FOOT = 0.3048
KILOMETER = 1000
MILE = 1609.344
UNITS = {"meter": METER, "meters": METER, "m": METER,
         "feet": FOOT, "foot": FOOT, "ft": FOOT,
         "mile": MILE, "miles": MILE, "mls": MILE, "ml": MILE,
         "kilometer": KILOMETER, "kilometers": KILOMETER, "km": KILOMETER,
         "kms": KILOMETER}


def _to_meters(d: float, unit: str) -> float:
    unit = unit.lower()
    if unit not in UNITS:
        raise ValueError(f"Distance unit should be one of {set(UNITS)}")
    return d * UNITS[unit]


def _get_distance(distance_str: str) -> float:
    """Parse '1 mile' / '300 meters' / '0.5 km' (convolution.py:42-75)."""
    m = re.match(r"([0-9.]+)\s*(\w*)", distance_str.strip())
    if m is None:
        raise ValueError(f"Invalid distance: {distance_str!r}")
    d = float(m.group(1))
    unit = m.group(2) or DEFAULT_UNIT
    return _to_meters(d, unit)


def calc_cellsize(xres: float, yres: float, unit: str = "meter") -> tuple[float, float]:
    """Cellsize in meters from grid resolution (convolution.py:78-134)."""
    return _to_meters(xres, unit), _to_meters(yres, unit)


def _ellipse_kernel(half_w: int, half_h: int) -> np.ndarray:
    # (x/a)^2 + (y/b)^2 <= 1, multiplied out (convolution.py:137-146)
    x = np.linspace(-half_w, half_w, 2 * half_w + 1)
    y = np.linspace(-half_h, half_h, 2 * half_h + 1)[:, None]
    ellipse = (x * half_h) ** 2 + (y * half_w) ** 2 <= (half_w * half_h) ** 2
    return ellipse.astype(float)


def circle_kernel(cellsize_x: float, cellsize_y: float, radius) -> np.ndarray:
    """Circular 0/1 kernel (convolution.py:149-196); radius may be a
    number (same unit as cellsize) or a distance string."""
    if isinstance(radius, str):
        radius = _get_distance(radius)
    kernel_half_w = int(radius / cellsize_x)
    kernel_half_h = int(radius / cellsize_y)
    return _ellipse_kernel(kernel_half_w, kernel_half_h)


def annulus_kernel(cellsize_x, cellsize_y, outer_radius, inner_radius) -> np.ndarray:
    """Ring kernel = outer circle minus strictly-inner circle
    (convolution.py:199-259)."""
    if isinstance(outer_radius, str):
        outer_radius = _get_distance(outer_radius)
    if isinstance(inner_radius, str):
        inner_radius = _get_distance(inner_radius)
    if outer_radius <= inner_radius:
        raise ValueError("Outer radius must be bigger than inner radius")
    kernel_outer = circle_kernel(cellsize_x, cellsize_y, outer_radius)
    kernel_inner = circle_kernel(cellsize_x, cellsize_y, inner_radius)
    pad_h = (kernel_outer.shape[0] - kernel_inner.shape[0]) // 2
    pad_w = (kernel_outer.shape[1] - kernel_inner.shape[1]) // 2
    kernel_inner = np.pad(kernel_inner, ((pad_h, pad_h), (pad_w, pad_w)))
    out = kernel_outer - kernel_inner
    out[out < 0] = 0
    return out


def custom_kernel(kernel: np.ndarray) -> np.ndarray:
    """Validate: 2-D, odd dims (convolution.py:262-282)."""
    kernel = np.asarray(kernel)
    if kernel.ndim != 2:
        raise ValueError("Kernel must be a 2D array")
    if kernel.shape[0] % 2 == 0 or kernel.shape[1] % 2 == 0:
        raise ValueError("Kernel dimensions should be odd")
    return kernel.astype(float)


def convolve_numpy(padded: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Weighted sum over each window; NaN propagates (no skip),
    matching `_convolve_2d_numpy` convolution.py:285-313."""
    kh, kw = kernel.shape
    w = windows(padded, kh, kw)
    return np.einsum("ijkl,kl->ij", w, kernel)


def convolve_2d(
    df: DataFrame,
    kernel: np.ndarray,
    value_col: str = "value",
    out_col: str | None = None,
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Distributed 2-D convolution via halo-tile stencil
    (convolution.py:316-397).  Edge ring (kernel half-size) -> NULL."""
    kernel = custom_kernel(kernel)
    kh, kw = kernel.shape
    r = max(kh // 2, kw // 2)
    # pad the kernel square so one halo radius serves both axes
    if kh // 2 != r or kw // 2 != r:
        ph, pw = r - kh // 2, r - kw // 2
        kernel = np.pad(kernel, ((ph, ph), (pw, pw)))
    out = out_col or value_col

    def _fn(arrs):
        return {out: convolve_numpy(arrs[value_col], kernel)}

    return apply_stencil(
        df, _fn, r, value_cols=(value_col,), out_cols=(out,),
        tile_h=tile_h, tile_w=tile_w,
    )
