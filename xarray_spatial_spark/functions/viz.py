"""Rendering helpers — the reference's image-building utilities as
pure Column expressions over long-form rasters.

Reference semantics:

- ``bands_to_img`` (xrspatial/utils.py:363-371): three uint8 band
  arrays -> RGBA image; alpha = 0 where the r band is NaN or
  <= nodata, else 255.  Here each cell's RGBA packs into one int64
  column (little-endian R | G<<8 | B<<16 | A<<24, the same uint32
  view datashader produces), so "an image" is a (y, x, rgba) frame —
  render-ready after a driver-side reshape, and writable at any scale
  as tiles.
- ``color_values`` (utils.py:445-452): categorical value -> color-key
  lookup, missing values -> 0 (transparent).  The key set is small by
  construction, so the lookup inlines as a whole-stage-codegen CASE
  ladder.

Both are deterministic arithmetic, so they oracle-check in ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

_NAMED = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "lime": (0, 255, 0), "blue": (0, 0, 255),
    "yellow": (255, 255, 0), "cyan": (0, 255, 255), "magenta": (255, 0, 255),
    "gray": (128, 128, 128), "grey": (128, 128, 128),
    "orange": (255, 165, 0), "purple": (128, 0, 128), "brown": (165, 42, 42),
}


def _rgb(color) -> tuple[int, int, int]:
    """(r, g, b) from a tuple, '#rrggbb' hex, or a common color name."""
    if isinstance(color, (tuple, list)) and len(color) == 3:
        return tuple(int(c) for c in color)
    if isinstance(color, str):
        c = color.strip().lower()
        if c.startswith("#") and len(c) == 7:
            return (int(c[1:3], 16), int(c[3:5], 16), int(c[5:7], 16))
        if c in _NAMED:
            return _NAMED[c]
    raise ValueError(f"unsupported color spec {color!r}")


def pack_rgba(r: Column, g: Column, b: Column, a: Column) -> Column:
    """uint8 channels -> one int64 little-endian RGBA word."""
    u8 = lambda c: F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(255))
    return (
        u8(r) + u8(g) * F.lit(1 << 8) + u8(b) * F.lit(1 << 16)
        + u8(a) * F.lit(1 << 24)
    )


def bands_to_img_expr(
    r: Column, g: Column, b: Column, nodata: float = 1
) -> Column:
    """Reference ``bands_to_img``: alpha 0 where r is NULL/NaN or
    <= nodata, else 255 (utils.py:369)."""
    invalid = r.isNull() | F.isnan(r.cast("double")) | (r <= F.lit(nodata))
    alpha = F.when(invalid, F.lit(0)).otherwise(F.lit(255))
    return pack_rgba(
        F.coalesce(r, F.lit(0)), F.coalesce(g, F.lit(0)),
        F.coalesce(b, F.lit(0)), alpha,
    )


def color_values_expr(
    value: Column, color_key: Mapping, alpha: int = 255
) -> Column:
    """Reference ``color_values``: categorical -> packed RGBA via the
    color key; values outside the key -> 0 (utils.py:450 ``get(v, 0)``)."""
    expr = None
    for k, color in color_key.items():
        r, g, b = _rgb(color)
        packed = r | (g << 8) | (b << 16) | (int(alpha) << 24)
        cond = value == F.lit(k)
        expr = F.when(cond, F.lit(packed)) if expr is None else expr.when(
            cond, F.lit(packed)
        )
    if expr is None:
        return F.lit(0).cast("long")
    return expr.otherwise(F.lit(0)).cast("long")
