"""Multispectral indices — pure per-cell arithmetic, Catalyst-native.

Reference semantics: xrspatial/multispectral.py.  Every index is a
guarded ratio over band columns of one long-form DataFrame (the
reference's Dataset-of-bands becomes column selection,
dataset_support.py:36-80).  All run inside whole-stage codegen; zero
Python, zero shuffles — at 100 TB these are scan-bound.

Denominator == 0 -> NULL (the reference leaves NaN, e.g.
multispectral.py:38-41, 826-841).  NULL inputs propagate to NULL
automatically, matching NaN propagation.

Formulas (kernel citations):
  arvi  (nir-2red+blue)/(nir+2red+blue)        multispectral.py:38-41
  evi   gain*(nir-red)/(nir+c1*red-c2*blue+s)  multispectral.py:184-187
  gci   nir/green - 1                          multispectral.py:358-359
  nbr   nr(nir, swir2)                         multispectral.py:546-552
  nbr2  nr(swir1, swir2)                       multispectral.py:637-643
  ndvi  nr(nir, red)                           multispectral.py:721-727
  ndmi  nr(nir, swir1)                         multispectral.py:810-816
  savi  (nir-red)/((nir+red+s)*(1+s))          multispectral.py:884-888
  sipi  (nir-blue)/(nir-red)                   multispectral.py:1026-1029
  ebbi  (swir-red)/(10*sqrt(swir+tir))         multispectral.py:1169-1172
  where nr(a,b) = (a-b)/(a+b)                  multispectral.py:826-841
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _guard(num: Column, denom: Column) -> Column:
    return F.when(denom != 0.0, num / denom).otherwise(F.lit(None))


def normalized_ratio(a: Column, b: Column) -> Column:
    return _guard(a - b, a + b)


def arvi_expr(nir: Column, red: Column, blue: Column) -> Column:
    return _guard(nir - 2.0 * red + blue, nir + 2.0 * red + blue)


def evi_expr(
    nir: Column, red: Column, blue: Column,
    c1: float = 6.0, c2: float = 7.5, soil_factor: float = 1.0, gain: float = 2.5,
) -> Column:
    if not -1.0 <= soil_factor <= 1.0:
        raise ValueError("soil factor must be between [-1.0, 1.0]")
    if gain < 0:
        raise ValueError("gain must be greater than 0")
    denom = nir + F.lit(c1) * red - F.lit(c2) * blue + F.lit(soil_factor)
    return F.when(denom != 0.0, F.lit(gain) * (nir - red) / denom).otherwise(F.lit(None))


def gci_expr(nir: Column, green: Column) -> Column:
    return F.when(green != 0.0, nir / green - 1.0).otherwise(F.lit(None))


def savi_expr(nir: Column, red: Column, soil_factor: float = 1.0) -> Column:
    if not -1.0 <= soil_factor <= 1.0:
        raise ValueError("soil factor must be between [-1.0, 1.0]")
    denom = (nir + red + F.lit(soil_factor)) * F.lit(1.0 + soil_factor)
    return _guard(nir - red, denom)


def sipi_expr(nir: Column, red: Column, blue: Column) -> Column:
    return _guard(nir - blue, nir - red)


def ebbi_expr(red: Column, swir: Column, tir: Column) -> Column:
    return _guard(swir - red, F.lit(10.0) * F.sqrt(swir + tir))


def true_color_exprs(
    r: Column, g: Column, b: Column,
    r_minmax: tuple[float, float], g_minmax: tuple[float, float],
    b_minmax: tuple[float, float],
    c: float = 10.0, th: float = 0.125, nodata: float = 1.0,
) -> list[Column]:
    """Per-band min-max normalize + sigmoid -> 0..255 channels
    (multispectral.py:1335-1401).  The min/max come from a separate
    tiny aggregate job (the reference's eager pre-pass); this returns
    the per-cell expressions for job 2."""
    outs = []
    for col, (lo, hi), name in ((r, r_minmax, "r"), (g, g_minmax, "g"), (b, b_minmax, "b")):
        norm = (col - F.lit(lo)) / F.lit(hi - lo)
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(c) * (F.lit(th) - norm)))
        outs.append(F.round(sig * 255.0).cast("int").alias(name))
    a = F.when(r.isNotNull() & (r != nodata), F.lit(255)).otherwise(F.lit(0)).alias("a")
    return outs + [a]


# DataFrame-level wrappers: df with band columns -> df + index column

def _wrap(df: DataFrame, out_col: str, expr: Column) -> DataFrame:
    return df.withColumn(out_col, expr)


def arvi(df, nir="nir", red="red", blue="blue", out_col="arvi"):
    return _wrap(df, out_col, arvi_expr(F.col(nir), F.col(red), F.col(blue)))


def evi(df, nir="nir", red="red", blue="blue", c1=6.0, c2=7.5, soil_factor=1.0,
        gain=2.5, out_col="evi"):
    return _wrap(df, out_col, evi_expr(F.col(nir), F.col(red), F.col(blue), c1, c2,
                                       soil_factor, gain))


def gci(df, nir="nir", green="green", out_col="gci"):
    return _wrap(df, out_col, gci_expr(F.col(nir), F.col(green)))


def nbr(df, nir="nir", swir2="swir2", out_col="nbr"):
    return _wrap(df, out_col, normalized_ratio(F.col(nir), F.col(swir2)))


def nbr2(df, swir1="swir1", swir2="swir2", out_col="nbr2"):
    return _wrap(df, out_col, normalized_ratio(F.col(swir1), F.col(swir2)))


def ndvi(df, nir="nir", red="red", out_col="ndvi"):
    return _wrap(df, out_col, normalized_ratio(F.col(nir), F.col(red)))


def ndmi(df, nir="nir", swir1="swir1", out_col="ndmi"):
    return _wrap(df, out_col, normalized_ratio(F.col(nir), F.col(swir1)))


def savi(df, nir="nir", red="red", soil_factor=1.0, out_col="savi"):
    return _wrap(df, out_col, savi_expr(F.col(nir), F.col(red), soil_factor))


def sipi(df, nir="nir", red="red", blue="blue", out_col="sipi"):
    return _wrap(df, out_col, sipi_expr(F.col(nir), F.col(red), F.col(blue)))


def ebbi(df, red="red", swir="swir", tir="tir", out_col="ebbi"):
    return _wrap(df, out_col, ebbi_expr(F.col(red), F.col(swir), F.col(tir)))


def true_color(df: DataFrame, r="red", g="green", b="blue", nodata=1.0,
               c=10.0, th=0.125) -> DataFrame:
    """Two-job plan: per-band min/max aggregate, then the sigmoid expr."""
    row = df.agg(
        F.min(r), F.max(r), F.min(g), F.max(g), F.min(b), F.max(b)
    ).collect()[0]
    exprs = true_color_exprs(
        F.col(r), F.col(g), F.col(b),
        (float(row[0]), float(row[1])),
        (float(row[2]), float(row[3])),
        (float(row[4]), float(row[5])),
        c=c, th=th, nodata=nodata,
    )
    keep = [col for col in df.columns if col not in (r, g, b)]
    return df.select(*keep, *exprs)
