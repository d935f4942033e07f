"""Long-form raster <-> numpy bridges.

The engine's raster representation is a cell-per-row DataFrame
``(y:int, x:int, value:double)`` (+ extra band columns), the columnar
re-expression of the reference's dense ``xr.DataArray``.  The
universal nodata is SQL NULL, standing in for the reference's NaN
(reference xrspatial/zonal.py:135-138 excludes NaN from stats; ±inf is
also invalid per the ``np.isfinite`` filters at zonal.py:190,
classify.py:164).  ``df_from_numpy`` maps NaN/±inf -> NULL on the way
in; ``numpy_from_df`` maps NULL -> NaN on the way out, so reference
golden arrays compare directly with ``np.testing.assert_allclose``.

These bridges are for tests/fixtures; production data is read as
parquet/Iceberg and never round-trips through the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from xarray_spatial_spark.grid import GridSpec

RASTER_SCHEMA = "y int, x int, value double"


def df_from_numpy(
    spark: SparkSession,
    arr: np.ndarray,
    value_col: str = "value",
    keep_nonfinite: bool = False,
) -> DataFrame:
    """Dense 2-D array -> long-form DataFrame. NaN/±inf become NULL
    unless ``keep_nonfinite`` (some ops, e.g. proximity, treat ±inf as
    a present-but-invalid cell distinct from NaN)."""
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vals = arr.ravel()
    pdf = pd.DataFrame(
        {"y": yy.ravel().astype(np.int32), "x": xx.ravel().astype(np.int32), value_col: vals}
    )
    if not keep_nonfinite:
        pdf.loc[~np.isfinite(vals), value_col] = None
    return spark.createDataFrame(pdf, schema=f"y int, x int, {value_col} double")


def df_from_bands(spark: SparkSession, **bands: np.ndarray) -> DataFrame:
    """Multiple equal-shape 2-D arrays -> one long-form DataFrame with a
    value column per band (the reference's Dataset-of-bands,
    dataset_support.py:36-80, becomes plain column selection)."""
    names = list(bands)
    first = np.asarray(bands[names[0]], dtype=np.float64)
    h, w = first.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    data = {"y": yy.ravel().astype(np.int32), "x": xx.ravel().astype(np.int32)}
    for name in names:
        a = np.asarray(bands[name], dtype=np.float64)
        if a.shape != (h, w):
            raise ValueError("all bands must share one shape")
        v = a.ravel()
        col = pd.Series(v)
        col[~np.isfinite(v)] = None
        data[name] = col
    schema = "y int, x int, " + ", ".join(f"{n} double" for n in names)
    return spark.createDataFrame(pd.DataFrame(data), schema=schema)


def numpy_from_df(
    df: DataFrame, spec: GridSpec | None = None, value_col: str = "value"
) -> np.ndarray:
    """Long-form DataFrame -> dense 2-D array (tests only; collects)."""
    pdf = df.select("y", "x", value_col).toPandas()
    if spec is not None:
        h, w = spec.height, spec.width
    else:
        h = int(pdf["y"].max()) + 1
        w = int(pdf["x"].max()) + 1
    out = np.full((h, w), np.nan, dtype=np.float64)
    out[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf[value_col].to_numpy(dtype=np.float64)
    return out
