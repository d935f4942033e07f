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
from pyspark.sql import functions as F

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


def collect_dense(
    df: DataFrame,
    value_col: str = "value",
    shape: tuple[int, int] | None = None,
    y0: int = 0,
    x0: int = 0,
    cap_cells: int = 200_000_000,
) -> np.ndarray:
    """Driver-side dense materialization for the few operators whose
    algorithm is inherently global (viewshed line-of-sight, A*).

    Unlike ``toPandas`` this collects PACKED per-partition numpy blobs
    (24 bytes/cell in three binary cells per partition, built
    map-side), so the driver never holds per-row objects; and it
    REFUSES rasters above ``cap_cells`` (default 2x10^8 ~= 1.6 GB
    dense) with an actionable error instead of melting the driver —
    the documented scale boundary of the global algorithms (the
    reference has the same boundary implicitly: its viewshed holds the
    whole array in one process)."""
    import pandas as pd

    def _refuse(H: int, W: int) -> None:
        if H * W > cap_cells:
            raise ValueError(
                f"raster has {H}x{W} = {H*W} cells, above the driver "
                f"materialization cap ({cap_cells}). This operator is "
                "inherently global; restrict the window (margin/filter) "
                "or raise cap_cells explicitly."
            )

    # the cap must fire BEFORE the driver collect (that is its whole
    # point): explicit shape is checked for free; unknown shape pays
    # one cheap min/max aggregation scan first (round-3 briefly
    # derived the extent from the collected blobs to save that job —
    # which moved the refusal after the driver had materialized
    # everything the cap exists to refuse)
    if shape is not None:
        _refuse(*shape)
    else:
        row = df.agg(
            F.max("y").alias("my"), F.max("x").alias("mx"),
            F.min("y").alias("ny"), F.min("x").alias("nx"),
        ).collect()[0]
        if row["my"] is None:
            return np.full((0, 0), np.nan)
        y0, x0 = int(row["ny"]), int(row["nx"])
        shape = (int(row["my"]) - y0 + 1, int(row["mx"]) - x0 + 1)
        _refuse(*shape)

    def _pack(batches):
        ys, xs, vs = [], [], []
        for pdf in batches:
            ys.append(pdf["y"].to_numpy(np.int64))
            xs.append(pdf["x"].to_numpy(np.int64))
            vs.append(pdf[value_col].to_numpy(np.float64))
        if ys:
            yield pd.DataFrame({
                "yb": [np.concatenate(ys).tobytes()],
                "xb": [np.concatenate(xs).tobytes()],
                "vb": [np.concatenate(vs).tobytes()],
            })

    parts = (
        df.select("y", "x", value_col)
        .mapInPandas(_pack, schema="yb binary, xb binary, vb binary")
        .collect()
    )
    H, W = shape
    out = np.full((H, W), np.nan)
    for r in parts:
        yy = np.frombuffer(r["yb"], np.int64) - y0
        xx = np.frombuffer(r["xb"], np.int64) - x0
        out[yy, xx] = np.frombuffer(r["vb"], np.float64)
    return out
