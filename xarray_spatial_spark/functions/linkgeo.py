"""The geography of hyperlinks: OD matrices + gravity-model fits.

Web-graph edges whose endpoints are geotagged (geoparse, EXIF,
IP-geolocation, or the deterministic geocode) induce a spatial
interaction network: how much does place A link to place B, and how
fast does linking decay with distance?  The two classic tools:

- :func:`od_matrix` — the origin-destination flow table at a chosen
  web-mercator zoom: edges x locations -> per-(src_cell, dst_cell)
  flow counts + great-circle distance between cell centers.
- :func:`gravity_fit` — the log-linear gravity model
  ``ln T_ij = b0 + a ln O_i + b ln D_j - c ln d_ij`` (Zipf 1946;
  the standard spatial-interaction regression) fitted by exact OLS:
  ONE aggregation collects the 4x4 normal-equation sufficient
  statistics (upper triangle of X'X, X'y, y'y, n — 16 scalars), the
  driver solves the tiny system with numpy.  Returns coefficients +
  R^2; the distance-decay exponent is ``-coef_ln_dist``.

Scale contract (100 TB): od_matrix is two id-keyed hash joins (edges
against the narrow (id, cell) projection — endpoint payloads never
move) and one cells^2-bounded aggregation; gravity_fit's exchange is
16 numbers regardless of input size.  Both are pure Catalyst except
the driver-side 4x4 solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xarray_spatial_spark.grid import tile_x_col, tile_y_col
from xarray_spatial_spark.functions.geo import great_circle_dist


def _tile_center_lon(x, zoom: int):
    n = 1 << zoom
    return (x + 0.5) / F.lit(float(n)) * 360.0 - 180.0


def _tile_center_lat(y, zoom: int):
    import math

    n = 1 << zoom
    t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (y + 0.5) / F.lit(float(n)))
    return F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))


def od_matrix(
    edges: DataFrame,
    locations: DataFrame,
    zoom: int,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Origin-destination flows between web-mercator cells:
    (src_x, src_y, dst_x, dst_y, flow, dist_m).  ``dist_m`` is the
    haversine distance between cell centers (meters); intra-cell
    flows get distance 0."""
    loc = locations.select(
        F.col(id_col).alias("_id"),
        tile_x_col(F.col(lon_col), zoom).alias("_x"),
        tile_y_col(F.col(lat_col), zoom).alias("_y"),
    )
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .join(loc.withColumnRenamed("_id", "_src")
                 .withColumnRenamed("_x", "src_x")
                 .withColumnRenamed("_y", "src_y"), "_src")
        .join(loc.withColumnRenamed("_id", "_dst")
                 .withColumnRenamed("_x", "dst_x")
                 .withColumnRenamed("_y", "dst_y"), "_dst")
    )
    od = (
        e.groupBy("src_x", "src_y", "dst_x", "dst_y")
        .agg(F.count(F.lit(1)).alias("flow"))
    )
    return od.withColumn(
        "dist_m",
        great_circle_dist(
            _tile_center_lon(F.col("src_x"), zoom),
            _tile_center_lon(F.col("dst_x"), zoom),
            _tile_center_lat(F.col("src_y"), zoom),
            _tile_center_lat(F.col("dst_y"), zoom),
        ),
    )


def gravity_fit(od: DataFrame, min_dist_m: float = 1.0) -> dict:
    """Exact OLS fit of the log gravity model on an od_matrix frame.

    Masses are the marginals (O_i = total outflow of the origin cell,
    D_j = total inflow of the destination cell); rows with distance
    below ``min_dist_m`` (intra-cell) are excluded, matching standard
    practice since ln 0 is undefined.  Returns ``{intercept,
    ln_origin, ln_dest, ln_dist, r2, n}`` — ``-ln_dist`` is the
    distance-decay exponent."""
    import numpy as np

    o = od.groupBy("src_x", "src_y").agg(F.sum("flow").alias("o_mass"))
    d = od.groupBy("dst_x", "dst_y").agg(F.sum("flow").alias("d_mass"))
    rows = (
        od.where(F.col("dist_m") >= min_dist_m)
        .join(o, ["src_x", "src_y"])
        .join(d, ["dst_x", "dst_y"])
        .select(
            F.log(F.col("flow").cast("double")).alias("y"),
            F.log(F.col("o_mass").cast("double")).alias("f1"),
            F.log(F.col("d_mass").cast("double")).alias("f2"),
            F.log(F.col("dist_m")).alias("f3"),
        )
    )
    # ONE aggregation: the 4x4 normal equations' sufficient statistics.
    feats = [F.lit(1.0), F.col("f1"), F.col("f2"), F.col("f3")]
    aggs = []
    for i in range(4):
        for j in range(i, 4):
            aggs.append(F.sum(feats[i] * feats[j]).alias(f"xx_{i}{j}"))
        aggs.append(F.sum(feats[i] * F.col("y")).alias(f"xy_{i}"))
    aggs += [F.sum(F.col("y") * F.col("y")).alias("yy"),
             F.count(F.lit(1)).alias("n")]
    s = rows.agg(*aggs).collect()[0]
    n = s["n"]
    if n < 5:
        raise ValueError(f"gravity_fit needs >= 5 off-diagonal flows, got {n}")
    xtx = np.empty((4, 4))
    xty = np.empty(4)
    for i in range(4):
        for j in range(i, 4):
            xtx[i, j] = xtx[j, i] = s[f"xx_{i}{j}"]
        xty[i] = s[f"xy_{i}"]
    beta = np.linalg.solve(xtx, xty)
    # R^2 from the same statistics: SSE = y'y - 2 b'X'y + b'X'X b
    sse = s["yy"] - 2 * beta @ xty + beta @ xtx @ beta
    sst = s["yy"] - s["xy_0"] ** 2 / n  # y'y - n*ybar^2
    r2 = float(1.0 - sse / sst) if sst > 0 else float("nan")
    return {
        "intercept": float(beta[0]), "ln_origin": float(beta[1]),
        "ln_dest": float(beta[2]), "ln_dist": float(beta[3]),
        "r2": r2, "n": int(n),
    }
