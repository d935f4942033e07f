"""Raster -> vector polygonize (reference
xrspatial/experimental/polygonize.py:1-27 algorithm, :524-613 public).

Distributed plan (SURVEY §7 deferred tier):

1. label connected regions (operators/regions.py — already 2 shuffles),
2. per-tile boundary-edge extraction: every unit cell edge whose two
   sides carry different region labels (or raster boundary) is emitted
   as a directed segment in corner coordinates, interior-on-the-left
   (one halo pass, vectorized),
3. groupBy(region).applyInPandas ring assembly: walk the directed
   edges corner-to-corner until closed; the ring with the largest
   |area| is the exterior, the rest are holes (grouped with their
   exterior, like the reference).

Edge counts are O(region perimeter), so the per-region group is tiny
relative to region area; ring walking is dict-chasing in Python but
only over perimeter points.

Output: one row per region —
  (region, value, n_rings, exterior: array<array<double>> [x, y
  corner pairs], area: double)   with grid corner coordinates
  (cell (y, x) spans corners (x, y)..(x+1, y+1)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_spatial_spark.operators.halo import with_halo
from xarray_spatial_spark.operators.regions import regions


def _edge_extract(conn_df: DataFrame, tile_h: int, tile_w: int) -> DataFrame:
    """Directed boundary segments per region (interior on the left):
    for each cell, any of its 4 sides facing a different label emits
    one segment in corner coordinates."""
    haloed = with_halo(conn_df.select("y", "x", "region"), 1, tile_h, tile_w)

    def _op(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        H, W = tile_h + 2, tile_w + 2
        lab = np.full((H, W), np.nan)
        py = pdf["y"].to_numpy(np.int64) - (ty * tile_h - 1)
        px = pdf["x"].to_numpy(np.int64) - (tx * tile_w - 1)
        lab[py, px] = pdf["region"].to_numpy(np.float64)
        interior = np.zeros((H, W), dtype=bool)
        own = pdf["_halo"].to_numpy() == 0
        interior[py[own], px[own]] = True

        ys = pdf["y"].to_numpy(np.int64)[own]
        xs = pdf["x"].to_numpy(np.int64)[own]
        cy = py[own]
        cx = px[own]
        lc = lab[cy, cx]
        segs = {"region": [], "x1": [], "y1": [], "x2": [], "y2": []}

        def diff(ny, nx):
            nv = lab[ny, nx]
            return np.isnan(nv) | (nv != lc)

        # N side (y): left->right looking from inside below? directed so
        # interior is on the LEFT walking the segment
        m = diff(cy - 1, cx)
        segs["region"].append(lc[m]); segs["x1"].append(xs[m] + 1); segs["y1"].append(ys[m])
        segs["x2"].append(xs[m]); segs["y2"].append(ys[m])
        # S side
        m = diff(cy + 1, cx)
        segs["region"].append(lc[m]); segs["x1"].append(xs[m]); segs["y1"].append(ys[m] + 1)
        segs["x2"].append(xs[m] + 1); segs["y2"].append(ys[m] + 1)
        # W side
        m = diff(cy, cx - 1)
        segs["region"].append(lc[m]); segs["x1"].append(xs[m]); segs["y1"].append(ys[m])
        segs["x2"].append(xs[m]); segs["y2"].append(ys[m] + 1)
        # E side
        m = diff(cy, cx + 1)
        segs["region"].append(lc[m]); segs["x1"].append(xs[m] + 1); segs["y1"].append(ys[m] + 1)
        segs["x2"].append(xs[m] + 1); segs["y2"].append(ys[m])

        return pd.DataFrame(
            {
                "region": np.concatenate(segs["region"]).astype(np.int64),
                "x1": np.concatenate(segs["x1"]).astype(np.int64),
                "y1": np.concatenate(segs["y1"]).astype(np.int64),
                "x2": np.concatenate(segs["x2"]).astype(np.int64),
                "y2": np.concatenate(segs["y2"]).astype(np.int64),
            }
        )

    return haloed.groupBy("_ty", "_tx").applyInPandas(
        _op, schema="region long, x1 long, y1 long, x2 long, y2 long"
    )


def _assemble_one(region: int, pdf: pd.DataFrame) -> dict:
    """Walk directed segments corner-to-corner into closed rings."""
    # successor map: corner -> list of outgoing segments
    succ: dict = {}
    for x1, y1, x2, y2 in zip(pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"]):
        succ.setdefault((int(x1), int(y1)), []).append((int(x2), int(y2)))
    rings = []
    while succ:
        start = next(iter(succ))
        ring = [start]
        cur = start
        while True:
            outs = succ.get(cur)
            if not outs:
                break
            nxt = outs.pop()
            if not outs:
                del succ[cur]
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        rings.append(ring)
    # signed shoelace area per ring; exterior = max |area|
    def area(r):
        a = 0.0
        for (x1, y1), (x2, y2) in zip(r, r[1:]):
            a += x1 * y2 - x2 * y1
        return a / 2.0

    areas = [area(r) for r in rings]
    if rings:
        ext = int(np.argmax(np.abs(areas)))
        exterior = rings[ext]
        total_area = float(sum(areas))
    else:
        exterior = []
        total_area = 0.0
    return {
        "region": region,
        "n_rings": len(rings),
        "exterior": [[float(x), float(y)] for x, y in exterior],
        "area": abs(total_area),
    }


def _assemble_partition(batches):
    """Partition-level assembly — one Python pass over the whole
    partition instead of per-group applyInPandas (regions are numerous
    and tiny; groups-per-task overhead dominated the runtime).

    The partition's Arrow batches are concatenated BEFORE grouping: a
    region's edges may straddle a 64k-row batch boundary, and a split
    region would otherwise be assembled twice.  Edge rows are
    perimeter-scale, so a whole partition fits comfortably."""
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    out = []
    for region, grp in pdf.groupby("region", sort=False):
        out.append(_assemble_one(int(region), grp))
    yield pd.DataFrame(out)


def polygonize(
    raster: DataFrame,
    neighborhood: int = 4,
    value_col: str = "value",
    tile_h: int = 256,
    tile_w: int = 256,
) -> DataFrame:
    """Vectorize connected equal-valued regions.  Returns one row per
    region: (region, value, n_rings, exterior ring corners, area)."""
    # regions() output feeds both the edge extraction and the value
    # lookup join — persist across the two consumers
    labeled = regions(
        raster, neighborhood=neighborhood, value_col=value_col,
        tile_h=tile_h, tile_w=tile_w,
    ).persist()
    edges = _edge_extract(labeled, tile_h, tile_w)
    polys = edges.repartition("region").mapInPandas(
        _assemble_partition,
        schema="region long, n_rings int, exterior array<array<double>>, area double",
    )
    vals = labeled.groupBy(F.col("region").cast("long").alias("region")).agg(
        F.first(value_col).alias(value_col)
    )
    return polys.join(vals, "region")
