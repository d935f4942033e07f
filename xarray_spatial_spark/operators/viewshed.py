"""Viewshed — visibility grid from one observer.

Reference: xrspatial/viewshed.py (GRASS r.viewshed-style plane sweep
with an RB-tree status structure, :93-1502; angle convention
:1251-1273 — the returned value is the vertical angle with 0 directly
ABOVE the observer, 90 horizontal, 180 at the viewpoint cell/below;
invisible cells get -1).

The reference's sweep is inherently sequential per observer (its dask
path rechunks to a single block).  The Spark re-plan keeps the terrain
as a broadcast dense array — the same O(raster) memory the sweep
needs — and distributes the *targets*: every Arrow batch of cells
tests its line-of-sight against the broadcast terrain, vectorized over
the batch with one numpy step loop along the dominant axis (the R3
algorithm: linear interpolation of the terrain at each integer
crossing).  R3 and the event-sweep agree everywhere except
sub-cell interpolation corner cases; the reference's own tests assert
structural invariants (symmetry, monotone visibility), all of which
R3 satisfies.

Scale: one observer on a 10^8-cell raster = 10^8 LOS tests, each
O(ray length); the batch loop does ~max(H, W) vectorized steps per
partition.  Many-observer workloads parallelize over observers too.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INVISIBLE = -1.0


def _vertical_angle(diff: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """Reference _get_vertical_ang (viewshed.py:1256-1273):
    0 above, 90 horizontal, 180 below (dist = horizontal distance)."""
    out = np.full(diff.shape, 90.0)
    up = diff > 0
    down = diff < 0
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(up, np.degrees(np.arctan(dist / np.where(up, diff, 1.0))), out)
        out = np.where(
            down, np.degrees(np.arctan(np.abs(diff) / np.maximum(dist, 1e-300))) + 90.0,
            out,
        )
    return out


def viewshed(
    raster: DataFrame,
    x: int,
    y: int,
    observer_elev: float = 2.0,
    target_elev: float = 0.0,
    value_col: str = "value",
    out_col: str = "visibility",
    shape: tuple[int, int] | None = None,
    dense_targets: bool = False,
    timings: dict | None = None,
) -> DataFrame:
    """Visibility of every cell from observer at pixel (y, x).
    Output adds ``out_col``: vertical angle for visible cells,
    -1 invisible, 180 at the viewpoint (viewshed.py:1173).

    ``shape`` (H, W), when the caller knows it (e.g. from parquet
    footer metadata, :func:`sources.parquet_row_count`), skips the
    extent-probe aggregation job inside ``collect_dense`` — the size
    cap still fires on the declared shape.

    ``dense_targets`` (caller asserts every cell of ``shape`` has a
    row, origin 0): target cells are ENUMERATED with ``spark.range``
    and elevations read from the already-broadcast terrain, so the
    LOS job re-reads nothing and splits perfectly with no exchange —
    the source scan already happened once inside ``collect_dense``,
    and re-scanning it per target batch bought nothing (sf0.1 driver
    record: 1.87 s -> the scan-free plan; the default path keeps the
    exact row-passthrough semantics for sparse rasters, where absent
    cells must stay absent from the output).

    ``timings``, when given, receives driver-side phase wall times
    (``collect_dense``, ``broadcast``) so bench records can show
    where a run's time went (the LOS job itself is the remainder)."""
    import time as _time

    from xarray_spatial_spark.raster import collect_dense

    spark = raster.sparkSession
    # packed distributed collect with a hard size cap — never a
    # per-row toPandas of the raster (the R3 algorithm needs the dense
    # terrain on every executor; the broadcast is inherent, the driver
    # row materialization was not)
    t0 = _time.time()
    z = collect_dense(raster, value_col, shape=shape)
    if timings is not None:
        timings["collect_dense"] = round(_time.time() - t0, 3)
    H, W = z.shape
    if not (0 <= y < H and 0 <= x < W):
        raise ValueError("observer location outside the raster")
    vp_elev = float(z[y, x]) + observer_elev
    t0 = _time.time()
    bc = spark.sparkContext.broadcast(z)
    if timings is not None:
        timings["broadcast"] = round(_time.time() - t0, 3)
    oy, ox = int(y), int(x)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in raster.schema)
    schema += f", {out_col} double"

    # LOS tests parallelize over TARGET cells.  Dense path: enumerate
    # targets (~8k cells/task keeps every core busy with no exchange).
    # Row path: a compact raster read can arrive as one file split ->
    # one task pinning the whole sweep to a single core; fan out only
    # when there is real kernel work to split (~100k cells/task) —
    # below that the round-robin shuffle costs more than the
    # single-task sweep.  The cell count comes from the collected
    # shape, so the row path's partition probe (a DataFrame->RDD
    # conversion, not free) only runs when a repartition could help.
    par = spark.sparkContext.defaultParallelism
    if dense_targets:
        if set(raster.columns) != {"y", "x", value_col}:
            raise ValueError(
                "dense_targets requires a bare (y, x, value) raster — "
                "extra columns cannot be re-synthesized from the "
                f"broadcast terrain: {raster.columns}"
            )
        # ~8k rays/task — the measured optimum on this box
        # (interleaved A/B at 100k cells: 8k/task 1.19 s vs 1k/task
        # 2.10 s vs single-task 1.70 s): smaller tasks are dominated
        # by Spark task + python-worker roundtrips, larger ones leave
        # cores idle during the early wide steps.
        n = H * W
        want = min(par, max(1, n // 8_000))
        raster = spark.range(0, n, numPartitions=want).select(
            (F.col("id") / W).cast("int").alias("y"),
            F.pmod(F.col("id"), F.lit(W)).cast("int").alias("x"),
        )
    else:
        want = min(par, max(1, (H * W) // 100_000))
        if want > 1 and raster.rdd.getNumPartitions() < want:
            raster = raster.repartition(want)

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        terrain = bc.value
        for b in batches:
            ty = b["y"].to_numpy(np.int64)
            tx = b["x"].to_numpy(np.int64)
            tz = terrain[ty, tx]
            dy = ty - oy
            dx = tx - ox
            dist = np.sqrt((dx.astype(float)) ** 2 + (dy.astype(float)) ** 2)
            n_steps = np.maximum(np.abs(dy), np.abs(dx))
            tgt_grad = np.where(
                dist > 0, (tz + target_elev - vp_elev) / np.maximum(dist, 1e-300), np.inf
            )
            visible = np.ones(len(b), dtype=bool)
            visible &= ~np.isnan(tz)
            max_k = int(n_steps.max()) if len(n_steps) else 0
            # step along the dominant axis; linear interp on the other
            fy = np.where(n_steps > 0, dy / np.maximum(n_steps, 1), 0.0)
            fx = np.where(n_steps > 0, dx / np.maximum(n_steps, 1), 0.0)
            # Hybrid stepping (per-element IEEE expressions identical
            # in both phases, so the visible set is bit-equal to a
            # pure scalar loop — the viewshed_vis oracle depends on
            # that):
            #   phase 1 — one vectorized step per k while the active
            #   set is LARGE: re-filtering every step exploits early
            #   termination (most rays block within their first
            #   steps), and the python-loop overhead is noise next to
            #   the wide array ops.
            #   phase 2 — once few rays survive, step in WIDE chunks:
            #   the remaining cost is per-iteration python overhead
            #   (tiny arrays, huge max_k), which chunking amortizes;
            #   dead-lane overshoot is cheap there because the active
            #   set is already small.
            # Round 2 chunked from k=1 with exponential growth, which
            # dragged blocked lanes through up to 256 extra columns
            # while the active set was still huge — 1.5-4x slower on
            # noise terrain (BENCH_r02 viewshed 1.17 -> 2.08 s);
            # measured crossover favors scalar until ~2k active rays.
            TAIL_ACT = 2048
            TAIL_CHUNK = 1024
            k = 1
            while k < max_k:
                act = visible & (n_steps > k)
                n_act = int(np.count_nonzero(act))
                if n_act == 0:
                    break
                scalar_step = n_act > TAIL_ACT
                if scalar_step:
                    ks = np.float64(k)          # shape (): broadcasts 1-D
                    afy, afx = fy[act], fx[act]
                    k += 1
                else:
                    ks = np.arange(k, min(k + TAIL_CHUNK, max_k),
                                   dtype=np.int64)[None, :]
                    afy, afx = fy[act, None], fx[act, None]
                    k += TAIL_CHUNK
                py = oy + afy * ks
                px = ox + afx * ks
                y0 = np.floor(py).astype(int)
                x0 = np.floor(px).astype(int)
                wy = py - y0
                wx = px - x0
                # dead lanes (k >= n_steps, masked below) walk past
                # the target and off the raster — clamp their
                # indices; live lanes are in-bounds by construction so
                # the clip never changes a contributing value
                y0 = np.clip(y0, 0, terrain.shape[0] - 1)
                x0 = np.clip(x0, 0, terrain.shape[1] - 1)
                y1 = np.minimum(y0 + 1, terrain.shape[0] - 1)
                x1 = np.minimum(x0 + 1, terrain.shape[1] - 1)
                # bilinear interpolation of the terrain at the crossing
                zs = (
                    terrain[y0, x0] * (1 - wy) * (1 - wx)
                    + terrain[y0, x1] * (1 - wy) * wx
                    + terrain[y1, x0] * wy * (1 - wx)
                    + terrain[y1, x1] * wy * wx
                )
                ds = np.sqrt((afy * ks) ** 2 + (afx * ks) ** 2)
                grad = (zs - vp_elev) / np.maximum(ds, 1e-300)
                blocked = grad > (tgt_grad[act] if scalar_step
                                  else tgt_grad[act, None])
                blocked |= np.isnan(zs)         # NODATA blocks the ray
                if not scalar_step:
                    blocked &= ks < n_steps[act, None]
                    blocked = blocked.any(axis=1)
                idx = np.flatnonzero(act)[blocked]
                visible[idx] = False
            ang = _vertical_angle(tz + target_elev - vp_elev, dist)
            out = np.where(visible, ang, INVISIBLE)
            at_vp = (ty == oy) & (tx == ox)
            out = np.where(at_vp, 180.0, out)
            if value_col not in b.columns:  # dense-target batches
                b = b.assign(**{value_col: tz})
            yield b.assign(**{out_col: out})

    return raster.mapInPandas(_op, schema=schema)
