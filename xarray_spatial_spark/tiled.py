"""Dense-tile raster format — the scale representation for stencils.

The long-form raster (one row per cell) is the engine's interchange /
test format; at 100-TB scale a stencil over it shuffles ~33 bytes per
cell plus per-row Arrow overhead.  This module stores a raster as one
row per TILE:

    (ty long, tx long, h int, w int, th int, tw int, <band> binary ...)

where each band is the row-major float64 bytes of the (h, w) block
(NaN = nodata, mirroring the reference's ``boundary=np.nan`` dask
map_overlap pad, xrspatial/focal.py:70-76).  Tiles are full
``tile_h x tile_w`` except the raster's bottom/right edges, which are
clipped, so the raster extent is implicit in the tile set.

A stencil pass over tiled data is ONE shuffle of ~1.02x the raster
bytes (full tile to itself + radius-wide border strips to the 8
neighbors), and every per-cell cost is a vectorized numpy slice —
no per-cell rows, no pandas scatter.  This is the Spark re-plan of
dask ``map_overlap`` boundary exchange at ~8 bytes/cell instead of
~33, and is what makes slope/focal match the reference's numba
per-core throughput (reference benchmarks/results.md anchors).

``operators.halo.apply_stencil`` dispatches here automatically when
its input carries the tiled schema, so every stencil operator
(slope/aspect/curvature/hillshade/focal/convolve/hotspots) runs on
either format with identical kernels and identical results
(tests/test_tiled.py asserts long==tiled equivalence per op).
"""

from __future__ import annotations

import warnings
from collections.abc import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TILE = 512

TILE_KEY_COLS = ("ty", "tx", "h", "w", "th", "tw")

StencilFn = Callable[[dict[str, np.ndarray]], dict[str, np.ndarray]]


def is_tiled(df: DataFrame) -> bool:
    return set(TILE_KEY_COLS).issubset(set(df.columns))


_DTYPES = {8: np.float64, 4: np.float32}


def _decode(buf: bytes, h: int, w: int) -> np.ndarray:
    """Blob -> (h, w) array; dtype inferred from the byte length, so
    float32 and float64 rasters share one format (float32 halves scan,
    shuffle, and Arrow bytes; the reference's surface kernels compute
    in float32 anyway, xrspatial/slope.py:58)."""
    isz = len(buf) // (h * w) if h * w else 8
    return np.frombuffer(buf, dtype=_DTYPES[isz]).reshape(h, w)


EDGE = 8  # columns kept in the transposed edge blobs (supports radius <= 8
           # in the all-JVM strip path; larger radii use the Python fallback)


def tiled_schema(bands: Sequence[str]) -> str:
    """Canonical tiled schema: per band, the dense block plus four
    small perimeter blobs (~6%% of tile bytes at 512px): TRANSPOSED
    leftmost/rightmost ``EDGE`` columns (``__le``/``__re``) and plain
    top/bottom ``EDGE`` rows (``__te``/``__be``).  The transposed edge
    blobs make every halo strip — vertical ones and corners included —
    a plain contiguous ``substring`` in whole-stage codegen (column
    extraction from row-major bytes would need per-element
    higher-order functions, which fall out of codegen and copy
    catastrophically); the row blobs let the broadcast-halo strip
    projection scan perimeter bytes only, never the block column."""
    cols = ["ty long", "tx long", "h int", "w int", "th int", "tw int"]
    for b in bands:
        cols += [f"{b} binary"] + [f"{b}{sfx} binary" for sfx in BLOB_SUFFIXES]
    return ", ".join(cols)


def _edge_blobs(a: np.ndarray) -> tuple[bytes, bytes]:
    """(h, w) block -> transposed left/right edge blobs, each
    (min(EDGE, w), h) row-major."""
    e = min(EDGE, a.shape[1])
    le = np.ascontiguousarray(a[:, :e].T).tobytes()
    re = np.ascontiguousarray(a[:, a.shape[1] - e:].T).tobytes()
    return le, re


BLOB_SUFFIXES = ("__le", "__re", "__te", "__be")


def _halo_blobs(a: np.ndarray) -> dict[str, bytes]:
    """All four perimeter blobs for one block: transposed left/right
    EDGE columns plus plain top/bottom EDGE rows (row-major, already
    contiguous).  Stored top/bottom rows let the broadcast-halo strip
    projection scan ONLY blob columns — no block-column read — so the
    strips job costs perimeter, not area."""
    le, re = _edge_blobs(a)
    e = min(EDGE, a.shape[0])
    te = np.ascontiguousarray(a[:e, :]).tobytes()
    be = np.ascontiguousarray(a[a.shape[0] - e:, :]).tobytes()
    return {"__le": le, "__re": re, "__te": te, "__be": be}


# ---------------------------------------------------------------------------
# long-form <-> tiled conversion
# ---------------------------------------------------------------------------

def tile(
    df: DataFrame,
    tile_h: int = DEFAULT_TILE,
    tile_w: int = DEFAULT_TILE,
    value_cols: Sequence[str] = ("value",),
    shape: tuple[int, int] | None = None,
    dtype=np.float64,
) -> DataFrame:
    """Long-form (y, x, bands...) -> tiled.  One shuffle keyed by tile.
    ``shape`` clips edge tiles; when None it is computed with one tiny
    agg job (max y/x).  ``dtype=np.float32`` halves every downstream
    byte (stored, shuffled, Arrow-crossed) at float32 precision."""
    if shape is None:
        row = df.agg(F.max("y").alias("my"), F.max("x").alias("mx")).collect()[0]
        shape = (int(row["my"]) + 1, int(row["mx"]) + 1)
    H, W = shape
    bands = list(value_cols)

    def _pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h = min(tile_h, H - ty * tile_h)
        w = min(tile_w, W - tx * tile_w)
        py = pdf["y"].to_numpy(np.int64) - ty * tile_h
        px = pdf["x"].to_numpy(np.int64) - tx * tile_w
        out = {"ty": [ty], "tx": [tx], "h": [h], "w": [w],
               "th": [tile_h], "tw": [tile_w]}
        for b in bands:
            a = np.full((h, w), np.nan, dtype=dtype)
            a[py, px] = pdf[b].to_numpy(np.float64)
            out[b] = [a.tobytes()]
            for sfx, blob in _halo_blobs(a).items():
                out[f"{b}{sfx}"] = [blob]
        return pd.DataFrame(out)

    keyed = df.withColumn("_ty", F.floor(F.col("y") / tile_h).cast("long")).withColumn(
        "_tx", F.floor(F.col("x") / tile_w).cast("long")
    )
    return keyed.groupBy("_ty", "_tx").applyInPandas(
        _pack, schema=tiled_schema(bands)
    )


def untile(
    tdf: DataFrame,
    value_cols: Sequence[str] = ("value",),
    drop_nan: bool = False,
) -> DataFrame:
    """Tiled -> long-form (y, x, bands...).  Map-side only (no
    shuffle).  NaN cells become NULL; ``drop_nan`` omits them."""
    bands = list(value_cols)
    schema = "y int, x int, " + ", ".join(f"{b} double" for b in bands)

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                h, w = int(r.h), int(r.w)
                yy = np.repeat(
                    np.arange(h, dtype=np.int64) + int(r.ty) * int(r.th), w
                )
                xx = np.tile(
                    np.arange(w, dtype=np.int64) + int(r.tx) * int(r.tw), h
                )
                data = {b: _decode(getattr(r, b), h, w).ravel() for b in bands}
                if drop_nan:
                    keep = np.zeros(h * w, dtype=bool)
                    for b in bands:
                        keep |= ~np.isnan(data[b])
                    yy, xx = yy[keep], xx[keep]
                    data = {b: v[keep] for b, v in data.items()}
                out = pd.DataFrame(
                    {"y": yy.astype(np.int32), "x": xx.astype(np.int32)}
                )
                for b in bands:
                    out[b] = pd.Series(data[b]).where(np.isfinite(data[b]))
                yield out

    return tdf.mapInPandas(_unpack, schema=schema)


# ---------------------------------------------------------------------------
# halo-stencil over tiles
# ---------------------------------------------------------------------------

MSG_FIELDS = ("ty", "tx", "gy0", "gx0", "sh", "sw", "iscenter",
              "transposed", "th", "tw")


def _jvm_messages(tdf: DataFrame, r: int, bands: Sequence[str]) -> DataFrame:
    """All 9 halo messages per tile as ONE select/explode of plain
    substring/concat expressions — zero Python, zero higher-order
    functions, stays in whole-stage codegen.

    dx == 0 strips slice the row-major block directly (contiguous
    rows).  dx != 0 strips (vertical edges + corners) slice the
    transposed edge blobs, and arrive transposed=1 ((sw, sh)
    row-major); ``r`` is a plan-time int so the per-column concat
    unrolls to <= EDGE substrings."""
    h, w = F.col("h"), F.col("w")
    th, tw = F.col("th"), F.col("tw")
    ty, tx = F.col("ty"), F.col("tx")
    structs = []
    for dy in (-1, 0, 1):
        if dy == -1:
            rlo, sh = F.lit(0), F.least(F.lit(r), h)
        elif dy == 0:
            rlo, sh = F.lit(0), h
        else:
            rlo = F.greatest(th - r, F.lit(0))
            sh = h - rlo
        for dx in (-1, 0, 1):
            if dx == -1:
                clo, sw = F.lit(0), F.least(F.lit(r), w)
            elif dx == 0:
                clo, sw = F.lit(0), w
            else:
                clo = F.greatest(tw - r, F.lit(0))
                sw = w - clo
            valid = (sh > 0) & (sw > 0) & (ty + dy >= 0) & (tx + dx >= 0)
            fields = [
                (ty + dy).cast("long").alias("ty"),
                (tx + dx).cast("long").alias("tx"),
                (ty * th + rlo).cast("long").alias("gy0"),
                (tx * tw + clo).cast("long").alias("gx0"),
                sh.cast("int").alias("sh"),
                sw.cast("int").alias("sw"),
                F.lit(1 if dy == 0 and dx == 0 else 0).alias("iscenter"),
                F.lit(0 if dx == 0 else 1).alias("transposed"),
                th.cast("int").alias("th"),
                tw.cast("int").alias("tw"),
            ]
            for b in bands:
                data = F.col(b)
                # bytes per cell, from blob length (float32 or float64)
                isz = (F.length(data) / (h * w)).cast("long")
                if dy == 0 and dx == 0:
                    strip = data  # full tile: zero-copy column reference
                elif dx == 0:
                    # contiguous row band from the row-major block
                    strip = data.substr(
                        (rlo * w * isz + 1).cast("int"),
                        (sh * w * isz).cast("int"),
                    )
                else:
                    # from the transposed edge blob: blob row j = source
                    # column (j for __le; w-e+j for __re), each a
                    # contiguous h-run; slice rows [rlo, rlo+sh) of up
                    # to r columns and concat (r is a Python int ->
                    # unrolled, no HOF)
                    blob = F.col(f"{b}__le" if dx == -1 else f"{b}__re")
                    e = F.least(F.lit(EDGE), w)  # blob row count
                    parts = []
                    for k in range(r):
                        # k-th needed column, as a blob row index
                        j = F.lit(k) if dx == -1 else (e - sw + k)
                        part = blob.substr(
                            ((j * h + rlo) * isz + 1).cast("int"),
                            (sh * isz).cast("int"),
                        )
                        # only the first `sw` columns exist (w < r case)
                        parts.append(F.when(F.lit(k) < sw, part)
                                     .otherwise(F.lit(b"")))
                    strip = parts[0] if len(parts) == 1 else F.concat(*parts)
                fields.append(strip.alias(b))
            structs.append(F.when(valid, F.struct(*fields)).otherwise(F.lit(None)))
    return (
        tdf.select(F.explode(F.array(*structs)).alias("_m"))
        .filter(F.col("_m").isNotNull())
        .select("_m.*")
    )


def _python_messages(tdf: DataFrame, r: int, bands: Sequence[str]) -> DataFrame:
    """Fallback message emitter for radius > EDGE (or inputs without
    edge blobs): decodes each tile in Python and emits all 9 messages.
    One extra JVM->Python crossing of the raster; correct for any
    radius <= tile size."""
    msg_schema = (
        "ty long, tx long, gy0 long, gx0 long, sh int, sw int, "
        "iscenter int, transposed int, th int, tw int, "
        + ", ".join(f"{b} binary" for b in bands)
    )

    def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in MSG_FIELDS}
            for b in bands:
                rows[b] = []
            for rec in pdf.itertuples(index=False):
                ty, tx = int(rec.ty), int(rec.tx)
                h, w = int(rec.h), int(rec.w)
                th, tw = int(rec.th), int(rec.tw)
                gy, gx = ty * th, tx * tw
                arrs = {b: _decode(getattr(rec, b), h, w) for b in bands}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        dty, dtx = ty + dy, tx + dx
                        if dty < 0 or dtx < 0:
                            continue
                        rlo = max(0, (dty * th - r) - gy)
                        rhi = min(h, (dty * th + th + r) - gy)
                        clo = max(0, (dtx * tw - r) - gx)
                        chi = min(w, (dtx * tw + tw + r) - gx)
                        if rlo >= rhi or clo >= chi:
                            continue
                        center = dy == 0 and dx == 0
                        rows["ty"].append(dty)
                        rows["tx"].append(dtx)
                        rows["gy0"].append(gy + rlo)
                        rows["gx0"].append(gx + clo)
                        rows["sh"].append(rhi - rlo)
                        rows["sw"].append(chi - clo)
                        rows["iscenter"].append(1 if center else 0)
                        rows["transposed"].append(0)
                        rows["th"].append(th)
                        rows["tw"].append(tw)
                        for b in bands:
                            rows[b].append(
                                getattr(rec, b) if center
                                else arrs[b][rlo:rhi, clo:chi].tobytes()
                            )
            yield pd.DataFrame(rows)

    return tdf.mapInPandas(_emit, schema=msg_schema)


_PD_TYPES = {"long": np.int64, "int": np.int32, "double": np.float64,
             "binary": object, "string": object}


def _empty_frame(schema: str) -> pd.DataFrame:
    cols = {}
    for part in schema.split(", "):
        name, typ = part.rsplit(" ", 1)
        cols[name] = pd.Series(dtype=_PD_TYPES.get(typ, object))
    return pd.DataFrame(cols)


def _strip_rows(tdf: DataFrame, r: int, bands: Sequence[str]) -> DataFrame:
    """Narrow JVM projection of each tile's four halo strips — top /
    bottom row bands sliced from the block, left / right column bands
    sliced from the transposed edge blobs (all contiguous substrings,
    whole-stage codegen).  Per-tile bytes ~ 2r(h + w) * isz * n_bands
    = perimeter scale; this is what the broadcast halo path collects."""
    h, w = F.col("h"), F.col("w")
    have_tb = all(f"{b}__te" in tdf.columns for b in bands)
    cols = [F.col(c) for c in TILE_KEY_COLS]
    for b in bands:
        toph = F.least(F.lit(r), h)
        lc = F.least(F.lit(r), w)
        e = F.least(F.lit(EDGE), w)
        if have_tb:
            # stored top/bottom row blobs -> the projection touches NO
            # block column: the whole strips job scans perimeter bytes
            isz = (F.length(F.col(f"{b}__le"))
                   / (F.least(F.lit(EDGE), w) * h)).cast("long")
            et = F.least(F.lit(EDGE), h)
            top = F.col(f"{b}__te").substr(
                F.lit(1), (toph * w * isz).cast("int"))
            bot = F.col(f"{b}__be").substr(
                ((et - toph) * w * isz + 1).cast("int"),
                (toph * w * isz).cast("int"))
        else:
            block = F.col(b)
            isz = (F.length(block) / (h * w)).cast("long")
            top = block.substr(F.lit(1), (toph * w * isz).cast("int"))
            bot = block.substr(((h - toph) * w * isz + 1).cast("int"),
                               (toph * w * isz).cast("int"))
        cols += [
            top.alias(f"{b}__top"),
            bot.alias(f"{b}__bot"),
            F.col(f"{b}__le").substr(F.lit(1), (lc * h * isz).cast("int"))
            .alias(f"{b}__l"),
            F.col(f"{b}__re").substr(((e - lc) * h * isz + 1).cast("int"),
                                     (lc * h * isz).cast("int"))
            .alias(f"{b}__r"),
        ]
    return tdf.select(*cols)


# strip kind consulted per neighbor offset (dy, dx) during assembly:
# vertical neighbors (and diagonals) contribute row bands, horizontal
# neighbors contribute column bands; the generic overlap clip trims
# each full-length strip down to the halo (corners included).
_NBR_STRIP = {
    (-1, -1): "bot", (-1, 0): "bot", (-1, 1): "bot",
    (0, -1): "r", (0, 1): "l",
    (1, -1): "top", (1, 0): "top", (1, 1): "top",
}

_NBRS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _clip_place(pad, oy0, ox0, gy0, gx0, sh, sw, src) -> None:
    """Copy the overlap of a source rect (global origin gy0/gx0, shape
    sh/sw) into the padded array whose global origin is (oy0, ox0)."""
    H2, W2 = pad.shape
    oy, ox = gy0 - oy0, gx0 - ox0
    slo_y, slo_x = max(0, -oy), max(0, -ox)
    oy, ox = max(0, oy), max(0, ox)
    shi_y = min(sh, slo_y + H2 - oy)
    shi_x = min(sw, slo_x + W2 - ox)
    if shi_y <= slo_y or shi_x <= slo_x:
        return
    pad[oy:oy + shi_y - slo_y, ox:ox + shi_x - slo_x] = \
        src[slo_y:shi_y, slo_x:shi_x]


def _strip_entries(rec, bands, r) -> dict:
    """Strip-row record -> {band: {kind: (buf, gy0, gx0, sh, sw,
    transposed)}} with each strip's own global coords."""
    h, w = int(rec.h), int(rec.w)
    gy = int(rec.ty) * int(rec.th)
    gx = int(rec.tx) * int(rec.tw)
    toph, lc = min(r, h), min(r, w)
    out = {}
    for b in bands:
        out[b] = {
            "top": (getattr(rec, f"{b}__top"), gy, gx, toph, w, 0),
            "bot": (getattr(rec, f"{b}__bot"), gy + h - toph, gx, toph, w, 0),
            "l": (getattr(rec, f"{b}__l"), gy, gx, h, lc, 1),
            "r": (getattr(rec, f"{b}__r"), gy, gx + w - lc, h, lc, 1),
        }
    return out


# block key: tiles group into (block x block) super-tiles; the bucket
# halo strategy co-locates a whole super-tile per task, so only strips
# crossing a super-tile boundary ever shuffle
_BK = 1 << 20


def block_key_col(block: int):
    return (
        F.floor(F.col("ty") / block) * _BK + F.floor(F.col("tx") / block)
    ).cast("long")


def _bucket_block(tdf: DataFrame) -> int:
    """Resolve the super-tile block size for a bucketed raster: the
    ``bk`` column's schema metadata (attached by ``read_table`` from
    the stored table property — travels WITH the DataFrame, so two
    open tables with different blocks can't poison each other), else
    the session conf, else 4."""
    if "bk" in tdf.columns:
        meta = tdf.schema["bk"].metadata or {}
        if "block" in meta:
            return int(meta["block"])
    return int(tdf.sparkSession.conf.get("spark.xrspatial.halo.block", "4"))


def write_bucketed(
    tdf: DataFrame,
    name: str,
    buckets: int | None = None,
    block: int = 4,
    path: str | None = None,
) -> str:
    """Store a tiled raster as a BUCKETED table on the super-tile key:
    ``spark.table(name)`` then scans with a known HashPartitioning, so
    the bucket halo strategy's per-block cogroup needs NO exchange on
    the raster side — the 100-TB stencil plan (shuffle volume = the
    super-tile-boundary strips only).  Uncompressed parquet (float
    tiles are incompressible)."""
    spark = tdf.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    w = (
        tdf.withColumn("bk", block_key_col(block))
        .write.mode("overwrite").option("compression", "none")
        .bucketBy(buckets, "bk").sortBy("ty", "tx")
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    # the block size is part of the physical layout — carry it as a
    # table property so read_table can attach it to the bk column's
    # metadata and the bucket halo's group key matches the stored bk
    spark.sql(
        f"ALTER TABLE {name} SET TBLPROPERTIES ('xrspatial.halo.block' = '{block}')"
    )
    return name


def _block_strip_rows(
    tdf: DataFrame, r: int, bands: Sequence[str], block: int
) -> DataFrame:
    """Strips of tiles on a super-tile boundary, replicated to each
    NEIGHBOR super-tile that needs them (keyed ``bk``).  Interior
    tiles emit nothing, so the exchanged volume is the super-tile
    perimeter — 1/(block*tile) of raster bytes at r=1."""
    s = _strip_rows(tdf, r, bands)
    ty, tx = F.col("ty"), F.col("tx")
    own = F.floor(ty / block) * _BK + F.floor(tx / block)
    cand = F.array(*[
        F.when(
            (ty + dy >= 0) & (tx + dx >= 0),
            F.floor((ty + dy) / block) * _BK + F.floor((tx + dx) / block),
        )
        for dy, dx in _NBRS8
    ])
    dests = F.filter(
        F.array_distinct(cand), lambda d: d.isNotNull() & (d != own)
    )
    # fresh aliases (s_*) on every carried column: both cogroup sides
    # descend from the same scan, and Spark's self-join attribute
    # dedup otherwise prunes the strip side's tile-key columns away
    # before the pandas UDF sees them
    return s.select(
        F.explode(dests).alias("bk"),
        *[F.col(c).alias(f"s_{c}") for c in s.columns],
    )


def _halo_bucket(
    tdf: DataFrame,
    r: int,
    bands: list,
    reduce_fn,
    out_schema: str,
    block: int,
) -> DataFrame:
    """Co-partitioned halo exchange: ONE cogroup keyed by the
    super-tile block key.  Tiles interior to a block take their halos
    from sibling tiles in the same task; only block-boundary strips
    (perimeter-scale) shuffle.  Over a ``write_bucketed`` table the
    raster side plans with NO exchange at all; over any other tiled
    input it degrades to one raster shuffle (same cost as the shuffle
    strategy, same results)."""
    main = tdf if "bk" in tdf.columns else tdf.withColumn(
        "bk", block_key_col(block)
    )
    strips = _block_strip_rows(tdf, r, bands, block)

    def _check_block(key0: int, t: tuple) -> None:
        want = (t[0] // block) * _BK + t[1] // block
        if key0 != want:
            # a stored bk from write_bucketed(block=X) grouped the
            # raster side, but strips were keyed with the session's
            # block size — silent NaN halos otherwise
            raise ValueError(
                f"bucket halo block mismatch: tile {t} sits in "
                f"group {key0} but block="
                f"{block} expects {want}; set "
                "spark.xrspatial.halo.block to the write_bucketed "
                "block size"
            )

    def _asm_core(tiles: dict, meta: dict, sdict: dict) -> pd.DataFrame:
        outs = []
        for t, arrs in tiles.items():
            h, w, th, tw = meta[t]
            oy0, ox0 = t[0] * th - r, t[1] * tw - r
            padded = {}
            for b in bands:
                pad = np.full((h + 2 * r, w + 2 * r), np.nan,
                              dtype=arrs[b].dtype)
                pad[r:r + h, r:r + w] = arrs[b]
                padded[b] = pad
            for dy, dx in _NBRS8:
                nb = (t[0] + dy, t[1] + dx)
                if nb in tiles:
                    nh, nw, nth, ntw = meta[nb]
                    for b in bands:
                        _clip_place(padded[b], oy0, ox0,
                                    nb[0] * nth, nb[1] * ntw,
                                    nh, nw, tiles[nb][b])
                elif nb in sdict:
                    kind = _NBR_STRIP[(dy, dx)]
                    for b in bands:
                        buf, gy0, gx0, sh, sw, tr = sdict[nb][b][kind]
                        src = (_decode(buf, sw, sh).T if tr
                               else _decode(buf, sh, sw))
                        _clip_place(padded[b], oy0, ox0, gy0, gx0,
                                    sh, sw, src)
            m = {"ty": t[0], "tx": t[1], "h": h, "w": w, "th": th, "tw": tw}
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", category=RuntimeWarning)
                outs.append(reduce_fn(m, padded))
        return pd.concat(outs, ignore_index=True)

    def _strips_dict(strips_pdf: pd.DataFrame) -> dict:
        sp = strips_pdf.rename(
            columns={c: c[2:] for c in strips_pdf.columns
                     if c.startswith("s_")}
        )
        return {
            (int(rec.ty), int(rec.tx)): _strip_entries(rec, bands, r)
            for rec in sp.itertuples(index=False)
        }

    if _arrow_assemble_enabled(tdf.sparkSession):
        import pyarrow as pa

        target = _arrow_schema_of(out_schema)

        def _asm_arrow(key, main_tbl, strips_tbl):
            if main_tbl.num_rows == 0:
                return target.empty_table()
            key0 = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
            scal = {c: main_tbl.column(
                        main_tbl.schema.get_field_index(c)
                    ).to_numpy(zero_copy_only=False)
                    for c in ("ty", "tx", "h", "w", "th", "tw")}
            blob_cols = {b: main_tbl.column(
                             main_tbl.schema.get_field_index(b)
                         ).combine_chunks() for b in bands}
            tiles: dict = {}
            meta: dict = {}
            for i in range(main_tbl.num_rows):
                t = (int(scal["ty"][i]), int(scal["tx"][i]))
                _check_block(key0, t)
                h, w = int(scal["h"][i]), int(scal["w"][i])
                meta[t] = (h, w, int(scal["th"][i]), int(scal["tw"][i]))
                blocks = {}
                for b in bands:
                    buf = blob_cols[b][i].as_buffer()
                    isz = buf.size // (h * w) if h * w else 8
                    blocks[b] = np.frombuffer(
                        buf, dtype=_DTYPES[isz]).reshape(h, w)
                tiles[t] = blocks
            # strips are perimeter-scale: pandas conversion is cheap
            sdict = _strips_dict(strips_tbl.to_pandas())
            return pa.Table.from_arrays(
                _arrow_arrays(_asm_core(tiles, meta, sdict), target),
                schema=target,
            )

        return (
            main.groupBy("bk")
            .cogroup(strips.groupBy("bk"))
            .applyInArrow(_asm_arrow, schema=out_schema)
        )

    def _asm(key, main_pdf: pd.DataFrame, strips_pdf: pd.DataFrame):
        if len(main_pdf) == 0:
            return _empty_frame(out_schema)
        tiles: dict = {}
        meta: dict = {}
        for rec in main_pdf.itertuples(index=False):
            t = (int(rec.ty), int(rec.tx))
            _check_block(int(key[0]), t)
            h, w = int(rec.h), int(rec.w)
            meta[t] = (h, w, int(rec.th), int(rec.tw))
            tiles[t] = {b: _decode(getattr(rec, b), h, w) for b in bands}
        return _asm_core(tiles, meta, _strips_dict(strips_pdf))

    return (
        main.groupBy("bk")
        .cogroup(strips.groupBy("bk"))
        .applyInPandas(_asm, schema=out_schema)
    )


def _halo_broadcast(
    tdf: DataFrame,
    r: int,
    bands: list,
    reduce_fn,
    out_schema: str,
    max_bytes: int,
) -> DataFrame:
    """Shuffle-free halo exchange: ONE perimeter-scale collect of the
    strip projection -> broadcast -> mapInPandas assembles each padded
    block from its own row plus the 8 neighbors' broadcast strips.

    Trade vs the shuffle path: the input is SCANNED twice (strip
    projection + stencil pass) instead of shuffled once, and the strip
    volume must fit the driver/broadcast (4r(th+tw)/(th*tw) of raster
    bytes — ~0.8%% at r=1 512^2 f32, so a ~2 TB raster saturates a
    512 MB cap; beyond that the shuffle path is the plan).  Use it on
    STORED/cached tiled tables; on computed chains the double scan
    re-executes the upstream plan."""
    sdf = _strip_rows(tdf, r, bands)
    # size the strip volume BEFORE collecting — the cap must protect
    # the driver, not report an OOM after the fact (one tiny agg job
    # over the perimeter-scale projection)
    size_expr = None
    for b in bands:
        for sfx in ("__top", "__bot", "__l", "__r"):
            e = F.length(F.col(f"{b}{sfx}"))
            size_expr = e if size_expr is None else size_expr + e
    est = sdf.agg(F.sum(size_expr).alias("n")).collect()[0]["n"] or 0
    if est > max_bytes:
        raise ValueError(
            f"halo strips ({int(est) >> 20} MiB) exceed the broadcast cap "
            f"({max_bytes >> 20} MiB); use halo strategy 'shuffle'"
        )
    rows = sdf.collect()
    strips: dict = {}
    total = 0
    for rec in rows:
        ent = _strip_entries(rec, bands, r)
        for b in bands:
            total += sum(len(ent[b][k][0]) for k in ent[b])
        strips[(int(rec["ty"]), int(rec["tx"]))] = ent
    if total > max_bytes:
        raise ValueError(
            f"halo strips ({total >> 20} MiB) exceed the broadcast cap "
            f"({max_bytes >> 20} MiB); use halo strategy 'shuffle'"
        )
    bc = tdf.sparkSession.sparkContext.broadcast(strips)

    def _one(ty, tx, h, w, th, tw, blocks: dict, S) -> pd.DataFrame:
        oy0, ox0 = ty * th - r, tx * tw - r
        padded = {}
        for b in bands:
            blk = blocks[b]
            pad = np.full((h + 2 * r, w + 2 * r), np.nan, dtype=blk.dtype)
            pad[r:r + h, r:r + w] = blk
            padded[b] = pad
        for (dy, dx), kind in _NBR_STRIP.items():
            ent = S.get((ty + dy, tx + dx))
            if ent is None:
                continue
            for b in bands:
                buf, gy0, gx0, sh, sw, tr = ent[b][kind]
                src = (_decode(buf, sw, sh).T if tr
                       else _decode(buf, sh, sw))
                _clip_place(padded[b], oy0, ox0, gy0, gx0, sh, sw, src)
        meta = {"ty": ty, "tx": tx, "h": h, "w": w, "th": th, "tw": tw}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return reduce_fn(meta, padded)

    if _arrow_assemble_enabled(tdf.sparkSession):
        import pyarrow as pa

        target = _arrow_schema_of(out_schema)

        def _run_arrow(batches):
            S = bc.value
            for rb in batches:
                idx = {c: rb.schema.get_field_index(c)
                       for c in ("ty", "tx", "h", "w", "th", "tw")}
                scal = {c: rb.column(i).to_numpy(zero_copy_only=False)
                        for c, i in idx.items()}
                blob_cols = {b: rb.column(rb.schema.get_field_index(b))
                             for b in bands}
                outs = []
                for i in range(rb.num_rows):
                    h, w = int(scal["h"][i]), int(scal["w"][i])
                    blocks = {}
                    for b in bands:
                        buf = blob_cols[b][i].as_buffer()
                        isz = buf.size // (h * w) if h * w else 8
                        blocks[b] = np.frombuffer(
                            buf, dtype=_DTYPES[isz]).reshape(h, w)
                    outs.append(_one(
                        int(scal["ty"][i]), int(scal["tx"][i]), h, w,
                        int(scal["th"][i]), int(scal["tw"][i]), blocks, S,
                    ))
                if outs:
                    pdf = pd.concat(outs, ignore_index=True)
                    yield pa.RecordBatch.from_arrays(
                        _arrow_arrays(pdf, target), schema=target
                    )

        return tdf.mapInArrow(_run_arrow, schema=out_schema)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        S = bc.value
        for pdf in batches:
            outs = []
            for rec in pdf.itertuples(index=False):
                h, w = int(rec.h), int(rec.w)
                blocks = {b: _decode(getattr(rec, b), h, w) for b in bands}
                outs.append(_one(
                    int(rec.ty), int(rec.tx), h, w,
                    int(rec.th), int(rec.tw), blocks, S,
                ))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return tdf.mapInPandas(_run, schema=out_schema)


def halo_map_tiled(
    tdf: DataFrame,
    radius: int,
    value_cols: Sequence[str],
    reduce_fn,
    out_schema: str,
    strategy: str | None = None,
) -> DataFrame:
    """The generic halo-exchange primitive: per-tile ``reduce_fn(meta,
    padded)`` where ``meta`` = dict(ty, tx, h, w, th, tw) and
    ``padded`` maps band -> NaN-padded (h+2r, w+2r) array.
    ``reduce_fn`` returns ANY pd.DataFrame matching ``out_schema`` —
    stencils return one tiled row (apply_stencil_tiled), graph ops
    return edge lists (regions), etc.

    Three physical strategies (``strategy`` param, else the Spark conf
    ``spark.xrspatial.halo.strategy``; BOTH unset = auto-dispatch:
    ``bucket`` when the raster carries the ``write_bucketed``
    super-tile key and is eligible, else ``shuffle``):

    - ``shuffle``: JVM strip emit -> ONE groupBy(ty, tx) shuffle ->
      assemble.  One scan, raster-scale shuffle.  The 100-TB plan.
    - ``broadcast``: perimeter-scale strip collect + broadcast ->
      shuffle-free mapInPandas.  Two scans, zero shuffle.  The fast
      plan for stored rasters whose strips fit the cap
      (``spark.xrspatial.halo.broadcast.maxBytes``, default 512 MiB);
      raises past the cap.  Requires radius <= EDGE and edge blobs.
    - ``bucket``: per-super-tile cogroup (block size from
      ``spark.xrspatial.halo.block``, default 4): tiles interior to a
      (block x block) super-tile take halos from siblings in the same
      task; ONLY super-tile-boundary strips shuffle.  Over a
      ``write_bucketed`` table the raster side plans with NO exchange
      — the beyond-broadcast 100-TB plan.  Requires radius <= EDGE
      and edge blobs.

    Strip-addressed groups past the raster edge have no center and
    emit nothing, so domain edges stay NaN either way."""
    r = int(radius)
    bands = list(value_cols)
    have_edges = all(f"{b}__le" in tdf.columns for b in bands)
    if strategy is None:
        strategy = tdf.sparkSession.conf.get(
            "spark.xrspatial.halo.strategy", None
        )
    if strategy is None:
        # auto-dispatch: a raster carrying the super-tile bucket key
        # (written via write_bucketed, scanned with a known
        # HashPartitioning) defaults to the exchange-free bucket plan
        # when eligible; everything else takes the works-anywhere
        # shuffle plan
        if "bk" in tdf.columns and r <= EDGE and have_edges:
            strategy = "bucket"
        else:
            strategy = "shuffle"
    if strategy in ("broadcast", "bucket") and (r > EDGE or not have_edges):
        raise ValueError(
            f"{strategy} halo needs radius <= EDGE and edge blobs"
        )
    if strategy == "broadcast":
        max_bytes = int(tdf.sparkSession.conf.get(
            "spark.xrspatial.halo.broadcast.maxBytes", str(512 << 20)
        ))
        return _halo_broadcast(tdf, r, bands, reduce_fn, out_schema,
                               max_bytes)
    if strategy == "bucket":
        return _halo_bucket(tdf, r, bands, reduce_fn, out_schema,
                            _bucket_block(tdf))
    if r <= EDGE and have_edges:
        msgs = _jvm_messages(tdf, r, bands)
    else:
        msgs = _python_messages(tdf, r, bands)

    if _arrow_assemble_enabled(tdf.sparkSession):
        return _assemble_arrow_grouped(msgs, r, bands, reduce_fn, out_schema)

    def _assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        center = pdf[pdf["iscenter"] == 1]
        if len(center) == 0:
            return _empty_frame(out_schema)
        ty, tx = int(key[0]), int(key[1])
        c = center.iloc[0]
        h, w = int(c["sh"]), int(c["sw"])
        th, tw = int(c["th"]), int(c["tw"])
        oy0, ox0 = ty * th - r, tx * tw - r
        dts = {b: _decode(c[b], h, w).dtype for b in bands}
        padded = {
            b: np.full((h + 2 * r, w + 2 * r), np.nan, dtype=dts[b])
            for b in bands
        }
        for rec in pdf.itertuples(index=False):
            sh, sw = int(rec.sh), int(rec.sw)
            for b in bands:
                buf = getattr(rec, b)
                if int(rec.transposed):
                    src = _decode(buf, sw, sh).T
                else:
                    src = _decode(buf, sh, sw)
                _clip_place(padded[b], oy0, ox0, int(rec.gy0),
                            int(rec.gx0), sh, sw, src)
        meta = {"ty": ty, "tx": tx, "h": h, "w": w, "th": th, "tw": tw}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return reduce_fn(meta, padded)

    return msgs.groupBy("ty", "tx").applyInPandas(_assemble, schema=out_schema)


def _arrow_assemble_enabled(spark: SparkSession) -> bool:
    """Default ON: applyInArrow reads shuffled blobs zero-copy (one
    less memcpy of the raster per stencil; measured ~5-15% on the
    536M-cell slope).  ``spark.xrspatial.halo.arrow=false`` restores
    the applyInPandas twin (same kernels, same results — parity is
    asserted in tests/test_tiled.py)."""
    return spark.conf.get("spark.xrspatial.halo.arrow", "true") == "true"


def _arrow_schema_of(ddl: str):
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    return to_arrow_schema(_parse_datatype_string(ddl))


def _arrow_arrays(pdf: pd.DataFrame, target) -> list:
    """pandas frame -> arrow arrays against the TARGET schema (pandas
    int defaults are 64-bit; the tiled schema carries int32 fields)."""
    import pyarrow as pa

    arrays = []
    for field in target:
        col = pdf[field.name]
        if col.dtype == object:
            arrays.append(pa.array(col.tolist(), type=field.type))
        else:
            arrays.append(pa.array(col.to_numpy(), type=field.type))
    return arrays


def _assemble_arrow_grouped(
    msgs: DataFrame, r: int, bands: Sequence[str], reduce_fn, out_schema: str
) -> DataFrame:
    """applyInArrow twin of the shuffle-path assemble: blob columns are
    read zero-copy from the Arrow buffers (``as_buffer`` -> frombuffer)
    instead of being materialized as Python ``bytes`` by the
    Arrow->pandas conversion — one less memcpy of the entire shuffled
    raster per stencil, and no per-group pandas frame construction.
    reduce_fn still returns a pandas frame; output arrays are built
    directly against the target Arrow schema (int widths differ from
    pandas defaults)."""
    import pyarrow as pa

    target = _arrow_schema_of(out_schema)

    def _to_table(pdf: pd.DataFrame) -> pa.Table:
        return pa.Table.from_arrays(_arrow_arrays(pdf, target), schema=target)

    def _assemble(key: tuple, tbl: "pa.Table") -> "pa.Table":
        n = tbl.num_rows
        scal = {
            c: tbl.column(c).to_numpy(zero_copy_only=False)
            for c in ("iscenter", "sh", "sw", "th", "tw", "gy0", "gx0",
                      "transposed")
        }
        centers = np.flatnonzero(scal["iscenter"] == 1)
        if len(centers) == 0:
            return target.empty_table()
        ci = int(centers[0])
        ty = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
        tx = int(key[1].as_py() if hasattr(key[1], "as_py") else key[1])
        h, w = int(scal["sh"][ci]), int(scal["sw"][ci])
        th, tw = int(scal["th"][ci]), int(scal["tw"][ci])
        oy0, ox0 = ty * th - r, tx * tw - r
        blob_cols = {b: tbl.column(b).combine_chunks() for b in bands}

        def _view(b: str, i: int) -> np.ndarray:
            buf = blob_cols[b][i].as_buffer()
            area = int(scal["sh"][i]) * int(scal["sw"][i])
            isz = buf.size // area if area else 8
            return np.frombuffer(buf, dtype=_DTYPES[isz])

        padded = {}
        for b in bands:
            cbuf = _view(b, ci)
            padded[b] = np.full((h + 2 * r, w + 2 * r), np.nan,
                                dtype=cbuf.dtype)
        for i in range(n):
            sh, sw = int(scal["sh"][i]), int(scal["sw"][i])
            for b in bands:
                flat = _view(b, i)
                if int(scal["transposed"][i]):
                    src = flat.reshape(sw, sh).T
                else:
                    src = flat.reshape(sh, sw)
                _clip_place(padded[b], oy0, ox0, int(scal["gy0"][i]),
                            int(scal["gx0"][i]), sh, sw, src)
        meta = {"ty": ty, "tx": tx, "h": h, "w": w, "th": th, "tw": tw}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return _to_table(reduce_fn(meta, padded))

    return msgs.groupBy("ty", "tx").applyInArrow(_assemble, schema=out_schema)


def apply_stencil_tiled(
    tdf: DataFrame,
    fn: StencilFn,
    radius: int,
    value_cols: Sequence[str] = ("value",),
    out_cols: Sequence[str] = ("value",),
    tile_h: int = DEFAULT_TILE,
    tile_w: int = DEFAULT_TILE,
) -> DataFrame:
    """One halo-stencil pass over a tiled raster.

    Plan: a single JVM-side select/explode emits, per tile, the full
    tile addressed to itself (a zero-copy column reference) plus <=8
    border strips (contiguous substrings of the block / its transposed
    edge blobs) addressed to the neighbor tiles; ONE groupBy(ty, tx)
    shuffle co-locates them; each task assembles the NaN-padded
    (h+2r, w+2r) block with numpy slicing, runs ``fn``, and emits the
    interior (plus refreshed edge blobs) as one tiled row.

    Raster bytes cross the JVM<->Python boundary exactly once each
    way (the assemble/kernel stage); shuffle volume ~= raster bytes *
    (1 + 4r(th+tw)/(th*tw)) — ~1.8%% halo overhead at r=1, 512x512.
    Tiles whose group lacks the center row (strips addressed past the
    raster edge) emit nothing, so domain edges stay NaN exactly like
    the long-form path / the reference's NaN boundary
    (xrspatial/focal.py:70-76 map_overlap boundary=np.nan).
    """
    bands = list(value_cols)
    ocols = list(out_cols)
    out_schema = tiled_schema(ocols)

    def _reduce(meta: dict, padded: dict) -> pd.DataFrame:
        outs = fn(padded)
        dts = {b: padded[b].dtype for b in bands}
        default_dt = next(iter(dts.values()))
        row = {"ty": [meta["ty"]], "tx": [meta["tx"]],
               "h": [meta["h"]], "w": [meta["w"]],
               "th": [meta["th"]], "tw": [meta["tw"]]}
        for b in ocols:
            a = np.ascontiguousarray(outs[b], dtype=dts.get(b, default_dt))
            row[b] = [a.tobytes()]
            for sfx, blob in _halo_blobs(a).items():
                row[f"{b}{sfx}"] = [blob]
        return pd.DataFrame(row)

    return halo_map_tiled(tdf, radius, bands, _reduce, out_schema)


# ---------------------------------------------------------------------------
# tiled aggregates (global reductions without untiling)
# ---------------------------------------------------------------------------

def global_stats(tdf: DataFrame, value_col: str = "value") -> dict[str, float]:
    """count / mean / population std / min / max over a tiled raster —
    map-side numpy partials + one tiny agg (the tiled analog of
    ``df.agg(avg, stddev_pop)``)."""

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = s = s2 = 0.0
        lo, hi = np.inf, -np.inf
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                a = _decode(getattr(rec, value_col), int(rec.h), int(rec.w))
                m = np.isfinite(a)
                if m.any():
                    v = a[m].astype(np.float64, copy=False)
                    n += v.size
                    s += float(v.sum())
                    s2 += float((v * v).sum())
                    lo = min(lo, float(v.min()))
                    hi = max(hi, float(v.max()))
        yield pd.DataFrame(
            {"n": [n], "s": [s], "s2": [s2], "lo": [lo], "hi": [hi]}
        )

    part = tdf.mapInPandas(
        _partial, schema="n double, s double, s2 double, lo double, hi double"
    )
    row = part.agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("s2").alias("s2"),
        F.min("lo").alias("lo"), F.max("hi").alias("hi"),
    ).collect()[0]
    n = float(row["n"]) or float("nan")
    mean = float(row["s"]) / n
    var = max(0.0, float(row["s2"]) / n - mean * mean)
    return {
        "count": n,
        "mean": mean,
        "std": var ** 0.5,
        "min": float(row["lo"]),
        "max": float(row["hi"]),
    }


def map_tiles(
    tdf: DataFrame,
    fn: Callable[[dict[str, np.ndarray]], dict[str, np.ndarray]],
    value_cols: Sequence[str] = ("value",),
    out_cols: Sequence[str] = ("value",),
    out_dtypes: dict | None = None,
) -> DataFrame:
    """Cell-local (radius-0) transform — map-side only, no shuffle.
    ``fn`` maps dict of (h, w) arrays to dict of (h, w) arrays.
    Output bands default to the matching input band's dtype (first
    band's for new names); ``out_dtypes`` pins specific bands — e.g.
    an exact-integer label band must stay float64 on a float32
    raster."""
    bands = list(value_cols)
    ocols = list(out_cols)
    odt = out_dtypes or {}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"ty": [], "tx": [], "h": [], "w": [], "th": [], "tw": []}
            for b in ocols:
                out[b] = []
                for sfx in BLOB_SUFFIXES:
                    out[f"{b}{sfx}"] = []
            for rec in pdf.itertuples(index=False):
                h, w = int(rec.h), int(rec.w)
                arrs = {b: _decode(getattr(rec, b), h, w) for b in bands}
                dts = {b: a.dtype for b, a in arrs.items()}
                default_dt = next(iter(dts.values()))
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", category=RuntimeWarning)
                    res = fn(arrs)
                out["ty"].append(int(rec.ty))
                out["tx"].append(int(rec.tx))
                out["h"].append(h)
                out["w"].append(w)
                out["th"].append(int(rec.th))
                out["tw"].append(int(rec.tw))
                for b in ocols:
                    a = np.ascontiguousarray(
                        res[b], dtype=odt.get(b, dts.get(b, default_dt)))
                    out[b].append(a.tobytes())
                    for sfx, blob in _halo_blobs(a).items():
                        out[f"{b}{sfx}"].append(blob)
            yield pd.DataFrame(out)

    return tdf.mapInPandas(_run, schema=tiled_schema(ocols))


def numpy_from_tiled(tdf: DataFrame, value_col: str = "value") -> np.ndarray:
    """Collect a tiled raster to one dense array (tests only)."""
    rows = tdf.select("ty", "tx", "h", "w", "th", "tw", value_col).collect()
    H = max(int(r["ty"]) * int(r["th"]) + int(r["h"]) for r in rows)
    W = max(int(r["tx"]) * int(r["tw"]) + int(r["w"]) for r in rows)
    out = np.full((H, W), np.nan, dtype=np.float64)
    for r in rows:
        a = _decode(r[value_col], int(r["h"]), int(r["w"]))
        y0 = int(r["ty"]) * int(r["th"])
        x0 = int(r["tx"]) * int(r["tw"])
        out[y0:y0 + int(r["h"]), x0:x0 + int(r["w"])] = a
    return out


# ---------------------------------------------------------------------------
# reading stored tiled rasters
# ---------------------------------------------------------------------------

_TARGET_VECTOR_BYTES = 64 << 20  # per-column ceiling for the parquet reader
_TABLE_BATCH_ROWS = 4096


def raster_scan_conf(spark: SparkSession, tile_bytes: int) -> None:
    """Size the vectorized parquet reader for multi-MB binary cells:
    the 4096-row default reserves batch_rows * tile_bytes contiguous
    per column — >2 GB aborts the scan outright and ~GBs OOM the heap
    under 32 concurrent tasks.  Captured at ACTION time (measured), so
    this must be set on the session before materializing a plan that
    scans tiled parquet."""
    rows = max(4, _TARGET_VECTOR_BYTES // max(1, tile_bytes))
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", str(rows))


def table_scan_conf(spark: SparkSession) -> None:
    """Restore the narrow-table reader batch (8-row batches cost ~12x
    on the documents scan; see session.py note)."""
    spark.conf.set(
        "spark.sql.parquet.columnarReaderBatchSize", str(_TABLE_BATCH_ROWS)
    )


def read(spark: SparkSession, path: str, tile_bytes: int | None = None) -> DataFrame:
    """Open a stored tiled raster and configure the session's reader
    batch for its tile size (probed from the first row when not
    given).  The conf change persists on the session — flip back with
    ``table_scan_conf`` before big narrow-table scans."""
    return _sized_scan(spark, spark.read.parquet(path), tile_bytes)


def read_table(
    spark: SparkSession, name: str, tile_bytes: int | None = None
) -> DataFrame:
    """Open a ``write_bucketed`` tiled table with the same reader-batch
    sizing as ``read`` — ``spark.table`` alone leaves the 4096-row
    vectorized-reader default, which aborts/OOMs on multi-MB binary
    tile cells.  Also attaches the table's stored block-size property
    as ``bk`` column metadata, so the bucket halo groups match the
    stored layout per-DataFrame (two open tables with different
    blocks stay independent — a session conf would be
    last-read-wins)."""
    df = spark.table(name)
    try:
        props = spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
        for r in props:
            if r["key"] == "xrspatial.halo.block" and "bk" in df.columns:
                # per-DataFrame: rides the bk column's schema metadata
                df = df.withMetadata("bk", {"block": int(r["value"])})
    except Exception:
        pass  # not a catalog table (e.g. direct path read)
    return _sized_scan(spark, df, tile_bytes)


def _sized_scan(
    spark: SparkSession, df: DataFrame, tile_bytes: int | None
) -> DataFrame:
    if tile_bytes is None:
        band = next(
            c for c in df.columns
            if c not in TILE_KEY_COLS and c != "bk"
            and not c.endswith(BLOB_SUFFIXES)
        )
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4")
        row = df.select(F.length(band).alias("n")).limit(1).collect()
        tile_bytes = int(row[0]["n"]) if row else 8 << 20
    raster_scan_conf(spark, tile_bytes)
    return df


# ---------------------------------------------------------------------------
# stencil fusion
# ---------------------------------------------------------------------------

def fuse_stencils(stages: "Sequence[tuple[StencilFn, int]]") -> tuple[StencilFn, int]:
    """Compose a chain of stencil kernels into ONE (fn, radius) pair.

    A stage with radius r consumes an r-padded block and returns the
    interior; padding the INPUT by the sum of all radii lets every
    stage run back-to-back on progressively-shrinking arrays without
    touching Spark between them.  An n-stage pipeline then costs one
    halo shuffle instead of n — the 100-TB version of "loop fusion"
    (e.g. focal.mean(passes=3), or slope-then-smooth).

    Stage i's fn maps {band: padded array} -> {band: interior array};
    output bands of stage i feed stage i+1.
    """
    radii = [int(r) for _, r in stages]
    total = sum(radii)

    def _fused(arrs: dict) -> dict:
        cur = arrs
        for (fn, r), idx in zip(stages, range(len(stages))):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", category=RuntimeWarning)
                cur = fn(cur)
            # cur arrays are now padded by the REMAINING radii sum
        return cur

    return _fused, total


# ---------------------------------------------------------------------------
# experimental JVM kernel path (jvm/xss_kernels.jar)
# ---------------------------------------------------------------------------

def jvm_kernels_jar() -> str | None:
    """Path to the compiled kernel jar (scripts/build_jvm_kernels.sh),
    or None when it hasn't been built."""
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "jvm", "xss_kernels.jar")
    return p if os.path.exists(p) else None


def slope_tiled_jvm(tdf: DataFrame, value_col: str = "value") -> DataFrame:
    """Horn slope with a compiled JVM kernel: the same one-shuffle
    strip plan as the shuffle halo strategy, but the halo assembly AND
    the kernel run inside the JVM (collect_list of strip pieces ->
    Java UDF), so raster bytes never cross into Python at all.

    The experiment that quantifies the stencil family's remaining
    Python/Arrow overhead (NOTES_r2 measured the kernel at ~6% of the
    core budget).  Numerics: float32 Horn like the Python kernel;
    atan comes from the JVM's libm, so results match the Python path
    to ~1 ulp (tests assert allclose, not bit-equality).  Raises if
    the jar isn't built."""
    jar = jvm_kernels_jar()
    if jar is None:
        raise RuntimeError(
            "JVM kernels not built; run scripts/build_jvm_kernels.sh"
        )
    spark = tdf.sparkSession
    if not spark.conf.get("spark.xrspatial.jvmkernels.loaded", None):
        from pyspark.sql.types import ArrayType, BinaryType

        spark.sql(f"ADD JAR '{jar}'")
        spark.udf.registerJavaFunction(
            "xss_slope_tile", "xss.SlopeTile", ArrayType(BinaryType())
        )
        spark.conf.set("spark.xrspatial.jvmkernels.loaded", "true")

    msgs = _jvm_messages(tdf, 1, [value_col])
    grouped = (
        msgs.groupBy("ty", "tx")
        .agg(
            F.max(F.when(F.col("iscenter") == 1, F.col("sh"))).alias("h"),
            F.max(F.when(F.col("iscenter") == 1, F.col("sw"))).alias("w"),
            F.first("th").alias("th"),
            F.first("tw").alias("tw"),
            F.collect_list(
                F.struct("gy0", "gx0", "sh", "sw", "iscenter", "transposed",
                         F.col(value_col).alias("data"))
            ).alias("pieces"),
        )
        .filter(F.col("h").isNotNull())
    )
    blobs = F.expr("xss_slope_tile(ty, tx, th, tw, pieces)")
    out = grouped.select(
        "ty", "tx", "h", "w", "th", "tw", blobs.alias("_r")
    )
    sel = ["ty", "tx", "h", "w", "th", "tw",
           F.col("_r")[0].alias(value_col)]
    for i, sfx in enumerate(BLOB_SUFFIXES):
        sel.append(F.col("_r")[i + 1].alias(f"{value_col}{sfx}"))
    return out.select(*sel)
