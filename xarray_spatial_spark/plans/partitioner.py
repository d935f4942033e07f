"""Adaptive spatial partitioning — sample-fit KD median trees that
turn skewed point sets into balanced Spark partitions.

Fixed grids (Morton/quadkey tiles, S2 cells at one level) assign work
by AREA; web-scale point data clusters by POPULATION (cities,
megahosts' datacenters), so a fixed grid leaves most partitions empty
and a few with everything — the skew the north rule says to handle
explicitly.  The classic fix (GeoSpark/Sedona, SpatialHadoop) is a
data-adaptive partitioner: fit split boundaries on a bounded sample,
then assign every row to its leaf.

Shape here:

- ``fit_kdtree`` — ONE TakeOrderedAndProject job collects a
  deterministic bounded sample (top-N by xxhash64 of the coordinates,
  so the sample — and therefore the tree — is a pure function of the
  data, not of partitioning or timing), then builds median splits
  driver-side: O(sample) memory, never O(data).
- ``KDTree.assign`` — vectorized numpy descent in an Arrow batch
  (per level: ``idx = 2*idx + (coord[dim[idx]] > thr[idx])``, a
  gather per level).  A pure-Catalyst twin of this recursive
  accumulation was measured 6-14x slower on the S2 encoder (each
  level references the previous twice; interpreted projection has no
  CSE) — the documented lesson is that recursive automata belong in
  Arrow UDFs, so that is what assignment uses.
- ``spatial_repartition`` — assign + ``repartitionByRange`` on the
  leaf id: leaves carry ~equal row counts by construction, so
  partitions do too, whatever the spatial skew.

The tree is a plain pair of numpy arrays (splitting dim + threshold
per heap-indexed internal node), so it broadcasts by closure, pickles
into manifests, and — the important property for joins — the SAME
fitted tree can assign two different frames (points and query sites,
this crawl and last crawl), making ``pid`` an equi-join key whose
matches are spatially co-located: a shuffle-balanced spatial join
with no theta join anywhere.  Leaves split points exactly on their
boxes; objects with EXTENT (polygons, intervals) need multi-leaf
assignment against ``leaf_bounds`` (a box can overlap several
leaves) — done by the caller with an interval/box join, not here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["KDTree", "fit_kdtree", "spatial_repartition"]


class KDTree:
    """Balanced-population KD splits over 2-D points.

    ``levels`` doublings give ``2**levels`` leaves.  Internal nodes
    live in heap order (root = 1): ``dims[i]`` is the split axis
    (0 = x, 1 = y) and ``thrs[i]`` the threshold; a point descends
    right when ``coord > thr`` (ties go left, so constant data
    degrades gracefully to one occupied leaf)."""

    def __init__(
        self,
        dims: np.ndarray,
        thrs: np.ndarray,
        levels: int,
        sample_counts: np.ndarray | None = None,
    ):
        n_internal = (1 << levels) - 1
        if len(dims) != n_internal or len(thrs) != n_internal:
            raise ValueError("tree arrays must have 2**levels - 1 nodes")
        self.dims = np.asarray(dims, dtype=np.int8)
        self.thrs = np.asarray(thrs, dtype=np.float64)
        self.levels = int(levels)
        # per-leaf row counts of the FITTING sample — the skew signal
        # spatial_repartition's salting reads (None when hand-built)
        self.sample_counts = (
            None
            if sample_counts is None
            else np.asarray(sample_counts, dtype=np.int64)
        )

    @property
    def num_leaves(self) -> int:
        return 1 << self.levels

    def leaf_of(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized descent: leaf id in [0, 2**levels) per point."""
        coords = (np.asarray(x, np.float64), np.asarray(y, np.float64))
        idx = np.ones(len(coords[0]), dtype=np.int64)
        for _ in range(self.levels):
            thr = self.thrs[idx - 1]
            d = self.dims[idx - 1]
            v = np.where(d == 0, coords[0], coords[1])
            idx = 2 * idx + (v > thr)
        return idx - self.num_leaves

    def leaf_bounds(self) -> list[tuple[float, float, float, float]]:
        """Per-leaf (xmin, ymin, xmax, ymax), ±inf at the outside —
        feed these to a box/interval join to multi-assign objects
        with extent onto the same leaf ids points get."""
        inf = float("inf")
        boxes = {1: (-inf, -inf, inf, inf)}
        for i in range(1, self.num_leaves):
            xmin, ymin, xmax, ymax = boxes[i]
            d, t = int(self.dims[i - 1]), float(self.thrs[i - 1])
            if d == 0:
                boxes[2 * i] = (xmin, ymin, min(xmax, t), ymax)
                boxes[2 * i + 1] = (min(xmax, t), ymin, xmax, ymax)
            else:
                boxes[2 * i] = (xmin, ymin, xmax, min(ymax, t))
                boxes[2 * i + 1] = (xmin, min(ymax, t), xmax, ymax)
        n = self.num_leaves
        return [boxes[n + i] for i in range(n)]

    def assign(
        self,
        df: DataFrame,
        x_col: str = "lon",
        y_col: str = "lat",
        out_col: str = "spatial_pid",
    ) -> DataFrame:
        """Attach the leaf id as ``out_col`` (int) — an Arrow-batch
        pass, no shuffle."""
        dims, thrs, levels = self.dims, self.thrs, self.levels

        @F.pandas_udf("long")
        def _leaf(x: pd.Series, y: pd.Series) -> pd.Series:
            t = KDTree(dims, thrs, levels)
            return pd.Series(t.leaf_of(x.to_numpy(), y.to_numpy()))

        return df.withColumn(out_col, _leaf(F.col(x_col), F.col(y_col)))


def fit_kdtree(
    df: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    num_partitions: int = 64,
    sample_rows: int = 100_000,
) -> KDTree:
    """Fit balanced KD splits from a deterministic bounded sample.

    ``num_partitions`` rounds up to a power of two (leaf count).  The
    sample is the ``sample_rows`` smallest ``xxhash64(x, y)`` rows —
    one TakeOrderedAndProject job, deterministic for a given dataset
    at any partitioning, driver memory bounded by ``sample_rows``.
    Each node splits on the axis with the larger sample spread at the
    median, so elongated clusters cut across their long side first."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    levels = max(1, int(np.ceil(np.log2(num_partitions))))

    sample = (
        df.select(
            F.col(x_col).cast("double").alias("x"),
            F.col(y_col).cast("double").alias("y"),
        )
        .dropna()
        .orderBy(F.xxhash64("x", "y"))
        .limit(int(sample_rows))
        .toPandas()
    )
    xs = sample["x"].to_numpy()
    ys = sample["y"].to_numpy()
    if len(xs) == 0:
        raise ValueError("no non-null coordinates to fit on")

    n_internal = (1 << levels) - 1
    dims = np.zeros(n_internal, dtype=np.int8)
    thrs = np.zeros(n_internal, dtype=np.float64)

    def build(node: int, px: np.ndarray, py: np.ndarray) -> None:
        if node > n_internal:
            return
        if len(px) == 0:
            # empty subtree: inherit a degenerate split; descendants
            # stay zero-initialized and the leaf simply never fills
            dims[node - 1] = 0
            thrs[node - 1] = np.inf
            build(2 * node, px, py)
            build(2 * node + 1, px, py)
            return
        d = 0 if np.ptp(px) >= np.ptp(py) else 1
        v = px if d == 0 else py
        t = float(np.median(v))
        dims[node - 1] = d
        thrs[node - 1] = t
        mask = v > t
        build(2 * node, px[~mask], py[~mask])
        build(2 * node + 1, px[mask], py[mask])

    build(1, xs, ys)
    tree = KDTree(dims, thrs, levels)
    tree.sample_counts = np.bincount(
        tree.leaf_of(xs, ys), minlength=tree.num_leaves
    ).astype(np.int64)
    return tree


def spatial_repartition(
    df: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    num_partitions: int = 64,
    sample_rows: int = 100_000,
    out_col: str = "spatial_pid",
    tree: KDTree | None = None,
    salt_col: str | None = None,
) -> DataFrame:
    """Repartition ``df`` so each partition holds a spatially compact,
    population-balanced slice: fit (or reuse) a KD tree, assign leaf
    ids, ``repartitionByRange`` on them (distinct balanced ids ->
    ~one leaf per partition).

    Median splits balance everything EXCEPT duplicate coordinates — a
    million rows geocoded to one city-center point all land in one
    leaf, the same hot-key residue every skew story ends in.  So the
    fitted tree's per-leaf sample counts drive SALTING: a leaf holding
    s× its fair share splits into ceil(s) round-robin sub-buckets
    (``xxhash64(salt_col)`` when a row-id column is given — placement
    then deterministic — else ``monotonically_increasing_id``, which
    balances identically but places rows partition-dependently).
    Leaves at or under fair share keep one bucket, so unskewed data
    takes the exact unsalted path.  Salted bucket ids are PARTITION
    keys only — for co-located joins, use ``KDTree.assign`` on both
    sides instead (same leaf ids, no salt)."""
    t = tree or fit_kdtree(
        df, x_col, y_col,
        num_partitions=num_partitions, sample_rows=sample_rows,
    )
    assigned = t.assign(df, x_col, y_col, out_col=out_col)

    counts = t.sample_counts
    if counts is not None and counts.sum() > 0:
        fair = max(1.0, counts.sum() / t.num_leaves)
        salts = np.maximum(1, np.ceil(counts / fair)).astype(np.int64)
    else:
        salts = np.ones(t.num_leaves, dtype=np.int64)
    if salts.max() > 1:
        offsets = np.concatenate(([0], np.cumsum(salts)[:-1]))
        salts_lit = F.array(*[F.lit(int(s)) for s in salts])
        offs_lit = F.array(*[F.lit(int(o)) for o in offsets])
        leaf1 = F.col(out_col) + 1  # element_at is 1-based
        src = (
            F.xxhash64(F.col(salt_col))
            if salt_col is not None
            else F.monotonically_increasing_id()
        )
        bucket = F.element_at(offs_lit, leaf1.cast("int")) + F.pmod(
            src, F.element_at(salts_lit, leaf1.cast("int"))
        )
        assigned = assigned.withColumn(out_col, bucket)
        n_parts = int(salts.sum())
    else:
        n_parts = t.num_leaves
    return assigned.repartitionByRange(n_parts, F.col(out_col))
