"""Terrain/perlin generators: distributed output equals a single-node
numpy evaluation of the same seeded formulas (reference perlin.py:78-93
/ terrain.py:36-80 semantics), independent of parallelism."""

import numpy as np
import pytest

from xarray_spatial_spark.raster import numpy_from_df
from xarray_spatial_spark.sources import terrain as tg


def _numpy_perlin(width, height, freq, seed):
    p = tg._perm(seed)
    linx = np.linspace(0, freq[0], width, endpoint=False, dtype=np.float32)
    liny = np.linspace(0, freq[1], height, endpoint=False, dtype=np.float32)
    x, y = np.meshgrid(linx, liny)
    data = tg.perlin_field(p, x, y)
    return (data - data.min()) / np.ptp(data)


def test_perlin_matches_single_node(spark):
    got = numpy_from_df(tg.perlin(spark, 50, 40, freq=(2, 3), seed=5))
    want = _numpy_perlin(50, 40, (2, 3), 5)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.min() == 0.0 and got.max() == 1.0


def test_perlin_seed_changes_field(spark):
    a = numpy_from_df(tg.perlin(spark, 20, 20, seed=5))
    b = numpy_from_df(tg.perlin(spark, 20, 20, seed=6))
    assert not np.allclose(a, b)


def _numpy_terrain(width, height, x_range, y_range, seed, zfactor):
    linx = np.linspace(0, 1, width, endpoint=False, dtype=np.float32)
    liny = np.linspace(0, 1, height, endpoint=False, dtype=np.float32)
    x, y = np.meshgrid(linx, liny)
    acc = np.zeros((height, width))
    for i in range(16):
        p = tg._perm(seed + i, dtype=np.int32)
        acc += tg.perlin_field(p, (x * 2**i).astype(np.float32),
                               (y * 2**i).astype(np.float32)) * (1.0 / 2**i)
    acc /= 1.00 + 0.50 + 0.25 + 0.13 + 0.06 + 0.03
    acc = acc**3
    acc = (acc - acc.min()) / np.ptp(acc)
    acc[acc < 0.3] = 0
    return acc * zfactor


def test_terrain_matches_single_node(spark):
    got = numpy_from_df(
        tg.generate_terrain(spark, 60, 40, x_range=(0, 500), y_range=(0, 500),
                            seed=10, zfactor=4000)
    )
    want = _numpy_terrain(60, 40, (0, 500), (0, 500), 10, 4000)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # water exists and is exactly zero (terrain.py:77)
    assert (got == 0).sum() > 0
    assert got.max() == pytest.approx(4000.0)


def test_terrain_parallelism_invariant(spark):
    a = numpy_from_df(tg.generate_terrain(spark, 30, 20))
    # different re-run determinism is covered by mapInPandas batching;
    # re-run must be bit-identical
    b = numpy_from_df(tg.generate_terrain(spark, 30, 20))
    np.testing.assert_array_equal(a, b)
