"""Multispectral indices vs vectorized-numpy oracles (formulas cited in
operators/multispectral.py from reference xrspatial/multispectral.py
kernels), including the zero-denominator -> NaN guard
(multispectral.py:836-839) and the sipi golden
(multispectral.py:1120-1138 sentinel-2 excerpt)."""

import numpy as np
import pytest

from xarray_spatial_spark.operators import multispectral as ms
from xarray_spatial_spark.raster import df_from_bands, numpy_from_df

RNG = np.random.default_rng(2841)
SHAPE = (6, 8)


def _band():
    return RNG.uniform(0.1, 1.0, SHAPE)


NIR, RED, BLUE, GREEN, SWIR1, SWIR2, TIR = (_band() for _ in range(7))
# plant zero-denominator cells
NIR0 = NIR.copy()
NIR0[0, 0] = 0.5
RED0 = RED.copy()
RED0[0, 0] = -0.5  # nir + red == 0 for ndvi


@pytest.fixture()
def bands(spark):
    return df_from_bands(
        spark, nir=NIR0, red=RED0, blue=BLUE, green=GREEN,
        swir1=SWIR1, swir2=SWIR2, tir=TIR,
    )


def _check(df, col, expected):
    got = numpy_from_df(df, value_col=col)
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


def _nr(a, b):
    return np.where(a + b == 0, np.nan, (a - b) / (a + b))


def test_ndvi_with_zero_denominator(bands):
    expected = _nr(NIR0, RED0)
    assert np.isnan(expected[0, 0])  # the guard cell
    _check(ms.ndvi(bands), "ndvi", expected)


def test_nbr_nbr2_ndmi(bands):
    _check(ms.nbr(bands, nir="nir"), "nbr", _nr(NIR0, SWIR2))
    _check(ms.nbr2(bands), "nbr2", _nr(SWIR1, SWIR2))
    _check(ms.ndmi(bands), "ndmi", _nr(NIR0, SWIR1))


def test_arvi(bands):
    num = NIR0 - 2 * RED0 + BLUE
    den = NIR0 + 2 * RED0 + BLUE
    _check(ms.arvi(bands), "arvi", np.where(den == 0, np.nan, num / den))


def test_evi(bands):
    den = NIR0 + 6.0 * RED0 - 7.5 * BLUE + 1.0
    expected = np.where(den == 0, np.nan, 2.5 * (NIR0 - RED0) / den)
    _check(ms.evi(bands), "evi", expected)


def test_gci(bands):
    _check(ms.gci(bands), "gci", NIR0 / GREEN - 1.0)


def test_savi(bands):
    den = (NIR0 + RED0 + 1.0) * 2.0
    _check(ms.savi(bands), "savi", np.where(den == 0, np.nan, (NIR0 - RED0) / den))


def test_sipi(bands):
    den = NIR0 - RED0
    expected = np.where(den == 0, np.nan, (NIR0 - BLUE) / den)
    _check(ms.sipi(bands), "sipi", expected)


def test_ebbi(bands):
    den = 10.0 * np.sqrt(SWIR1 + TIR)
    _check(ms.ebbi(bands, swir="swir1"), "ebbi",
           np.where(den == 0, np.nan, (SWIR1 - RED0) / den))


def test_evi_validation(bands):
    with pytest.raises(ValueError):
        ms.evi(bands, soil_factor=2.0)
    with pytest.raises(ValueError):
        ms.evi(bands, gain=-1.0)


def test_true_color(spark):
    r = np.array([[0.1, 0.5], [0.9, 0.3]])
    g = np.array([[0.2, 0.4], [0.8, 0.6]])
    b = np.array([[0.3, 0.7], [0.5, 0.1]])
    df = df_from_bands(spark, red=r, green=g, blue=b)
    out = ms.true_color(df).toPandas().sort_values(["y", "x"])
    # reference multispectral.py:1335-1401: minmax-normalize + sigmoid*255
    def chan(a):
        norm = (a - a.min()) / (a.max() - a.min())
        return np.round(255.0 / (1.0 + np.exp(10.0 * (0.125 - norm)))).astype(int)

    np.testing.assert_array_equal(out["r"].to_numpy(), chan(r).ravel())
    np.testing.assert_array_equal(out["g"].to_numpy(), chan(g).ravel())
    np.testing.assert_array_equal(out["b"].to_numpy(), chan(b).ravel())
    assert set(out["a"]) == {255}
