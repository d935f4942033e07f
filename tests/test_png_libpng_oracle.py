"""Cross-validation of the from-scratch PNG codec against the system
libpng (simplified png_image API; a tiny C shim compiled on demand
with gcc).  PNG is lossless, so both directions must be BIT-EXACT:
libpng-encoded files (its writer picks per-row adaptive filters, so
all five filter types get exercised) through our decoder, and our
encoder's files through libpng.  Skips cleanly without gcc/png.h."""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from xarray_spatial_spark.operators.multimodal import decode_png, encode_png

SRC = os.path.join(os.path.dirname(__file__), "..", "scripts",
                   "png_oracle.c")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("gcc") is None or not os.path.exists("/usr/include/png.h"):
        pytest.skip("no gcc + libpng on this box")
    d = tmp_path_factory.mktemp("po")
    exe = str(d / "png_oracle")
    r = subprocess.run(["gcc", "-O2", "-o", exe, SRC, "-lpng"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"png_oracle build failed: {r.stderr[:200]!r}")

    def enc(img: np.ndarray) -> bytes:
        h, w = img.shape[:2]
        nc = 1 if img.ndim == 2 else img.shape[2]
        raw, png = str(d / "i.raw"), str(d / "o.png")
        open(raw, "wb").write(np.ascontiguousarray(img).tobytes())
        subprocess.run([exe, "enc", str(w), str(h), str(nc), raw, png],
                       check=True)
        return open(png, "rb").read()

    def dec(data: bytes) -> np.ndarray:
        png, raw = str(d / "i.png"), str(d / "o.raw")
        open(png, "wb").write(data)
        r = subprocess.run([exe, "dec", png, raw], check=True,
                           capture_output=True, text=True)
        w, h, nc = map(int, r.stdout.split())
        a = np.frombuffer(open(raw, "rb").read(), np.uint8)
        return a.reshape(h, w, nc) if nc > 1 else a.reshape(h, w)

    return enc, dec


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:50, 0:37]
    alpha = np.clip(
        (np.arange(33)[:, None] + np.arange(44)[None, :]) * 3, 0, 255)
    return {
        "gray": ((yy * 5 + xx) % 256).astype(np.uint8),
        "rgb_noise": rng.integers(0, 256, (41, 29, 3)).astype(np.uint8),
        "rgb_smooth": np.stack([(yy + xx) % 256, (yy * 2) % 256,
                                (xx * 3) % 256], 2).astype(np.uint8),
        "rgba": np.dstack([rng.integers(0, 256, (33, 44, 3)),
                           alpha]).astype(np.uint8),
        "flat": np.full((20, 20, 3), 99, np.uint8),
        "one_px": rng.integers(0, 256, (1, 1, 3)).astype(np.uint8),
        "row": rng.integers(0, 256, (1, 300, 4)).astype(np.uint8),
        "col": rng.integers(0, 256, (300, 1, 3)).astype(np.uint8),
    }


@pytest.mark.parametrize("name", list(_cases()))
def test_libpng_stream_decodes_bit_exact(oracle, name):
    enc, _ = oracle
    img = _cases()[name]
    np.testing.assert_array_equal(decode_png(enc(img)), img)


@pytest.mark.parametrize("name", list(_cases()))
def test_libpng_decodes_our_streams(oracle, name):
    _, dec = oracle
    img = _cases()[name]
    np.testing.assert_array_equal(dec(encode_png(img)), img)
