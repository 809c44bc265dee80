"""PSNR/SSIM metric tests."""

import numpy as np

from sucre_tpu.utils.metrics import psnr, ssim


def test_psnr_identity():
    a = np.random.default_rng(0).uniform(0, 1, (16, 16, 3))
    assert psnr(a, a) == float("inf")


def test_psnr_known_value():
    a = np.zeros((10, 10, 3))
    b = np.full((10, 10, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 20.0, atol=1e-9)  # mse=0.01


def test_psnr_nan_excluded():
    a = np.zeros((4, 4, 3))
    b = np.zeros((4, 4, 3))
    b[0, 0] = np.nan
    a2 = a.copy(); a2[1, 1] = 0.1
    v = psnr(a2, b)
    assert np.isfinite(v)


def test_psnr_masked():
    a = np.zeros((4, 4, 3)); b = a.copy()
    b[0, 0] = 1.0  # error only outside the mask
    mask = np.ones((4, 4), bool); mask[0, 0] = False
    assert psnr(a, b, mask=mask) == float("inf")


def test_ssim_bounds(rng):
    a = rng.uniform(0, 1, (32, 32, 3))
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = rng.uniform(0, 1, (32, 32, 3))
    assert ssim(a, b) < 0.5
