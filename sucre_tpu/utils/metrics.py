"""Image-quality metrics for restoration evaluation (PSNR / SSIM).

Used to track quality parity (BASELINE.md: "PSNR within 0.1 dB of
reference") and for users comparing restored outputs. Pure numpy, masked
variants handle the NaN-at-invalid-pixels convention of exported J.
"""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None,
         peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB over (optionally masked) pixels.

    NaNs in either input are excluded automatically.
    """
    # f32 + masked sums: megapixel inputs make the f64/advanced-indexing
    # form ~3x slower for < 0.001 dB of precision (numpy's pairwise
    # summation keeps the f32 mean accurate at these sizes)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    valid = np.isfinite(a) & np.isfinite(b)
    if mask is not None:
        mask = np.asarray(mask, bool)
        if mask.ndim == a.ndim - 1:
            mask = mask[..., None]
        valid &= np.broadcast_to(mask, a.shape)
    n = int(valid.sum())
    if n == 0:
        return float("nan")
    d = np.where(valid, a - b, np.float32(0.0))
    mse = float(np.square(d, out=d).sum(dtype=np.float64)) / n
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


# SSIM's standard window (Wang et al.): one parameter set shared by
# BOTH convolution backends so they cannot drift.
_SSIM_WIN = 11
_SSIM_SIGMA = 1.5


def _gaussian_1d(size: int = _SSIM_WIN, sigma: float = _SSIM_SIGMA) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _gaussian_kernel(size: int = _SSIM_WIN, sigma: float = _SSIM_SIGMA) -> np.ndarray:
    g = _gaussian_1d(size, sigma)
    return np.outer(g, g)  # rows/cols each normalized -> sums to 1


def _valid_conv(x: np.ndarray) -> np.ndarray:
    """11x11 Gaussian correlation, 'valid' region only (full-overlap
    windows). cv2's separable filter when available (C++, ~10x the
    scipy FFT path on megapixel images — this runs per restored target
    in the report metrics); scipy otherwise. Identical values: the
    Gaussian kernel is outer(g, g)/sum == outer(gn, gn) with
    gn = g/sum(g), and interior pixels don't see the border mode."""
    h = _SSIM_WIN // 2
    try:
        import cv2

        x64 = np.ascontiguousarray(x, np.float64)
        gn = _gaussian_1d()
        out = cv2.sepFilter2D(x64, -1, gn, gn,
                              borderType=cv2.BORDER_CONSTANT)
        return out[h:-h, h:-h]
    except ImportError:
        from scipy.signal import fftconvolve

        return fftconvolve(x, _gaussian_kernel(), mode="valid")


def ssim(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """Structural similarity (standard 11x11 Gaussian window, K1=0.01,
    K2=0.03), averaged over channels. NaNs are replaced by 0 before
    filtering — prefer cropping to the valid region for masked images."""
    a = np.nan_to_num(np.asarray(a, np.float64))
    b = np.nan_to_num(np.asarray(b, np.float64))
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    if a.shape[0] < _SSIM_WIN or a.shape[1] < _SSIM_WIN:
        raise ValueError(
            f"ssim needs at least an {_SSIM_WIN}x{_SSIM_WIN} image "
            f"(the Gaussian window), got {a.shape[0]}x{a.shape[1]}"
        )
    C1 = (0.01 * peak) ** 2
    C2 = (0.03 * peak) ** 2
    vals = []
    for c in range(a.shape[-1]):
        x, y = a[..., c], b[..., c]
        mu_x = _valid_conv(x)
        mu_y = _valid_conv(y)
        xx = _valid_conv(x * x) - mu_x**2
        yy = _valid_conv(y * y) - mu_y**2
        xy = _valid_conv(x * y) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + C1) * (2 * xy + C2)) / (
            (mu_x**2 + mu_y**2 + C1) * (xx + yy + C2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))
