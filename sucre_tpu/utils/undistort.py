"""Undistorted-output resampling for distorted-camera restorations.

The reference pipeline only ever sees pre-undistorted data: its input
contract is "an undistorted COLMAP model" (reference `sucre.py:270`,
`sfm.py:192` PINHOLE assert), so every artifact it writes lives on an
ideal pinhole grid. This framework restores distorted rigs natively —
artifacts stay on the ORIGINAL (distorted) pixel grid, aligned with the
input images (see `ops/distortion.py`). `--undistort-output` bridges the
remaining gap for users who want the reference-style deliverable: the
restored image resampled onto the ideal pinhole camera, without ever
running COLMAP's image undistorter.

Design: undistortion of an OUTPUT grid needs only the FORWARD distortion
map (closed form for every model) — for each undistorted output pixel,
bend its ray through the lens to find where it lands on the distorted
source grid, then sample. No iterative inversion, no second device
gather (this is a one-time host-side export step, ~H*W flops, microseconds
next to PNG encode). The ideal camera keeps the original fx/fy/cx/cy and
dimensions (cv2's `initUndistortRectifyMap` default); barrel-distortion
corners that fall outside the source frame come back invalid (black in
the artifact), pincushion edges pull in valid sources.

NaN-awareness: the restored J carries NaN at never-observed pixels.
Bilinear weights renormalize over the valid neighbors so one unobserved
source pixel does not poison its whole 2x2 neighborhood; output pixels
whose every contributing neighbor is invalid come back invalid.
"""

from __future__ import annotations

import numpy as np

from sucre_tpu.ops import distortion as distortion_ops


def undistort_source_coords(
    width: int,
    height: int,
    intrinsics: np.ndarray,  # (4,) fx fy cx cy
    dist: np.ndarray,  # canonical (8,) vector
    dist_model: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Source sample positions on the distorted grid for every pixel of
    the ideal pinhole grid (same dims, same intrinsics).

    Returns float64 (H, W) arrays (su, sv) in the +0.5-pixel-center
    continuous convention (`ops/pinhole.py`): the undistorted output
    pixel (u, v) shows what the distorted source image holds at
    (su[v, u], sv[v, u]). Purely the closed-form FORWARD distortion —
    exact for every model tag.
    """
    fx, fy, cx, cy = (float(x) for x in np.asarray(intrinsics, np.float64))
    u = np.arange(width, dtype=np.float64)
    v = np.arange(height, dtype=np.float64)
    xn = (u[None, :] + 0.5 - cx) / fx
    yn = (v[:, None] + 0.5 - cy) / fy
    xn, yn = np.broadcast_arrays(xn, yn)
    xd, yd = distortion_ops.distort(
        dist_model, np.asarray(dist, np.float64), xn, yn, xp=np
    )
    return fx * xd + cx, fy * yd + cy


def resample_bilinear(
    image: np.ndarray,  # (H, W) or (H, W, C) float; NaN = invalid
    su: np.ndarray,  # (Ho, Wo) source coords, +0.5-center convention
    sv: np.ndarray,
    valid: np.ndarray | None = None,  # (H, W) bool; default: finite pixels
) -> tuple[np.ndarray, np.ndarray]:
    """Validity-renormalized bilinear resample.

    Returns (out, out_valid): `out` is (Ho, Wo[, C]) float32 with NaN at
    invalid output pixels; an output pixel is valid when at least one of
    its four bilinear neighbors is a valid in-bounds source pixel (the
    weights renormalize over the valid subset). Source coords use the
    +0.5-pixel-center convention, so array-index space is coord - 0.5.
    """
    image = np.asarray(image, np.float32)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    H, W, C = image.shape
    finite_src = np.isfinite(image).all(axis=-1)
    valid = (
        finite_src if valid is None
        else np.asarray(valid, bool) & finite_src
    )

    si = np.asarray(sv, np.float64) - 0.5  # row index space
    sj = np.asarray(su, np.float64) - 0.5
    finite = np.isfinite(si) & np.isfinite(sj)
    si = np.where(finite, si, -10.0)
    sj = np.where(finite, sj, -10.0)
    i0 = np.floor(si).astype(np.int64)
    j0 = np.floor(sj).astype(np.int64)
    fi = (si - i0).astype(np.float32)
    fj = (sj - j0).astype(np.float32)

    num = np.zeros(si.shape + (C,), np.float32)
    den = np.zeros(si.shape, np.float32)
    img_filled = np.where(valid[..., None], np.nan_to_num(image), 0.0)
    for di, dj, w in (
        (0, 0, (1 - fi) * (1 - fj)),
        (0, 1, (1 - fi) * fj),
        (1, 0, fi * (1 - fj)),
        (1, 1, fi * fj),
    ):
        ii = i0 + di
        jj = j0 + dj
        inb = (ii >= 0) & (ii < H) & (jj >= 0) & (jj < W) & finite
        iic = np.clip(ii, 0, H - 1)
        jjc = np.clip(jj, 0, W - 1)
        wv = np.where(inb & valid[iic, jjc], w, 0.0).astype(np.float32)
        num += wv[..., None] * img_filled[iic, jjc]
        den += wv
    out_valid = den > 1e-6
    out = np.where(
        out_valid[..., None], num / np.where(out_valid, den, 1.0)[..., None], np.nan
    )
    if squeeze:
        out = out[..., 0]
    return out.astype(np.float32), out_valid


def undistort_image(
    image: np.ndarray,  # (H, W[, C]) float; NaN = invalid
    valid: np.ndarray | None,  # (H, W) bool validity on the distorted grid
    intrinsics: np.ndarray,  # (4,) fx fy cx cy
    dist: np.ndarray,  # canonical (8,) vector
    dist_model: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Resample a distorted-grid image onto the ideal pinhole camera with
    the same intrinsics and dimensions. Returns (image_und, valid_und);
    a "none" model is the identity (copies through)."""
    if dist_model == "none":
        image = np.asarray(image, np.float32)
        if valid is None:
            valid = np.isfinite(image).all(axis=-1) if image.ndim == 3 else np.isfinite(image)
        return image, np.asarray(valid, bool)
    H, W = np.asarray(image).shape[:2]
    su, sv = undistort_source_coords(W, H, intrinsics, dist, dist_model)
    return resample_bilinear(image, su, sv, valid=valid)
