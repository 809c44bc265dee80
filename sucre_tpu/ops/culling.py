"""Surface-overlap pre-culling for survey matching.

A two-way-consistent match requires the two views to observe the SAME
3D surface point, so a pair whose observed-surface bounding volumes do
not intersect produces zero matches — matching it is pure waste. On a
long survey transect almost all of the O(V) candidate pairs per target
are like this; culling them turns full-survey restoration from
O(V^2)-ish matching work into O(V x local-overlap).

The bound used is the world-space AABB of a coarse subsample of the
backprojected depth map (every ``stride``-th pixel), inflated by
``margin`` of its diagonal. Subsampling can miss extreme spikes between
samples; the margin covers practical depth variation, and borderline
pairs it might drop are exactly the ones with negligible coverage that
``min_cover`` discards anyway (set margin high or disable culling for
strict reference parity).
"""

from __future__ import annotations

import numpy as np


def surface_aabb(
    depth_raw: np.ndarray,  # (H, W) uint16 mm or float32 m
    intrinsics: np.ndarray,  # (4,) fx fy cx cy
    R: np.ndarray,  # (3, 3) cam->world
    t: np.ndarray,  # (3,)
    stride: int = 8,
    margin: float = 0.05,
) -> tuple[np.ndarray, np.ndarray] | None:
    """World-space AABB of the view's observed surface (None if no valid
    depth)."""
    d = depth_raw[::stride, ::stride].astype(np.float64)
    if np.issubdtype(depth_raw.dtype, np.integer):
        d = d / 1000.0
    H, W = depth_raw.shape
    vv, uu = np.meshgrid(
        np.arange(0, H, stride, dtype=np.float64),
        np.arange(0, W, stride, dtype=np.float64),
        indexing="ij",
    )
    valid = d > 0
    if not valid.any():
        return None
    fx, fy, cx, cy = (float(x) for x in intrinsics)
    X = d * (uu + 0.5 - cx) / fx
    Y = d * (vv + 0.5 - cy) / fy
    P = np.stack([X[valid], Y[valid], d[valid]], axis=-1)  # (n, 3) camera frame
    Pw = P @ np.asarray(R, np.float64).T + np.asarray(t, np.float64)
    lo = Pw.min(axis=0)
    hi = Pw.max(axis=0)
    pad = margin * float(np.linalg.norm(hi - lo))
    return lo - pad, hi + pad


def aabb_overlap(a, b) -> bool:
    """Do two (lo, hi) AABBs intersect? (None = empty => no overlap.)"""
    if a is None or b is None:
        return False
    return bool(np.all(a[0] <= b[1]) and np.all(b[0] <= a[1]))


def cull_views(target_aabbs: list, view_aabbs: list) -> np.ndarray:
    """Boolean keep-mask over views: True if the view's surface AABB
    overlaps ANY target's."""
    keep = np.zeros(len(view_aabbs), bool)
    for i, vb in enumerate(view_aabbs):
        keep[i] = any(aabb_overlap(tb, vb) for tb in target_aabbs)
    return keep
