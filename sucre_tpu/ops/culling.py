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

from sucre_tpu.ops import distortion as distortion_ops


def _ray_dirs(uu, vv, intrinsics, dist, dist_model: str):
    """Normalized ray slopes (x, y) for pixel-center coords (host numpy,
    f64). With a distorted camera the rays bend through the inverse lens
    model; non-invertible pixels come back NaN — callers drop them from
    the sample set (such pixels can never produce a match: their
    unprojection is rejected by the matcher's finite masks, so a bound
    that excludes them stays conservative for real matches)."""
    fx, fy, cx, cy = (float(x) for x in intrinsics)
    xn = (uu + 0.5 - cx) / fx
    yn = (vv + 0.5 - cy) / fy
    if dist_model == "none" or dist is None:
        return xn, yn
    return distortion_ops.undistort(
        dist_model, np.asarray(dist, np.float64), xn, yn, xp=np
    )


def _backproject_grid(
    depth_raw: np.ndarray,
    intrinsics: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    stride: int,
    dist: np.ndarray | None,
    dist_model: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Strided backprojection of a depth map to world space, FULL-grid
    layout: (Pw (h, w, 3) f64, valid (h, w) bool, vv, uu source pixel
    grids). Shared by the whole-view and tile-granular culls so their
    geometry (mm->m, +0.5 centers, inverse lens, cam->world) can never
    desynchronize; invalid entries carry nan_to_num'd rays and must be
    masked by ``valid``."""
    d = depth_raw[::stride, ::stride].astype(np.float64)
    if np.issubdtype(depth_raw.dtype, np.integer):
        d = d / 1000.0
    H, W = depth_raw.shape
    vv, uu = np.meshgrid(
        np.arange(0, H, stride, dtype=np.float64),
        np.arange(0, W, stride, dtype=np.float64),
        indexing="ij",
    )
    xr, yr = _ray_dirs(uu, vv, intrinsics, dist, dist_model)
    valid = (d > 0) & np.isfinite(xr)
    xr = np.nan_to_num(xr)
    yr = np.nan_to_num(yr)
    P = np.stack([d * xr, d * yr, d], axis=-1)
    Pw = (
        P.reshape(-1, 3) @ np.asarray(R, np.float64).T
        + np.asarray(t, np.float64)
    )
    return Pw.reshape(P.shape), valid, vv, uu


def surface_aabb(
    depth_raw: np.ndarray,  # (H, W) uint16 mm or float32 m
    intrinsics: np.ndarray,  # (4,) fx fy cx cy
    R: np.ndarray,  # (3, 3) cam->world
    t: np.ndarray,  # (3,)
    stride: int = 8,
    margin: float = 0.05,
    dist: np.ndarray | None = None,  # canonical (8,) distortion vector
    dist_model: str = "none",
) -> tuple[np.ndarray, np.ndarray] | None:
    """World-space AABB of the view's observed surface (None if no valid
    depth)."""
    Pw, valid, _, _ = _backproject_grid(
        depth_raw, intrinsics, R, t, stride, dist, dist_model
    )
    if not valid.any():
        return None
    Pw = Pw[valid]
    lo = Pw.min(axis=0)
    hi = Pw.max(axis=0)
    pad = margin * float(np.linalg.norm(hi - lo))
    pad += _match_tolerance(depth_raw, intrinsics)
    return lo - pad, hi + pad


def _match_tolerance(depth_raw: np.ndarray, intrinsics: np.ndarray) -> float:
    """World-space slack a two-way-consistent match allows between the
    two cameras' 3D points of the SAME correspondence: each side's point
    comes from its own depth map and integer pixel, so they deviate by
    up to ~a pixel footprint at the surface distance (z/f per pixel;
    trunc-toward-zero + center offsets span <~1.5 px, factor 2 for
    slack) plus the u16 millimeter depth quantization. Without this term
    two surfaces can be measurably disjoint yet still produce matches —
    pads built only from the surface DIAGONAL miss it on short-focal
    (coarse-footprint) cameras, where it dominates (caught live: a
    single-column sliver pair survived min_cover while both padded AABBs
    were disjoint). Uses the FULL map's max depth — a stride subsample
    can miss the deepest pixel."""
    d = depth_raw.astype(np.float64)
    if np.issubdtype(depth_raw.dtype, np.integer):
        d = d / 1000.0
    z_max = float(d.max(initial=0.0))
    fx, fy = float(intrinsics[0]), float(intrinsics[1])
    return 2.0 * z_max * float(np.hypot(1.0 / fx, 1.0 / fy)) + 0.002


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


def surface_tile_aabbs(
    depth_raw: np.ndarray,  # (H, W) uint16 mm or float32 m
    intrinsics: np.ndarray,  # (4,) fx fy cx cy
    R: np.ndarray,  # (3, 3) cam->world
    t: np.ndarray,  # (3,)
    n_tiles: int = 4,
    stride: int = 8,
    margin: float = 0.05,
    dist: np.ndarray | None = None,  # canonical (8,) distortion vector
    dist_model: str = "none",
) -> list:
    """(n_tiles x n_tiles) grid of world-space AABBs of the TARGET's
    observed surface, tile [i][j] covering target pixel rows
    [i*th, (i+1)*th) x cols [j*tw, (j+1)*tw) with th = ceil(H/n),
    tw = ceil(W/n). The tile-granular counterpart of ``surface_aabb``:
    a view whose surface AABB misses tile [i][j] cannot produce a single
    valid match inside that tile's pixels, so matching can skip the tile
    — the rectangle-restriction cull (see ``tile_view_rects``).

    Conservativeness (vs the whole-view AABB, which covers gaps between
    subsamples by hull convexity): each tile's sample set is EXPANDED by
    one stride ring past the tile boundary, so a surface strip between
    the last sample of one tile and the first of the next lies inside the
    hull of SOME tile's samples — disjoint per-tile sample sets would
    leave such strips in no tile's box and falsely cull views overlapping
    exactly there (caught live: real observations dropped on a transect).
    The pad is ``margin`` of the WHOLE surface's diagonal — the same
    absolute slack the whole-view cull applies — not the (much smaller)
    tile diagonal. Flat list of n*n entries (row-major), None for tiles
    with no valid depth. The stride is clamped so every tile gets sampled
    on BOTH axes (a coarse stride on a small image would leave tiles
    sample-less -> falsely "unreachable" -> dropped matches)."""
    H, W = depth_raw.shape
    th = -(-H // n_tiles)
    tw = -(-W // n_tiles)
    stride = max(1, min(stride, th // 2 or 1, tw // 2 or 1))
    Pw, valid, vv, uu = _backproject_grid(
        depth_raw, intrinsics, R, t, stride, dist, dist_model
    )

    if not valid.any():
        return [None] * (n_tiles * n_tiles)
    whole = Pw[valid]
    pad = margin * float(np.linalg.norm(whole.max(axis=0) - whole.min(axis=0)))
    pad += _match_tolerance(depth_raw, intrinsics)

    out = []
    for i in range(n_tiles):
        for j in range(n_tiles):
            # one-stride expansion ring: gap strips between samples at a
            # tile boundary stay inside this tile's hull
            m = (
                valid
                & (vv >= i * th - stride) & (vv < (i + 1) * th + stride)
                & (uu >= j * tw - stride) & (uu < (j + 1) * tw + stride)
            )
            if not m.any():
                out.append(None)
                continue
            pts = Pw[m]
            out.append((pts.min(axis=0) - pad, pts.max(axis=0) + pad))
    return out


def tile_view_rects(
    tile_aabbs: list,  # n*n flat grid from surface_tile_aabbs
    view_aabbs: list,  # per-view AABBs (surface_aabb)
    height: int,
    width: int,
    n_tiles: int = 4,
) -> list:
    """Per-view envelope rectangle of target tiles the view's surface can
    reach: (r0, r1, c0, c1) in TILE-ALIGNED pixel coordinates (r1/c1 may
    exceed height/width — callers pad the target to n_tiles*tile once, so
    slice shapes stay in a small bucket set of at most n_tiles distinct
    sizes per axis). (0, 0, 0, 0) when no tile overlaps — the view is
    fully culled, subsuming ``cull_views`` for that target (an AABB
    disjoint from every tile's is disjoint from their union)."""
    th = -(-height // n_tiles)
    tw = -(-width // n_tiles)
    rects = []
    for vb in view_aabbs:
        i0 = j0 = n_tiles
        i1 = j1 = -1
        if vb is not None:
            for k, tb in enumerate(tile_aabbs):
                if aabb_overlap(tb, vb):
                    i, j = divmod(k, n_tiles)
                    i0, i1 = min(i0, i), max(i1, i)
                    j0, j1 = min(j0, j), max(j1, j)
        if i1 < 0:
            rects.append((0, 0, 0, 0))
        else:
            rects.append((i0 * th, (i1 + 1) * th, j0 * tw, (j1 + 1) * tw))
    return rects
