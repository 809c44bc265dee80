"""Dense two-way cross-view matching — the geometric hot path.

Reference semantics (sfm.py:115-138, 171-175): for a target pixel p1
with valid depth, project its backprojected 3D point into view 2 and
integer-truncate to candidate pixel q2; keep the pair iff view 2's own
backprojection at q2, projected into view 1 and truncated, lands exactly
back on p1 ("two-way consistency" — this IS the occlusion test).

The reference implements the reverse check by scatter-rasterizing view
2's matches into an (H2, W2, 2) map and gathering it (sfm.py:154-159,
171-175). Because the scatter indices (view-2 pixels with valid depth)
are unique, that map is exactly the function q2 -> trunc(proj1(unproj2(q2)))
restricted to {valid depth, in-bounds}, so the whole check reduces to a
pure *gather* formulation with identical results:

    consistent(p1) <=> depth2[q2] > 0  and  trunc(proj1(unproj2(q2))) == p1

(the in-bounds condition of the reverse projection is implied by the
equality: p1 is in-bounds by construction). No scatter appears anywhere,
every array is dense (H, W) with a validity mask — static shapes, VPU
elementwise + two gathers per view pair, vmappable over the view axis
and shardable over pixel rows.

Outputs are laid out dense on the *target* pixel grid: entry [v, u] of
each (H, W) output describes view 2's observation of target pixel
(u, v). Stacked over V views this gives the (V, H, W) observation stack
the fit stage consumes with zero gathers/scatters.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sucre_tpu.ops import distortion as distortion_ops
from sucre_tpu.ops.pinhole import pixel_grid
from sucre_tpu.ops.se3 import pose_inverse, transform_points

# Sentinel for "no match" pixel coordinates (parity: the reference's
# match-map is initialized to -1, sfm.py:155).
NO_MATCH = -1


class PairMatch(NamedTuple):
    """Dense matching of one target view against one other view.

    All arrays are on the target pixel grid (H, W).
    """

    u2: jnp.ndarray  # int32, matched pixel x in view 2 (NO_MATCH if invalid)
    v2: jnp.ndarray  # int32, matched pixel y in view 2
    d2: jnp.ndarray  # float32, view 2 depth at (v2, u2) (0 if invalid)
    valid: jnp.ndarray  # bool


class DenseObs(NamedTuple):
    """Dense observation stack for the fit stage.

    Entry [k, v, u]: view k's observation of target pixel (u, v).
    ``cP`` is the 3D point in *view k's* camera frame (the observing
    camera — parity with loader.py:103-118 where z = ||cP2||).

    Two storage layouts (fields are None when absent):
      - full:    cP (V, H, W, 3) f32 — required for the light model,
                 whose range/vignetting depend on the 3D point.
      - compact: z (V, H, W) f32 — the range is constant across fit
                 iterations without the light model, so storing it
                 directly cuts HBM traffic ~3x (z f32 + I u8 + valid
                 = 8B/obs vs 25B).
    ``I`` keeps its source dtype: uint8 whenever colors live in the u8
    domain (decoded images, including u8-domain INTER_AREA downscales
    under image_scale < 1 — the /255 conversion fuses into the loss) or
    float32 [0,1] when they left it (cubic upscales, bilinear sampling,
    .h5 cache loads).
    """

    valid: jnp.ndarray  # (V, H, W) bool
    cP: jnp.ndarray | None  # (V, H, W, 3) float32, or None (compact layout)
    I: jnp.ndarray  # (V, H, W, 3) uint8 or float32 observed colors
    z: jnp.ndarray | None = None  # (V, H, W) float32 ranges (compact layout)

    @property
    def n_obs(self) -> jnp.ndarray:
        return jnp.sum(self.valid)

    def compact(self) -> "DenseObs":
        """Drop cP in favor of the precomputed range z (no-light fast
        path); no-op if already compact."""
        if self.cP is None:
            return self
        cP_safe = jnp.where(self.valid[..., None], self.cP, 1.0)
        z = jnp.sqrt(jnp.sum(cP_safe * cP_safe, axis=-1))
        return DenseObs(
            valid=self.valid, cP=None, I=self.I, z=jnp.where(self.valid, z, 0.0)
        )


# Projection dispatch ("none" = exact pinhole path, else distorted; see
# ops/distortion.py) — shared with viz/store, aliased for local use.
_unproject_any = distortion_ops.unproject_any
_project_any = distortion_ops.project_any


def _trunc_px(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integer-truncate float pixel coords toward zero (torch .long()
    parity, sfm.py:116), mapping non-finite values to NO_MATCH (torch
    turns them into huge negatives that the bounds mask rejects)."""
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    # Clamp before the f32->i32 convert: XLA's conversion of values outside
    # int32 range is implementation-defined, so keep inputs in a safe range.
    xs = jnp.clip(jnp.where(finite, x, -1.0), -2.0e9, 2.0e9)
    ys = jnp.clip(jnp.where(finite, y, -1.0), -2.0e9, 2.0e9)
    return xs.astype(jnp.int32), ys.astype(jnp.int32)


def _offset_grid(H: int, W: int, origin):
    """Integer pixel grid, shifted to GLOBAL coordinates when matching a
    rectangle slice of the target (origin = (row0, col0), traced int32 —
    offsets don't retrace). Integer adds keep every downstream float op
    bit-identical to the full-grid program on the covered pixels, which
    a cx/cy shift would not (different f32 rounding, and trunc-toward-
    zero false positives at the slice boundary)."""
    u1, v1 = pixel_grid(H, W)
    if origin is not None:
        v1 = v1 + origin[0].astype(jnp.int32)
        u1 = u1 + origin[1].astype(jnp.int32)
    return u1, v1


def _split_tags(dist_model) -> tuple[str, str]:
    """Normalize a distortion tag into per-camera static tags.

    A plain string applies to BOTH cameras (the common one-rig case,
    keeping every existing trace signature intact); a ``(tag1, tag2)``
    tuple gives camera 1 (the target) and camera 2 (the view) their own
    models — the mixed-rig case (e.g. a fisheye navigation camera and a
    pinhole documentation camera in one COLMAP reconstruction), which a
    single joint tag cannot express because the zero-parameter fisheye
    map is not the identity. Tuples are hashable, so they ride the same
    ``static_argnames`` plumbing as the strings."""
    if isinstance(dist_model, tuple):
        return dist_model
    return dist_model, dist_model


def _forward_projection(
    depth1: jnp.ndarray,  # (H, W) target depth, meters
    intr1: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    intr2: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    origin=None,  # (2,) i32 (row0, col0) of a target rectangle slice
    dist1=None,  # (8,) canonical distortion vectors (ops/distortion.py)
    dist2=None,
    dist_model: str | tuple[str, str] = "none",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous forward reprojection of every target pixel into view 2
    — the shared geometry block (target pixel -> world -> view-2 pixel
    candidate). Returns float coordinates (x2, y2)."""
    H, W = depth1.shape
    tag1, tag2 = _split_tags(dist_model)
    u1, v1 = _offset_grid(H, W, origin)
    cP1 = _unproject_any(intr1, dist1, tag1, u1, v1, depth1)
    wP1 = transform_points(R1, t1, cP1)
    R2i, t2i = pose_inverse(R2, t2)
    return _project_any(intr2, dist2, tag2, transform_points(R2i, t2i, wP1))


def _match_pair_core(
    depth1: jnp.ndarray,  # (H, W) target depth, meters, 0/neg = invalid
    intr1: jnp.ndarray,  # (4,) fx fy cx cy
    R1: jnp.ndarray,  # (3, 3) cam->world
    t1: jnp.ndarray,  # (3,)
    shape2: tuple[int, int],  # (H2, W2)
    intr2: jnp.ndarray,  # (4,)
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    fetch,  # (v2s, u2s) -> (d2 f32 meters, I colors or None)
    origin=None,  # (2,) i32 (row0, col0) when depth1 is a rectangle slice
    dist1=None,  # (8,) canonical distortion vectors, None = pinhole
    dist2=None,
    dist_model: str | tuple[str, str] = "none",  # see _split_tags
) -> tuple[PairMatch, jnp.ndarray, jnp.ndarray | None]:
    """The two-way-consistency geometry shared by every matching variant
    (parity-critical: reference sfm.py:115-175 semantics). The only
    degree of freedom is how view 2's per-pixel record is fetched at the
    candidate coordinates — one packed gather or separate depth/color
    gathers (see module doc). With ``origin``, depth1 is a rectangle
    slice of the target and all pixel coordinates are GLOBAL — outputs
    are bit-identical to the full-grid program restricted to the slice.
    Returns (match, cP2 masked, I masked)."""
    H, W = depth1.shape
    H2, W2 = shape2

    u1, v1 = _offset_grid(H, W, origin)
    valid1 = depth1 > 0

    # Forward: target pixel -> world -> view-2 pixel candidate q2
    x2, y2 = _forward_projection(
        depth1, intr1, R1, t1, intr2, R2, t2, origin,
        dist1=dist1, dist2=dist2, dist_model=dist_model,
    )
    u2, v2 = _trunc_px(x2, y2)
    inb2 = (u2 >= 0) & (u2 < W2) & (v2 >= 0) & (v2 < H2)

    u2s = jnp.where(inb2, u2, 0)
    v2s = jnp.where(inb2, v2, 0)
    d2, I = fetch(v2s, u2s)
    valid2 = inb2 & (d2 > 0)

    # Reverse: view-2 candidate pixel -> world -> back into target view
    tag1, tag2 = _split_tags(dist_model)
    cP2 = _unproject_any(intr2, dist2, tag2, u2s, v2s, d2)
    wP2 = transform_points(R2, t2, cP2)
    R1i, t1i = pose_inverse(R1, t1)
    x1b, y1b = _project_any(intr1, dist1, tag1,
                            transform_points(R1i, t1i, wP2))
    u1b, v1b = _trunc_px(x1b, y1b)
    consistent = (u1b == u1) & (v1b == v1)

    valid = valid1 & valid2 & consistent
    match = PairMatch(
        u2=jnp.where(valid, u2, NO_MATCH),
        v2=jnp.where(valid, v2, NO_MATCH),
        d2=jnp.where(valid, d2, 0.0),
        valid=valid,
    )
    cP = jnp.where(valid[..., None], cP2, 0.0)
    if I is not None:
        I = jnp.where(valid[..., None], I, jnp.zeros((), I.dtype))
    return match, cP, I


def match_pair(
    depth1: jnp.ndarray,  # (H, W) target depth, meters, 0/neg = invalid
    intr1: jnp.ndarray,  # (4,) fx fy cx cy
    R1: jnp.ndarray,  # (3, 3) cam->world
    t1: jnp.ndarray,  # (3,)
    depth2: jnp.ndarray,  # (H2, W2) other view depth
    intr2: jnp.ndarray,  # (4,)
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    origin=None,
    dist1=None,
    dist2=None,
    dist_model: str = "none",
) -> PairMatch:
    """Two-way-consistent dense matching of one view pair (see module doc)."""
    match, _, _ = _match_pair_core(
        depth1, intr1, R1, t1, depth2.shape, intr2, R2, t2,
        fetch=lambda v2s, u2s: (depth2[v2s, u2s], None),
        origin=origin, dist1=dist1, dist2=dist2, dist_model=dist_model,
    )
    return match


def pair_observation(
    match: PairMatch,
    intr2: jnp.ndarray,  # (4,)
    rgb2: jnp.ndarray,  # (H2, W2, 3) float32
    dist2=None,
    dist_model: str | tuple[str, str] = "none",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract (cP, I) for a matched pair, dense on the target grid.

    cP = view-2-frame 3D point of the matched pixel (unproject at integer
    pixel center + its depth; parity loader.py:103-118); I = view-2 color
    at the matched pixel, nearest-pixel gather (parity loader.py:78-87).
    Invalid entries are zero-filled.
    """
    u2s = jnp.maximum(match.u2, 0)
    v2s = jnp.maximum(match.v2, 0)
    cP = _unproject_any(intr2, dist2, _split_tags(dist_model)[1], u2s, v2s, match.d2)
    I = rgb2[v2s, u2s]  # native dtype gather (u8 stays u8)
    cP = jnp.where(match.valid[..., None], cP, jnp.zeros((), jnp.float32))
    I = jnp.where(match.valid[..., None], I, jnp.zeros((), I.dtype))
    return cP, I


def bilinear_observation(
    depth1: jnp.ndarray,  # (H, W) f32 target depth
    intr1: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    rgb2: jnp.ndarray,  # (H2, W2, 3) u8 or f32
    intr2: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    match: PairMatch,
    origin=None,
    dist1=None,
    dist2=None,
    dist_model: str = "none",
    shape2: tuple[int, int] | None = None,
    sample=None,  # (y, x) -> (..., 3) f32; default indexes rgb2
) -> jnp.ndarray:
    """Bilinear color sampling at the continuous reprojection — the
    flagged quality upgrade over the reference's nearest-pixel gather
    (loader.py:87). The forward projection is recomputed (pure vector
    math, no gathers); colors interpolate between the four neighboring
    pixel centers (projection coords follow the +0.5 center convention),
    clamped at borders. Returns (H, W, 3) f32 in [0, 1], zero at invalid
    matches. Geometry/validity are untouched — only the observed color
    changes, so fits keep the exact reference observation sets.
    ``sample``/``shape2`` let the flat-index survey path (see
    match_survey_indexed) supply its own neighbor gather; rgb2 is then
    unused (pass None)."""
    if rgb2 is not None:
        shape2 = rgb2.shape[:2]
        rgb2f = to_f32_rgb(rgb2)
        sample = lambda y, x: rgb2f[y, x]
    H2, W2 = shape2
    # same shared geometry block the consistency check trunc-samples
    x2, y2 = _forward_projection(depth1, intr1, R1, t1, intr2, R2, t2, origin,
                                 dist1=dist1, dist2=dist2, dist_model=dist_model)

    # center-based coords: pixel (u, v)'s center is at (u + 0.5, v + 0.5)
    xs = jnp.clip(jnp.where(jnp.isfinite(x2), x2, 0.0) - 0.5, 0.0, W2 - 1.0)
    ys = jnp.clip(jnp.where(jnp.isfinite(y2), y2, 0.0) - 0.5, 0.0, H2 - 1.0)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1p = jnp.minimum(x0 + 1, W2 - 1)
    y1p = jnp.minimum(y0 + 1, H2 - 1)
    fx = (xs - x0.astype(jnp.float32))[..., None]
    fy = (ys - y0.astype(jnp.float32))[..., None]

    c00 = sample(y0, x0)
    c01 = sample(y0, x1p)
    c10 = sample(y1p, x0)
    c11 = sample(y1p, x1p)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    I = top * (1.0 - fy) + bot * fy
    return jnp.where(match.valid[..., None], I, 0.0)


def _pack_view_records(depths_u16: jnp.ndarray, rgbs_u8: jnp.ndarray) -> jnp.ndarray:
    """Pack each view pixel's record — u16 millimeter depth + u8 RGB —
    into (..., 2) uint32 words so the matching stage performs ONE random
    gather per pixel-pair instead of two (depth + color). The gather is
    the cost center of matching on TPU (latency-bound, ~80M elems/s);
    halving the gather count measures ~2.2x end-to-end on the survey
    matching program. Packing is lossless: the sources are exactly the
    decoded u16/u8 arrays."""
    d = depths_u16.astype(jnp.uint32)
    r = rgbs_u8[..., 0].astype(jnp.uint32)
    g = rgbs_u8[..., 1].astype(jnp.uint32)
    b = rgbs_u8[..., 2].astype(jnp.uint32)
    return jnp.stack([d | (r << 16) | (g << 24), b], axis=-1)


def _unpack_record(rec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of ``_pack_view_records`` on gathered (..., 2) u32 words:
    (d2 f32 meters, I (..., 3) u8). The ONE decoder both gather forms
    share — a layout change must touch only _pack_view_records and
    this."""
    w0, w1 = rec[..., 0], rec[..., 1]
    d2 = (w0 & jnp.uint32(0xFFFF)).astype(jnp.float32) / 1000.0
    I = jnp.stack(
        [
            ((w0 >> 16) & jnp.uint32(0xFF)).astype(jnp.uint8),
            ((w0 >> 24) & jnp.uint32(0xFF)).astype(jnp.uint8),
            (w1 & jnp.uint32(0xFF)).astype(jnp.uint8),
        ],
        axis=-1,
    )
    return d2, I


def _match_observe_pair_packed(
    depth1: jnp.ndarray,  # (H, W) f32 meters
    intr1: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    packed2: jnp.ndarray,  # (H2, W2, 2) u32 packed records
    intr2: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    origin=None,
    dist1=None,
    dist2=None,
    dist_model: str = "none",
) -> tuple[PairMatch, jnp.ndarray, jnp.ndarray]:
    """match_pair + pair_observation fused over the packed record table:
    identical outputs (d2 = u16mm -> f32/1000 commutes with the gather;
    colors stay exact u8), one gather instead of two."""

    def fetch(v2s, u2s):
        return _unpack_record(packed2[v2s, u2s])  # the ONE gather

    return _match_pair_core(
        depth1, intr1, R1, t1, packed2.shape[:2], intr2, R2, t2, fetch,
        origin=origin, dist1=dist1, dist2=dist2, dist_model=dist_model,
    )


def _is_raw_views(depths2: jnp.ndarray, rgbs2: jnp.ndarray) -> bool:
    """The packed fast path needs the EXACT decoded integer dtypes
    (u16 mm depth, u8 RGB): _pack_view_records stores d | (r << 16), so
    wider integers (e.g. int32 mm from a custom loader, values past
    65535 or negative) would silently collide with the color bits —
    they take the generic two-gather path instead, like resized
    (image_scale != 1) float inputs."""
    return depths2.dtype == jnp.uint16 and rgbs2.dtype == jnp.uint8


def to_f32_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Raw uint16 millimeter depth -> float32 meters (no-op on float input).

    Keeping depth uint16 until it reaches the device cuts H2D traffic 2x;
    the /1000 conversion (loader.py:166-170 parity) fuses into the kernel.
    """
    if jnp.issubdtype(depth.dtype, jnp.integer):
        return depth.astype(jnp.float32) / 1000
    return depth


def to_f32_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """Raw uint8 RGB -> float32 in [0, 1] (no-op on float input); /255
    parity with loader.py:156-163, fused on device (4x less H2D)."""
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return rgb.astype(jnp.float32) / 255
    return rgb


def match_and_observe_chunk(
    depth1: jnp.ndarray,  # (H, W) f32 meters or u16 mm
    intr1: jnp.ndarray,  # (4,)
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    depths2: jnp.ndarray,  # (V, H2, W2) f32 meters or u16 mm
    rgbs2: jnp.ndarray,  # (V, H2, W2, 3) f32 [0,1] or u8
    intrs2: jnp.ndarray,  # (V, 4)
    Rs2: jnp.ndarray,  # (V, 3, 3)
    ts2: jnp.ndarray,  # (V, 3)
    compact: bool = False,
    bilinear: bool = False,
    origin: jnp.ndarray | None = None,  # (2,) i32 (row0, col0) slice origin
    t_dist: jnp.ndarray | None = None,  # (8,) target distortion vector
    v_dists: jnp.ndarray | None = None,  # (V, 8) view distortion vectors
    # static tag; "none" = exact pinhole program; a (target_tag, view_tag)
    # tuple gives each camera side its own lens model (mixed rigs)
    dist_model: str | tuple[str, str] = "none",
) -> tuple[DenseObs, PairMatch]:
    """Match the target against a chunk of V views and build the dense
    observation stack — the jit unit of the matching stage (vmapped over
    the view axis; one compile per (V, H, W, H2, W2) shape bucket).

    Accepts raw integer image dtypes (u8 RGB / u16 depth) and converts on
    device, minimizing host->device traffic. ``compact=True`` emits the
    z-only observation layout (see DenseObs) with I kept in its source
    dtype — the no-light fit fast path. Raw integer inputs take the
    packed single-gather path (see _pack_view_records).
    ``bilinear=True`` swaps the nearest-pixel color gather for bilinear
    sampling at the continuous reprojection (matches/geometry unchanged).
    ``origin`` marks depth1 as a rectangle slice of the target starting at
    global pixel (row0, col0) — the tile-cull path; traced, so varying
    offsets share one compile per slice SHAPE, and results are
    bit-identical to the full-grid program on the covered pixels.
    """
    depth1 = to_f32_depth(depth1)
    # Distortion threads through as trailing vmapped *extra args so the
    # "none" path's traced signature (and its committed compile-cache
    # entries) stays byte-identical to the pinhole-only program. The
    # view-side vector stack rides only when the VIEW side is distorted.
    extra = () if _split_tags(dist_model)[1] == "none" else (v_dists,)

    def _d2(d2tail):
        return d2tail[0] if d2tail else None

    if _is_raw_views(depths2, rgbs2):
        packed = _pack_view_records(depths2, rgbs2)

        def one(pk, intr2, R2, t2, *d2):
            return _match_observe_pair_packed(
                depth1, intr1, R1, t1, pk, intr2, R2, t2, origin=origin,
                dist1=t_dist, dist2=_d2(d2), dist_model=dist_model,
            )

        m, cP, I = jax.vmap(one)(packed, intrs2, Rs2, ts2, *extra)
        if bilinear:
            pass  # replaced below
        elif not compact:
            I = to_f32_rgb(I)
    else:
        depths2 = to_f32_depth(depths2)

        def one(depth2, rgb2, intr2, R2, t2, *d2):
            m = match_pair(depth1, intr1, R1, t1, depth2, intr2, R2, t2,
                           origin=origin, dist1=t_dist, dist2=_d2(d2),
                           dist_model=dist_model)
            cP, I = pair_observation(m, intr2,
                                     rgb2 if compact else to_f32_rgb(rgb2),
                                     dist2=_d2(d2), dist_model=dist_model)
            return m, cP, I

        m, cP, I = jax.vmap(one)(depths2, rgbs2, intrs2, Rs2, ts2, *extra)
    if bilinear:
        def one_bi(rgb2, intr2, R2, t2, m_v, *d2):
            return bilinear_observation(
                depth1, intr1, R1, t1, rgb2, intr2, R2, t2, m_v,
                origin=origin, dist1=t_dist, dist2=_d2(d2),
                dist_model=dist_model,
            )

        I = jax.vmap(one_bi)(rgbs2, intrs2, Rs2, ts2, m, *extra)
    obs = DenseObs(valid=m.valid, cP=cP, I=I)
    if compact:
        obs = obs.compact()
    return obs, m


match_and_observe_chunk_jit = jax.jit(
    match_and_observe_chunk, static_argnames=("compact", "bilinear", "dist_model")
)


def _min_cover_mask(valid: jnp.ndarray, area: jnp.ndarray, min_cover) -> jnp.ndarray:
    """Zero out whole pairs below the coverage threshold (parity:
    sfm.py:136 keeps pairs with count/area > min_cover)."""
    counts = valid.sum(axis=(1, 2)).astype(jnp.float32)
    keep = (counts / area) > min_cover
    return valid & keep[:, None, None]


@partial(jax.jit, static_argnames=("compact", "bilinear", "dist_model"))
def match_survey_per_target(
    t_depths: jnp.ndarray,  # (T, H, W)
    t_intrs: jnp.ndarray,  # (T, 4)
    t_Rs: jnp.ndarray,  # (T, 3, 3)
    t_ts: jnp.ndarray,  # (T, 3)
    v_depths: jnp.ndarray,  # (T, V, H2, W2) PER-TARGET view tables
    v_rgbs: jnp.ndarray,  # (T, V, H2, W2, 3)
    v_intrs: jnp.ndarray,  # (T, V, 4)
    v_Rs: jnp.ndarray,  # (T, V, 3, 3)
    v_ts: jnp.ndarray,  # (T, V, 3)
    min_cover: jnp.ndarray,
    compact: bool = True,
    bilinear: bool = False,
    area: jnp.ndarray | None = None,
    t_dists: jnp.ndarray | None = None,  # (T, 8)
    v_dists: jnp.ndarray | None = None,  # (T, V, 8)
    dist_model: str | tuple[str, str] = "none",
) -> DenseObs:
    """``match_survey`` with PER-TARGET view tables: target t matches
    only ITS V views (each target's surviving views gathered into row t,
    padding short lists with all-zero views => no matches).

    Since round 5 the pipeline routes this case through
    ``match_survey_indexed`` (same semantics, no table copies); this
    form remains as the independently-structured equality ORACLE the
    indexed program is tested against (test_matching / test_properties)
    and as API for callers holding materialized tables.

    This is the single-dispatch form of per-target culling: on
    partial-overlap surveys the shared-table program must carry the
    UNION of every target's surviving views (T x V_union pairs), while
    the chunked path's per-(target, chunk) rectangles pay a host-driven
    dispatch chain per batch — ruinous on high-latency links. Here pairs
    drop to T x max_t(V_t) with exactly ONE device program and no host
    round trips, and the fit consumes the compacted (T, V_max) stack
    directly. Output identical to the shared-table program on the
    common views (the gather just reorders the view axis per target).
    """
    def one(d1, intr1, R1, t1, vd, vr, vi, vR, vt, td, vd8, ar):
        obs = match_survey(
            d1[None], intr1[None], R1[None], t1[None], vd, vr, vi, vR, vt,
            min_cover, compact=compact, bilinear=bilinear, area=ar,
            t_dists=None if td is None else td[None], v_dists=vd8,
            dist_model=dist_model,
        )
        return jax.tree.map(lambda x: x[0], obs)

    # A per-target (T,) area vmaps alongside the targets; a scalar (or
    # None -> H*W default inside match_survey) is shared across them.
    area_axis = 0 if area is not None and jnp.ndim(area) == 1 else None
    in_axes = (0,) * 9 + (
        None if t_dists is None else 0,
        None if v_dists is None else 0,
        area_axis,
    )
    return jax.vmap(one, in_axes=in_axes)(
        t_depths, t_intrs, t_Rs, t_ts,
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        t_dists, v_dists, area,
    )


@partial(jax.jit, static_argnames=("compact", "bilinear", "dist_model"))
def match_survey_indexed(
    t_depths: jnp.ndarray,  # (T, H, W)
    t_intrs: jnp.ndarray,  # (T, 4)
    t_Rs: jnp.ndarray,  # (T, 3, 3)
    t_ts: jnp.ndarray,  # (T, 3)
    v_depths: jnp.ndarray,  # (V, H2, W2) SHARED resident view stack
    v_rgbs: jnp.ndarray,  # (V, H2, W2, 3)
    v_intrs: jnp.ndarray,  # (V, 4)
    v_Rs: jnp.ndarray,  # (V, 3, 3)
    v_ts: jnp.ndarray,  # (V, 3)
    view_idx: jnp.ndarray,  # (T, S) int32 view ids; >= V marks a pad slot
    min_cover: jnp.ndarray,
    compact: bool = True,
    bilinear: bool = False,
    area: jnp.ndarray | None = None,  # scalar or per-target (T,)
    t_dists: jnp.ndarray | None = None,  # (T, 8)
    v_dists: jnp.ndarray | None = None,  # (V, 8)
    dist_model: str | tuple[str, str] = "none",
) -> DenseObs:
    """Per-target-culled survey matching WITHOUT per-target table copies:
    target t matches views ``view_idx[t]`` by gathering records from the
    SHARED stack at flat index ``vid*H2*W2 + v2*W2 + u2``.

    Semantically identical to ``match_survey_per_target`` fed tables
    gathered with the same ids (the fix for its measured 1.29x intrinsic
    overhead at identical shapes: the (T, S, H2, W2) table materialization
    plus T-times-repacked records — here the packed u32x2 table is built
    ONCE over the resident stack and the per-pair view id just offsets the
    one gather per pixel-pair, which is the whole cost of matching).
    Pad slots (id >= V) produce no matches. Caller must keep
    V*H2*W2 < 2**31 (int32 flat index) — the pipeline routes larger
    stacks elsewhere.
    """
    t_depths = to_f32_depth(t_depths)
    T, H, W = t_depths.shape
    V, H2, W2 = v_depths.shape[:3]
    area = jnp.float32(H * W) if area is None else jnp.asarray(area, jnp.float32)
    if area.ndim == 0:
        area = jnp.broadcast_to(area, (T,))

    raw = _is_raw_views(v_depths, v_rgbs)
    if raw:
        flat = _pack_view_records(v_depths, v_rgbs).reshape(V * H2 * W2, 2)
    else:
        v_depths = to_f32_depth(v_depths)
        d_flat = v_depths.reshape(V * H2 * W2)
        rgb_flat = v_rgbs.reshape(V * H2 * W2, v_rgbs.shape[-1])
    if bilinear:
        rgbf_flat = to_f32_rgb(v_rgbs).reshape(V * H2 * W2, v_rgbs.shape[-1])

    tag1, tag2 = _split_tags(dist_model)
    t_extra = () if tag1 == "none" else (t_dists,)

    ok = view_idx < V  # (T, S)
    vids = jnp.clip(view_idx, 0, V - 1)
    p_intrs = v_intrs[vids]  # (T, S, 4) — tiny parameter gathers
    p_Rs = v_Rs[vids]
    p_ts = v_ts[vids]
    base = vids.astype(jnp.int32) * jnp.int32(H2 * W2)  # (T, S)
    v_extra = () if tag2 == "none" else (v_dists[vids],)

    def _one(tail):
        return tail[0] if tail else None

    def one_target(d1, intr1, R1, t1, intr2s, R2s, t2s, bases, oks, *tail):
        dist1 = tail[0] if t_extra else None
        d2s = tail[-1] if v_extra else None
        pair_extra = (d2s,) if v_extra else ()

        def one_pair(intr2, R2, t2, b, okp, *d2tail):
            dist2 = _one(d2tail)

            def fetch(v2s, u2s):
                idx = b + v2s * jnp.int32(W2) + u2s
                if raw:
                    return _unpack_record(flat[idx])
                return d_flat[idx], rgb_flat[idx]

            m, cP, I = _match_pair_core(
                d1, intr1, R1, t1, (H2, W2), intr2, R2, t2, fetch,
                dist1=dist1, dist2=dist2, dist_model=dist_model,
            )
            if bilinear:
                I = bilinear_observation(
                    d1, intr1, R1, t1, None, intr2, R2, t2, m,
                    dist1=dist1, dist2=dist2, dist_model=dist_model,
                    shape2=(H2, W2),
                    sample=lambda y, x: rgbf_flat[b + y * jnp.int32(W2) + x],
                )
            valid = m.valid & okp
            return valid, cP, I

        valid, cP, I = jax.vmap(one_pair)(
            intr2s, R2s, t2s, bases, oks, *pair_extra
        )
        return valid, cP, I

    in_axes = (0,) * 9 + (0,) * len(t_extra) + (0,) * len(v_extra)
    valid, cP, I = jax.vmap(one_target, in_axes=in_axes)(
        t_depths, t_intrs, t_Rs, t_ts, p_intrs, p_Rs, p_ts, base, ok,
        *t_extra, *v_extra,
    )
    valid = jax.vmap(_min_cover_mask, in_axes=(0, 0, None))(
        valid, area, min_cover
    )
    I = jnp.where(valid[..., None], I, jnp.zeros((), I.dtype))
    obs = DenseObs(valid=valid, cP=jnp.where(valid[..., None], cP, 0.0), I=I)
    if compact:
        obs = obs.compact()
    return obs


@partial(jax.jit, static_argnames=("compact", "bilinear", "dist_model"))
def match_survey(
    t_depths: jnp.ndarray,  # (T, H, W) target depths, f32 m or u16 mm
    t_intrs: jnp.ndarray,  # (T, 4)
    t_Rs: jnp.ndarray,  # (T, 3, 3)
    t_ts: jnp.ndarray,  # (T, 3)
    v_depths: jnp.ndarray,  # (V, H2, W2) view depths (device-resident stack)
    v_rgbs: jnp.ndarray,  # (V, H2, W2, 3)
    v_intrs: jnp.ndarray,  # (V, 4)
    v_Rs: jnp.ndarray,  # (V, 3, 3)
    v_ts: jnp.ndarray,  # (V, 3)
    min_cover: jnp.ndarray,  # scalar
    compact: bool = True,
    bilinear: bool = False,
    area: jnp.ndarray | None = None,  # true target pixel count; defaults
    # to H*W — pass the UNPADDED count when the target grid was padded
    # (padded rows have no valid pixels but would inflate the min-cover
    # denominator)
    t_dists: jnp.ndarray | None = None,  # (T, 8) target distortion vectors
    v_dists: jnp.ndarray | None = None,  # (V, 8) view distortion vectors
    # static tag; "none" = exact pinhole program; a (target_tag, view_tag)
    # tuple gives each camera side its own lens model (mixed rigs)
    dist_model: str | tuple[str, str] = "none",
) -> DenseObs:
    """The WHOLE matching stage as one device program: T targets x V
    views -> the (T, V, H, W) observation stack, min-cover filtering
    applied as a per-pair validity mask.

    Masking dropped pairs is mathematically identical to removing them
    (their observations contribute nothing to the fit and n_obs counts
    only valid entries) — so no host round-trip, no dynamic shapes, no
    per-chunk dispatch chain. Use for in-memory pipelines over a uniform
    camera bucket; the chunked path remains for the HDF5 cache (which
    needs packed per-pair arrays) and heterogeneous buckets.
    """
    t_depths = to_f32_depth(t_depths)
    T, H, W = t_depths.shape
    area = jnp.float32(H * W) if area is None else jnp.asarray(area, jnp.float32)

    raw = _is_raw_views(v_depths, v_rgbs)
    if raw:
        # packed once per program; XLA hoists it above the target vmap
        packed = _pack_view_records(v_depths, v_rgbs)
    else:
        v_depths = to_f32_depth(v_depths)

    # Distortion joins both vmap levels as trailing *extra args so the
    # "none" trace (and its committed compile cache) stays identical.
    # Each side's vector stack rides only when that side is distorted.
    _tag1, _tag2 = _split_tags(dist_model)
    t_extra = () if _tag1 == "none" else (t_dists,)
    v_extra = () if _tag2 == "none" else (v_dists,)

    def _one(tail):
        return tail[0] if tail else None

    def one_target(d1, intr1, R1, t1, *d1tail):
        dist1 = _one(d1tail)
        if raw:
            def one_view(pk, rgb2, intr2, R2, t2, *d2):
                m, cP, I = _match_observe_pair_packed(
                    d1, intr1, R1, t1, pk, intr2, R2, t2,
                    dist1=dist1, dist2=_one(d2), dist_model=dist_model,
                )
                if bilinear:
                    I = bilinear_observation(
                        d1, intr1, R1, t1, rgb2, intr2, R2, t2, m,
                        dist1=dist1, dist2=_one(d2), dist_model=dist_model,
                    )
                return m.valid, cP, I

            valid, cP, I = jax.vmap(one_view)(
                packed, v_rgbs, v_intrs, v_Rs, v_ts, *v_extra
            )
            return _min_cover_mask(valid, area, min_cover), cP, I

        def one_view(depth2, rgb2, intr2, R2, t2, *d2):
            m = match_pair(d1, intr1, R1, t1, depth2, intr2, R2, t2,
                           dist1=dist1, dist2=_one(d2), dist_model=dist_model)
            cP, I = pair_observation(m, intr2, rgb2,
                                     dist2=_one(d2), dist_model=dist_model)
            if bilinear:
                I = bilinear_observation(
                    d1, intr1, R1, t1, rgb2, intr2, R2, t2, m,
                    dist1=dist1, dist2=_one(d2), dist_model=dist_model,
                )
            return m.valid, cP, I

        valid, cP, I = jax.vmap(one_view)(
            v_depths, v_rgbs, v_intrs, v_Rs, v_ts, *v_extra
        )
        return _min_cover_mask(valid, area, min_cover), cP, I

    valid, cP, I = jax.vmap(one_target)(t_depths, t_intrs, t_Rs, t_ts, *t_extra)
    I = jnp.where(valid[..., None], I, jnp.zeros((), I.dtype))
    obs = DenseObs(valid=valid, cP=jnp.where(valid[..., None], cP, 0.0), I=I)
    if compact:
        obs = obs.compact()  # shape-agnostic: one z-derivation everywhere
    return obs
