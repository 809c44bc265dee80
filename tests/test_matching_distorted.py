"""Distorted-camera matching contracts (ops/matching.py + ops/distortion.py).

The reference cannot run distorted cameras at all (sfm.py:192), so there
is no side-by-side oracle here; correctness rests on (a) analytic
correspondence ground truth computed independently in f64 numpy, (b) the
identity-view invariant, and (c) bit-equality of the zero-coefficient
rational path with the pinhole program.
"""

import jax.numpy as jnp
import numpy as np

from sucre_tpu.ops import distortion as D
from sucre_tpu.ops.matching import (
    match_and_observe_chunk_jit,
    match_pair,
)

RATIONAL = np.array([-0.22, 0.05, 8e-4, -6e-4, 0.01, 0, 0, 0], np.float32)
FISHEYE = np.array([-0.04, 0.01, -0.005, 0.001, 0, 0, 0, 0], np.float32)


def _plane_depth(intr, dist, model, W, H, R, t, plane_z=3.0, slope=0.3):
    """Z-depth map of the tilted plane Z = plane_z + slope*X (world) seen
    by a distorted camera at cam->world (R=I, t). f64 ground truth."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    fx, fy, cx, cy = (float(x) for x in intr)
    xn = (u + 0.5 - cx) / fx
    yn = (v + 0.5 - cy) / fy
    xr, yr = D.undistort(model, dist.astype(np.float64), xn, yn, xp=np)
    # ray X = tx + xr*zc, Z = tz + zc; plane Z = plane_z + slope*X
    zc = (plane_z + slope * t[0] - t[2]) / (1.0 - slope * xr)
    bad = ~np.isfinite(xr)
    zc[bad] = 0.0
    return zc, xr, yr


def test_identity_view_matches_itself():
    W, H = 96, 72
    intr = np.array([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    t = np.zeros(3)
    for model, dist in [("rational", RATIONAL), ("fisheye", FISHEYE)]:
        zc, _, _ = _plane_depth(intr, dist, model, W, H, np.eye(3), t)
        d = jnp.asarray(zc, jnp.float32)
        m = match_pair(
            d, jnp.asarray(intr), jnp.eye(3), jnp.zeros(3),
            d, jnp.asarray(intr), jnp.eye(3), jnp.zeros(3),
            dist1=jnp.asarray(dist), dist2=jnp.asarray(dist), dist_model=model,
        )
        u, v = np.meshgrid(np.arange(W), np.arange(H))
        valid = np.asarray(m.valid)
        assert valid.mean() > 0.95, f"{model}: most pixels must self-match"
        np.testing.assert_array_equal(np.asarray(m.u2)[valid], u[valid])
        np.testing.assert_array_equal(np.asarray(m.v2)[valid], v[valid])


def test_cross_view_matches_analytic_correspondence():
    """Matched pixels agree with the exact f64 correspondence: the
    distorted projection of the target pixel's plane hit point."""
    W, H = 128, 96
    intr = np.array([0.85 * W, 0.85 * W, W / 2, H / 2], np.float32)
    t1 = np.array([0.0, 0.0, 0.0])
    t2 = np.array([0.4, 0.05, 0.1])
    for model, dist in [("rational", RATIONAL), ("fisheye", FISHEYE)]:
        zc1, xr1, yr1 = _plane_depth(intr, dist, model, W, H, np.eye(3), t1)
        zc2, _, _ = _plane_depth(intr, dist, model, W, H, np.eye(3), t2)
        m = match_pair(
            jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
            jnp.asarray(t1, jnp.float32),
            jnp.asarray(zc2, jnp.float32), jnp.asarray(intr), jnp.eye(3),
            jnp.asarray(t2, jnp.float32),
            dist1=jnp.asarray(dist), dist2=jnp.asarray(dist), dist_model=model,
        )
        valid = np.asarray(m.valid)
        assert valid.mean() > 0.2, f"{model}: overlapping views must match"
        # exact correspondence (f64): world hit point of each target pixel,
        # projected into view 2 through the distortion
        Pw = np.stack([t1[0] + xr1 * zc1, t1[1] + yr1 * zc1, t1[2] + zc1], -1)
        Pc2 = Pw - t2  # identity rotation
        fx, fy, cx, cy = (float(x) for x in intr)
        xd, yd = D.distort(model, dist.astype(np.float64),
                           Pc2[..., 0] / Pc2[..., 2], Pc2[..., 1] / Pc2[..., 2],
                           xp=np)
        u2_exact = fx * xd + cx
        v2_exact = fy * yd + cy
        du = np.asarray(m.u2)[valid] - np.trunc(u2_exact[valid])
        dv = np.asarray(m.v2)[valid] - np.trunc(v2_exact[valid])
        # f32 vs f64 trunc can differ by 1 at pixel boundaries; never more
        assert np.abs(du).max() <= 1 and np.abs(dv).max() <= 1
        assert (du == 0).mean() > 0.98 and (dv == 0).mean() > 0.98


def test_zero_coeff_rational_chunk_equals_pinhole():
    """dist_model='rational' with all-zero vectors reproduces the pinhole
    program: identical match sets and colors, cP within 1 ulp (the
    distorted unprojection associates the depth scaling as d*(xn) while
    the reference-parity pinhole path computes (d*(u+0.5-cx))/fx — same
    value, different f32 rounding). The ViewStack mixing rule relies on
    this embedding."""
    rng = np.random.default_rng(0)
    W, H, V = 64, 48, 3
    intr = np.array([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    d1 = (rng.uniform(2.0, 4.0, (H, W)) * (rng.uniform(size=(H, W)) > 0.1)).astype(
        np.float32
    )
    depths = (rng.uniform(2.0, 4.0, (V, H, W)) * 1000).astype(np.uint16)
    rgbs = rng.integers(0, 255, (V, H, W, 3), dtype=np.uint8)
    intrs = np.tile(intr, (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = rng.uniform(-0.2, 0.2, (V, 3)).astype(np.float32)
    zeros = np.zeros((V, 8), np.float32)

    base_obs, base_m = match_and_observe_chunk_jit(
        jnp.asarray(d1), jnp.asarray(intr), jnp.eye(3), jnp.zeros(3),
        jnp.asarray(depths), jnp.asarray(rgbs), jnp.asarray(intrs),
        jnp.asarray(Rs), jnp.asarray(ts),
    )
    dist_obs, dist_m = match_and_observe_chunk_jit(
        jnp.asarray(d1), jnp.asarray(intr), jnp.eye(3), jnp.zeros(3),
        jnp.asarray(depths), jnp.asarray(rgbs), jnp.asarray(intrs),
        jnp.asarray(Rs), jnp.asarray(ts),
        t_dist=jnp.zeros(8, jnp.float32), v_dists=jnp.asarray(zeros),
        dist_model="rational",
    )
    np.testing.assert_array_equal(np.asarray(base_m.valid), np.asarray(dist_m.valid))
    np.testing.assert_array_equal(np.asarray(base_m.u2), np.asarray(dist_m.u2))
    np.testing.assert_array_equal(np.asarray(base_m.v2), np.asarray(dist_m.v2))
    np.testing.assert_array_equal(np.asarray(base_obs.I), np.asarray(dist_obs.I))
    np.testing.assert_allclose(
        np.asarray(base_obs.cP), np.asarray(dist_obs.cP), rtol=0, atol=3e-7
    )
