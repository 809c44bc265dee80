"""Hypothesis property tests: randomized breadth over the fixed-seed
unit tests for the contracts the pipeline leans on hardest —
SE(3) exponential structure, pinhole roundtrips, and the tile-cull
origin-slice bit-identity over arbitrary rectangles/geometry.

Example counts are kept small (the whole file must stay in suite
budget); deadline=None because first-trace JIT time would trip
per-example deadlines."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sucre_tpu.ops import pose_inverse, project, se3_exp, transform_points, unproject
from sucre_tpu.ops.matching import match_and_observe_chunk_jit
from sucre_tpu.ops.pinhole import Intrinsics

finite = dict(allow_nan=False, allow_infinity=False, width=32)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-3.0, 3.0, **finite), min_size=6, max_size=6))
def test_se3_exp_is_rigid(twist):
    """exp of any twist yields a proper rotation (R^T R = I, det = 1)
    and exp(-v) inverts exp(v) — the solver updates poses through this
    map, so a non-rigid output would silently corrupt geometry."""
    v = jnp.asarray(twist, jnp.float32)
    R, t = se3_exp(v)
    R = np.asarray(R, np.float64)
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5
    Ri, ti = se3_exp(-v)
    np.testing.assert_allclose(np.asarray(Ri) @ R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(Ri) @ np.asarray(t, np.float64) + np.asarray(ti),
        np.zeros(3), atol=1e-4,
    )


@settings(max_examples=30, deadline=None)
@given(
    st.floats(20.0, 2000.0, **finite),  # fx
    st.floats(20.0, 2000.0, **finite),  # fy
    st.floats(-5.0, 5.0, **finite),     # cx offset from center
    st.floats(-5.0, 5.0, **finite),     # cy offset
    st.floats(0.125, 50.0, **finite),   # depth (0.125 is f32-exact)
    st.integers(0, 99), st.integers(0, 79),
)
def test_project_unproject_roundtrip(fx, fy, dcx, dcy, depth, u, v):
    """unproject -> project returns the original +0.5-center pixel
    coordinate for ANY pinhole intrinsics and depth (the matching
    stage's forward/backward consistency rests on this identity)."""
    intr = Intrinsics(fx, fy, 50.0 + dcx, 40.0 + dcy)
    cP = unproject(intr, jnp.float32(u), jnp.float32(v), jnp.float32(depth))
    x, y = project(intr, cP)
    np.testing.assert_allclose(float(x), u + 0.5, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(y), v + 0.5, rtol=2e-4, atol=2e-3)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(-0.5, 0.5, **finite), min_size=6, max_size=6))
def test_pose_inverse_roundtrip(twist):
    R, t = se3_exp(jnp.asarray(twist, jnp.float32))
    Ri, ti = pose_inverse(R, t)
    p = jnp.asarray([0.3, -1.2, 2.5], jnp.float32)
    q = transform_points(Ri, ti, transform_points(R, t, p))
    np.testing.assert_allclose(np.asarray(q), np.asarray(p), atol=1e-4)


# One fixed pair of views for the slice property: hypothesis varies the
# RECTANGLE, which is the contract under test (traced origins must be
# bit-identical for every slice placement, including trunc borderline
# pixels at slice edges). Scene built once at import-trace time.
_H, _W = 40, 56


def _slice_scene():
    r = np.random.default_rng(7)
    base = 2.0 + 0.4 * np.sin(np.linspace(0, 3, _W))[None, :] + 0.3 * np.cos(
        np.linspace(0, 2, _H)
    )[:, None]
    d1 = base.astype(np.float32)
    d1[r.uniform(size=(_H, _W)) < 0.1] = 0.0
    d2 = (base + 0.03 * r.standard_normal((_H, _W))).astype(np.float32)
    rgb2 = r.uniform(0, 1, (_H, _W, 3)).astype(np.float32)
    intr = np.array([30.0, 30.0, _W / 2, _H / 2], np.float32)
    c, s = np.cos(0.05), np.sin(0.05)
    R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t2 = np.array([0.2, -0.1, 0.02], np.float32)
    args2 = (
        jnp.asarray(d2)[None], jnp.asarray(rgb2)[None],
        jnp.asarray(intr)[None],
        jnp.asarray(R2)[None], jnp.asarray(t2)[None],
    )
    full_obs, full_m = match_and_observe_chunk_jit(
        jnp.asarray(d1), jnp.asarray(intr),
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.asarray(np.zeros(3, np.float32)),
        *args2, compact=False,
    )
    return d1, intr, args2, full_obs, full_m


_SCENE = None


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, _H - 8), st.integers(8, _H),
    st.integers(0, _W - 8), st.integers(8, _W),
)
def test_origin_slice_bit_identical_any_rect(r0, r1, c0, c1):
    global _SCENE
    if _SCENE is None:
        _SCENE = _slice_scene()
    d1, intr, args2, full_obs, full_m = _SCENE
    r1 = max(r1, r0 + 8)
    c1 = max(c1, c0 + 8)
    r1 = min(r1, _H)
    c1 = min(c1, _W)

    sl_obs, sl_m = match_and_observe_chunk_jit(
        jnp.asarray(d1[r0:r1, c0:c1]), jnp.asarray(intr),
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.asarray(np.zeros(3, np.float32)),
        *args2, compact=False,
        origin=jnp.asarray([r0, c0], jnp.int32),
    )
    np.testing.assert_array_equal(
        np.asarray(sl_m.valid[0]), np.asarray(full_m.valid[0, r0:r1, c0:c1])
    )
    np.testing.assert_array_equal(
        np.asarray(sl_obs.cP[0]), np.asarray(full_obs.cP[0, r0:r1, c0:c1])
    )


_IDX_SCENE = None


def _indexed_scene():
    rng = np.random.default_rng(21)
    V, H, W = 6, 24, 32
    depth_mm = (
        rng.uniform(1200, 3000, size=(V, H, W))
        * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(
        np.array([30.0, 30.0, W / 2, H / 2], np.float32), (V, 1)
    )
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack(
        [np.array([0.07 * k, 0.0, 0.0], np.float32) for k in range(V)]
    )
    return depth_mm, rgbs, intr, Rs, ts


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=2, max_size=8), st.data())
def test_indexed_survey_equals_tables_any_idx(row0, data):
    """Hypothesis: for ANY per-target view-id pattern — duplicates, pad
    slots (>= V), arbitrary order — the flat-index program equals the
    materialized-tables program fed the same ids."""
    from sucre_tpu.ops.matching import (
        match_survey_indexed,
        match_survey_per_target,
    )

    global _IDX_SCENE
    if _IDX_SCENE is None:
        _IDX_SCENE = _indexed_scene()
    depth_mm, rgbs, intr, Rs, ts = _IDX_SCENE
    V = depth_mm.shape[0]
    S = len(row0)
    row1 = data.draw(
        st.lists(st.integers(0, 7), min_size=S, max_size=S)
    )
    idx = np.asarray([row0, row1], np.int32)  # 6/7 act as pad sentinels
    j = jnp.asarray
    targs = (j(depth_mm[:2]), j(intr[:2]), j(Rs[:2]), j(ts[:2]))
    mc = jnp.float32(1e-6)

    def tables(arr):
        safe = np.concatenate(
            [arr, np.zeros_like(arr[:2])], axis=0
        )  # ids V..V+1 -> all-zero views (no matches), like pad slots
        return j(safe[np.minimum(idx, safe.shape[0] - 1)])

    obs_i = match_survey_indexed(
        *targs, j(depth_mm), j(rgbs), j(intr), j(Rs), j(ts), j(idx), mc
    )
    obs_t = match_survey_per_target(
        *targs, tables(depth_mm), tables(rgbs), tables(intr), tables(Rs),
        tables(ts), mc,
    )
    for f in ("valid", "z", "I"):
        np.testing.assert_array_equal(
            np.asarray(getattr(obs_i, f)), np.asarray(getattr(obs_t, f)),
            err_msg=f,
        )


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 500))
def test_pt_pad_views_properties(v):
    """Piecewise padding: >= max(v, 1), monotone, bounded overpad (< 2x
    for v >= 2). The probing env override is shielded (saved/restored —
    hypothesis bodies can't take the monkeypatch fixture) so a leftover
    SUCRE_PT_PAD_GRAN from a probe session can't fail unrelated runs."""
    import os

    from sucre_tpu.pipeline import _pt_pad_views

    saved = os.environ.pop("SUCRE_PT_PAD_GRAN", None)
    try:
        p = _pt_pad_views(v, 8)
        assert p >= max(v, 1)
        assert p >= _pt_pad_views(v - 1, 8) if v > 0 else True
        if v >= 2:
            assert p < 2 * v
    finally:
        if saved is not None:
            os.environ["SUCRE_PT_PAD_GRAN"] = saved


def test_pt_pad_views_shape_set_bounded(monkeypatch):
    """The distinct compiled-shape set stays small below any view cap —
    the whole point of the piecewise scheme."""
    from sucre_tpu.pipeline import _pt_pad_views

    monkeypatch.delenv("SUCRE_PT_PAD_GRAN", raising=False)
    shapes = {_pt_pad_views(k, 8) for k in range(1, 65)}
    assert len(shapes) <= 14
