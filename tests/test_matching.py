"""Matching-stage tests: identity self-match, analytic two-view scenes,
occlusion rejection, and an independent numpy oracle implementing the
reference's scatter-map algorithm (sfm.py:115-175) for equivalence."""

import jax.numpy as jnp
import numpy as np

from sucre_tpu.ops.matching import (
    NO_MATCH,
    match_and_observe_chunk_jit,
    match_pair,
    pair_observation,
)


def _intr(fx, fy, cx, cy):
    return np.array([fx, fy, cx, cy], np.float32)


def oracle_match(depth1, K1, R1, t1, depth2, K2, R2, t2):
    """Reference algorithm, independently implemented in numpy float32:
    one-way match both directions, rasterize the reverse into a match map
    (scatter), intersect (sfm.py:121-125, 171-175). Returns the set of
    (u1, v1, u2, v2) tuples."""

    def one_way(depthA, KA, RA, tA, KB, RB, tB, WB, HB):
        vA, uA = np.nonzero(depthA > 0)
        dA = depthA[vA, uA].astype(np.float32)
        hom = np.stack([uA + 0.5, vA + 0.5, np.ones_like(dA)]).astype(np.float32)
        cP = np.linalg.inv(KA).astype(np.float32) @ (dA * hom)
        wP = RA @ cP + tA[:, None]
        cpB = KB @ (RB.T @ (wP - tB[:, None]))
        px = cpB[:2] / cpB[2]
        with np.errstate(invalid="ignore"):
            q = np.trunc(px).astype(np.int64)  # toward zero, like torch .long()
        ok = (q[0] >= 0) & (q[0] < WB) & (q[1] >= 0) & (q[1] < HB)
        ok &= np.isfinite(px).all(axis=0)
        return uA[ok], vA[ok], q[0][ok], q[1][ok]

    H2, W2 = depth2.shape
    H1, W1 = depth1.shape
    m1 = one_way(depth1, K1, R1, t1, K2, R2, t2, W2, H2)
    m2 = one_way(depth2, K2, R2, t2, K1, R1, t1, W1, H1)
    # rasterize m2 into a (H2, W2, 2) map: view-2 pixel -> its view-1 match
    match_map = np.full((H2, W2, 2), -1, np.int64)
    match_map[m2[1], m2[0], 0] = m2[3]  # v
    match_map[m2[1], m2[0], 1] = m2[2]  # u
    u1, v1, u2, v2 = m1
    keep = (match_map[v2, u2, 0] == v1) & (match_map[v2, u2, 1] == u1)
    return set(zip(u1[keep].tolist(), v1[keep].tolist(), u2[keep].tolist(), v2[keep].tolist()))


def dense_to_set(match):
    """PairMatch dense arrays -> set of (u1, v1, u2, v2)."""
    valid = np.asarray(match.valid)
    v1, u1 = np.nonzero(valid)
    u2 = np.asarray(match.u2)[v1, u1]
    v2 = np.asarray(match.v2)[v1, u1]
    return set(zip(u1.tolist(), v1.tolist(), u2.tolist(), v2.tolist()))


class TestMatchPair:
    def test_self_match_identity(self):
        H, W = 12, 16
        rng = np.random.default_rng(0)
        depth = rng.uniform(1.0, 5.0, (H, W)).astype(np.float32)
        depth[0, :4] = 0.0  # some invalid pixels
        intr = _intr(20.0, 18.0, W / 2, H / 2)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        m = match_pair(jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(t),
                       jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(t))
        valid = np.asarray(m.valid)
        np.testing.assert_array_equal(valid, depth > 0)
        v, u = np.nonzero(valid)
        np.testing.assert_array_equal(np.asarray(m.u2)[v, u], u)
        np.testing.assert_array_equal(np.asarray(m.v2)[v, u], v)
        np.testing.assert_allclose(np.asarray(m.d2)[v, u], depth[v, u])
        # invalid entries carry the NO_MATCH sentinel
        assert np.all(np.asarray(m.u2)[~valid] == NO_MATCH)

    def test_disjoint_views_no_match(self):
        # Two cameras looking at planes far apart -> no overlap
        H, W = 8, 10
        depth = np.full((H, W), 2.0, np.float32)
        intr = _intr(10.0, 10.0, W / 2, H / 2)
        R = np.eye(3, dtype=np.float32)
        m = match_pair(
            jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(np.zeros(3, np.float32)),
            jnp.array(depth), jnp.array(intr), jnp.array(R),
            jnp.array(np.array([100.0, 0, 0], np.float32)),
        )
        assert int(np.asarray(m.valid).sum()) == 0

    def test_occlusion_rejected_by_consistency(self):
        # View 2's depth at the candidate pixel belongs to a *nearer* surface:
        # reprojection lands elsewhere -> match rejected.
        H, W = 8, 10
        intr = _intr(10.0, 10.0, W / 2, H / 2)
        R = np.eye(3, dtype=np.float32)
        t1 = np.zeros(3, np.float32)
        t2 = np.array([0.5, 0.0, 0.0], np.float32)
        depth1 = np.full((H, W), 4.0, np.float32)
        depth2 = np.full((H, W), 1.0, np.float32)  # a different (occluding) surface
        m = match_pair(jnp.array(depth1), jnp.array(intr), jnp.array(R), jnp.array(t1),
                       jnp.array(depth2), jnp.array(intr), jnp.array(R), jnp.array(t2))
        assert int(np.asarray(m.valid).sum()) == 0

    def test_matches_oracle_random_scene(self):
        # Smooth random depth, small pose offsets; compare against the
        # independently-implemented reference (scatter-map) algorithm.
        rng = np.random.default_rng(42)
        H, W = 24, 32
        base = 3.0 + 0.5 * np.sin(np.linspace(0, 3, W))[None, :] + 0.3 * np.cos(
            np.linspace(0, 2, H)
        )[:, None]
        depth1 = base.astype(np.float32)
        depth2 = (base + 0.05 * rng.standard_normal((H, W))).astype(np.float32)
        depth1[rng.uniform(size=(H, W)) < 0.1] = 0.0
        depth2[rng.uniform(size=(H, W)) < 0.1] = 0.0
        K = np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]], np.float32)
        intr = _intr(25.0, 25.0, W / 2, H / 2)
        R1 = np.eye(3, dtype=np.float32)
        t1 = np.zeros(3, np.float32)
        c, s = np.cos(0.02), np.sin(0.02)
        R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t2 = np.array([0.15, -0.05, 0.02], np.float32)

        expected = oracle_match(depth1, K, R1, t1, depth2, K, R2, t2)
        m = match_pair(jnp.array(depth1), jnp.array(intr), jnp.array(R1), jnp.array(t1),
                       jnp.array(depth2), jnp.array(intr), jnp.array(R2), jnp.array(t2))
        got = dense_to_set(m)
        # Allow a sliver of boundary-truncation disagreement from float32
        # op-order differences (K-matmul vs scalar intrinsics).
        sym_diff = expected ^ got
        assert len(expected) > 100  # sanity: real overlap
        assert len(sym_diff) <= max(1, len(expected) // 500), (
            f"{len(sym_diff)} disagreements vs oracle ({len(expected)} expected)"
        )


class TestObservations:
    def test_pair_observation_gather(self):
        H, W = 6, 8
        depth = np.full((H, W), 2.0, np.float32)
        intr = _intr(10.0, 10.0, W / 2, H / 2)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        rgb = np.arange(H * W * 3, dtype=np.float32).reshape(H, W, 3) / (H * W * 3)
        m = match_pair(jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(t),
                       jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(t))
        cP, I = pair_observation(m, jnp.array(intr), jnp.array(rgb))
        # Self match: I equals rgb everywhere (all valid), cP z == depth
        np.testing.assert_allclose(np.asarray(I), rgb, atol=1e-7)
        np.testing.assert_allclose(np.asarray(cP)[..., 2], depth, atol=1e-6)
        # z = ||cP|| >= depth
        z = np.linalg.norm(np.asarray(cP), axis=-1)
        assert np.all(z >= depth - 1e-5)

    def test_chunked_stack(self):
        H, W = 6, 8
        V = 3
        depth = np.full((H, W), 2.0, np.float32)
        intr = _intr(10.0, 10.0, W / 2, H / 2)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        depths2 = np.stack([depth] * V)
        rgbs2 = np.stack([np.full((H, W, 3), 0.1 * (k + 1), np.float32) for k in range(V)])
        intrs2 = np.stack([intr] * V)
        Rs2 = np.stack([R] * V)
        ts2 = np.stack([t, np.array([0.05, 0, 0], np.float32), np.array([50.0, 0, 0], np.float32)])
        obs, m = match_and_observe_chunk_jit(
            jnp.array(depth), jnp.array(intr), jnp.array(R), jnp.array(t),
            jnp.array(depths2), jnp.array(rgbs2), jnp.array(intrs2),
            jnp.array(Rs2), jnp.array(ts2),
        )
        assert obs.valid.shape == (V, H, W)
        assert obs.cP.shape == (V, H, W, 3)
        assert obs.I.shape == (V, H, W, 3)
        # view 0 = self: all valid; view 2 = far away: none valid
        assert int(np.asarray(obs.valid[0]).sum()) == H * W
        assert int(np.asarray(obs.valid[2]).sum()) == 0
        # colors gathered from the right view
        np.testing.assert_allclose(np.asarray(obs.I[0]), 0.1, atol=1e-7)
        # invalid entries zero-filled
        np.testing.assert_allclose(np.asarray(obs.I[2]), 0.0)
        assert int(obs.n_obs) == int(np.asarray(m.valid).sum())


def test_packed_gather_path_equals_float_path():
    """Raw u16/u8 inputs take the packed single-gather path; its outputs
    must be bit-identical to the generic two-gather float path."""
    rng = np.random.default_rng(11)
    H = W = 40
    V = 3
    depth_mm = (rng.uniform(1000, 4000, size=(V, H, W)) * (rng.uniform(size=(V, H, W)) < 0.9)).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(_intr(45.0, 45.0, W / 2, H / 2), (V, 1))
    Rs, ts = [], []
    for k in range(V):
        th = 0.08 * k
        Rs.append(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]], np.float32))
        ts.append(np.array([0.3 * k, 0.0, 0.0], np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    d1 = depth_mm[0].astype(np.float32) / 1000

    for compact in (True, False):
        obs_a, m_a = match_and_observe_chunk_jit(
            jnp.asarray(d1), jnp.asarray(intr[0]), jnp.asarray(Rs[0]), jnp.asarray(ts[0]),
            jnp.asarray(depth_mm), jnp.asarray(rgbs),
            jnp.asarray(intr), jnp.asarray(Rs), jnp.asarray(ts), compact=compact,
        )
        # convert with the same device ops the pipeline uses (XLA's /1000
        # is a reciprocal multiply — numpy's differs by 1 ulp)
        from sucre_tpu.ops.matching import to_f32_depth, to_f32_rgb

        obs_b, m_b = match_and_observe_chunk_jit(
            jnp.asarray(d1), jnp.asarray(intr[0]), jnp.asarray(Rs[0]), jnp.asarray(ts[0]),
            to_f32_depth(jnp.asarray(depth_mm)),
            to_f32_rgb(jnp.asarray(rgbs)),
            jnp.asarray(intr), jnp.asarray(Rs), jnp.asarray(ts), compact=compact,
        )
        np.testing.assert_array_equal(np.asarray(obs_a.valid), np.asarray(obs_b.valid))
        np.testing.assert_array_equal(np.asarray(m_a.u2), np.asarray(m_b.u2))
        np.testing.assert_array_equal(np.asarray(m_a.v2), np.asarray(m_b.v2))
        # /1000 lowers as an exact divide eagerly but a reciprocal
        # multiply when fused — 1 ulp apart on ~21% of values
        np.testing.assert_allclose(
            np.asarray(m_a.d2), np.asarray(m_b.d2), rtol=1e-6
        )
        assert np.asarray(obs_a.valid).sum() > 100
        Ia = np.asarray(obs_a.I).astype(np.float32)
        Ib = np.asarray(obs_b.I).astype(np.float32)
        if compact:
            # packed keeps u8; float path gathered f32 in [0, 1]
            np.testing.assert_allclose(Ia / 255.0, Ib, atol=1e-7)
            np.testing.assert_allclose(np.asarray(obs_a.z), np.asarray(obs_b.z), atol=1e-6)
        else:
            np.testing.assert_allclose(Ia, Ib, atol=1e-7)
            np.testing.assert_allclose(np.asarray(obs_a.cP), np.asarray(obs_b.cP), atol=1e-6)


def test_bilinear_observation():
    """Bilinear color sampling: equals nearest on constant images, and
    recovers fractional-position values exactly on a linear ramp (where
    bilinear interpolation is exact); matches/geometry are unchanged."""
    rng = np.random.default_rng(5)
    H = W = 32
    V = 2
    depth_mm = np.full((V, H, W), 2000, np.uint16)
    # view 0: constant color; view 1: horizontal ramp
    rgbs = np.zeros((V, H, W, 3), np.uint8)
    rgbs[0] = 120
    ramp = np.linspace(0, 255, W).astype(np.uint8)
    rgbs[1] = ramp[None, :, None]
    intr = np.tile(_intr(40.0, 40.0, W / 2, H / 2), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    # small x-offset so reprojections land at fractional pixel positions
    ts = np.stack([np.zeros(3, np.float32), np.array([0.0123, 0, 0], np.float32)])

    args = (
        jnp.asarray(depth_mm[0].astype(np.float32) / 1000),
        jnp.asarray(intr[0]), jnp.asarray(Rs[0]), jnp.asarray(ts[0]),
        jnp.asarray(depth_mm), jnp.asarray(rgbs),
        jnp.asarray(intr), jnp.asarray(Rs), jnp.asarray(ts),
    )
    obs_n, m_n = match_and_observe_chunk_jit(*args, compact=False)
    obs_b, m_b = match_and_observe_chunk_jit(*args, compact=False, bilinear=True)

    # geometry identical
    np.testing.assert_array_equal(np.asarray(m_n.valid), np.asarray(m_b.valid))
    np.testing.assert_array_equal(np.asarray(m_n.u2), np.asarray(m_b.u2))

    valid0 = np.asarray(obs_n.valid[0])
    assert valid0.sum() > 500
    # constant image: identical colors
    np.testing.assert_allclose(
        np.asarray(obs_b.I[0])[valid0], np.asarray(obs_n.I[0])[valid0], atol=1e-6
    )
    # ramp image: bilinear interpolates the sub-pixel offset; away from
    # borders the analytic value is ramp(x2 - 0.5) which differs from the
    # nearest sample by the fractional offset
    valid1 = np.asarray(obs_n.valid[1])
    interior = np.zeros_like(valid1)
    interior[2:-2, 2:-2] = True
    sel = valid1 & interior
    assert sel.sum() > 300
    In = np.asarray(obs_n.I[1], np.float32)[sel][:, 0]
    Ib = np.asarray(obs_b.I[1], np.float32)[sel][:, 0]
    # bilinear must deviate from nearest (fractional offset) but stay
    # within one ramp step of it
    step = 255.0 / (W - 1) / 255.0
    assert np.abs(Ib - In).max() <= step + 1e-6
    assert np.abs(Ib - In).mean() > 1e-4


def test_two_way_matching_symmetric():
    """The two-way consistency condition is symmetric: the match set of
    (1 -> 2) equals the transposed match set of (2 -> 1)."""
    rng = np.random.default_rng(7)
    H, W = 24, 32
    base = 3.0 + 0.4 * np.sin(np.linspace(0, 3, W))[None, :] + 0.2 * np.cos(
        np.linspace(0, 2, H)
    )[:, None]
    d1 = base.astype(np.float32)
    d2 = (base + 0.05 * rng.standard_normal((H, W))).astype(np.float32)
    d1[rng.uniform(size=(H, W)) < 0.1] = 0.0
    d2[rng.uniform(size=(H, W)) < 0.1] = 0.0
    intr = _intr(25.0, 25.0, W / 2, H / 2)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    c, s = np.cos(0.03), np.sin(0.03)
    R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t2 = np.array([0.12, -0.04, 0.01], np.float32)

    m12 = match_pair(jnp.array(d1), jnp.array(intr), jnp.array(R1), jnp.array(t1),
                     jnp.array(d2), jnp.array(intr), jnp.array(R2), jnp.array(t2))
    m21 = match_pair(jnp.array(d2), jnp.array(intr), jnp.array(R2), jnp.array(t2),
                     jnp.array(d1), jnp.array(intr), jnp.array(R1), jnp.array(t1))
    fwd = dense_to_set(m12)
    rev = {(u2, v2, u1, v1) for (u1, v1, u2, v2) in dense_to_set(m21)}
    assert len(fwd) > 100
    assert fwd == rev


def test_matching_gauge_invariance():
    """Property: matching depends only on RELATIVE geometry — applying a
    global rigid transform to every pose leaves the match set unchanged
    (up to rare float truncation-boundary flips)."""
    rng = np.random.default_rng(11)
    H, W = 24, 32
    base = 3.0 + 0.4 * np.sin(np.linspace(0, 3, W))[None, :] + 0.2 * np.cos(
        np.linspace(0, 2, H)
    )[:, None]
    d1 = base.astype(np.float32)
    d2 = (base + 0.05 * rng.standard_normal((H, W))).astype(np.float32)
    d1[rng.uniform(size=(H, W)) < 0.1] = 0.0
    intr = _intr(25.0, 25.0, W / 2, H / 2)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    c, s = np.cos(0.03), np.sin(0.03)
    R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t2 = np.array([0.12, -0.04, 0.01], np.float32)

    # a substantial global rigid motion G
    cg, sg = np.cos(0.7), np.sin(0.7)
    G_R = np.array([[1, 0, 0], [0, cg, -sg], [0, sg, cg]], np.float32)
    G_t = np.array([2.0, -1.5, 0.8], np.float32)

    def transformed(R, t):
        return (G_R @ R).astype(np.float32), (G_R @ t + G_t).astype(np.float32)

    m = match_pair(jnp.array(d1), jnp.array(intr), jnp.array(R1), jnp.array(t1),
                   jnp.array(d2), jnp.array(intr), jnp.array(R2), jnp.array(t2))
    R1g, t1g = transformed(R1, t1)
    R2g, t2g = transformed(R2, t2)
    mg = match_pair(jnp.array(d1), jnp.array(intr), jnp.array(R1g), jnp.array(t1g),
                    jnp.array(d2), jnp.array(intr), jnp.array(R2g), jnp.array(t2g))
    a, b = dense_to_set(m), dense_to_set(mg)
    assert len(a) > 100
    # identical up to float truncation slivers at pixel boundaries
    assert len(a ^ b) <= max(2, len(a) // 200), f"{len(a ^ b)} / {len(a)} differ"


def test_origin_slice_bit_identical(rng):
    """Matching a rectangle slice of the target with a traced grid origin
    must be BIT-identical to the full-grid program restricted to the
    slice — including trunc-toward-zero borderline pixels, which a cx/cy
    shift would flip (the tile-cull correctness contract)."""
    H, W = 40, 56
    base = 2.0 + 0.4 * np.sin(np.linspace(0, 3, W))[None, :] + 0.3 * np.cos(
        np.linspace(0, 2, H)
    )[:, None]
    d1 = base.astype(np.float32)
    d1[rng.uniform(size=(H, W)) < 0.1] = 0.0
    d2 = (base + 0.03 * rng.standard_normal((H, W))).astype(np.float32)
    rgb2 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    intr = _intr(30.0, 30.0, W / 2, H / 2)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    c, s = np.cos(0.05), np.sin(0.05)
    R2 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t2 = np.array([0.2, -0.1, 0.02], np.float32)

    args2 = (
        jnp.asarray(d2)[None], jnp.asarray(rgb2)[None],
        jnp.asarray(intr)[None], jnp.asarray(R2)[None], jnp.asarray(t2)[None],
    )
    full_obs, full_m = match_and_observe_chunk_jit(
        jnp.asarray(d1), jnp.asarray(intr), jnp.asarray(R1), jnp.asarray(t1),
        *args2, compact=False,
    )
    r0, r1, c0, c1 = 8, 32, 16, 48
    sl_obs, sl_m = match_and_observe_chunk_jit(
        jnp.asarray(d1[r0:r1, c0:c1]), jnp.asarray(intr),
        jnp.asarray(R1), jnp.asarray(t1), *args2, compact=False,
        origin=jnp.asarray([r0, c0], jnp.int32),
    )
    np.testing.assert_array_equal(
        np.asarray(sl_m.valid[0]), np.asarray(full_m.valid[0, r0:r1, c0:c1])
    )
    np.testing.assert_array_equal(
        np.asarray(sl_m.u2[0]), np.asarray(full_m.u2[0, r0:r1, c0:c1])
    )
    np.testing.assert_array_equal(  # bit-exact, not allclose
        np.asarray(sl_obs.cP[0]), np.asarray(full_obs.cP[0, r0:r1, c0:c1])
    )
    np.testing.assert_array_equal(
        np.asarray(sl_obs.I[0]), np.asarray(full_obs.I[0, r0:r1, c0:c1])
    )
    assert int(np.asarray(sl_m.valid).sum()) > 100


def test_per_target_area_vmaps_with_targets():
    """match_survey_per_target must route a per-target (T,) ``area``
    array one-row-per-target into the min-cover threshold — not forward
    the whole array to every target (regression: it was closed over).
    A scalar area still broadcasts."""
    import jax

    from sucre_tpu.ops.matching import match_survey, match_survey_per_target

    rng = np.random.default_rng(5)
    T, V, H, W = 2, 3, 24, 32
    depth_mm = (
        rng.uniform(1200, 3000, size=(V, H, W))
        * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(_intr(30.0, 30.0, W / 2, H / 2), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack(
        [np.array([0.1 * k, 0.0, 0.0], np.float32) for k in range(V)]
    )
    pt = lambda a: (jnp.asarray(a[:T]),)  # targets = first T views
    vt = jnp.asarray
    # per-target tables: both targets see the same V views here
    tile = lambda a: jnp.asarray(np.broadcast_to(a, (T,) + a.shape).copy())
    min_cover = jnp.float32(1e-3)
    # areas chosen so target 0 keeps pairs and target 1 discards all:
    # a huge area drives count/area below min_cover
    areas = jnp.asarray([float(H * W), 1e9], jnp.float32)
    obs = match_survey_per_target(
        vt(depth_mm[:T]), vt(intr[:T]), vt(Rs[:T]), vt(ts[:T]),
        tile(depth_mm), tile(rgbs), tile(intr), tile(Rs), tile(ts),
        min_cover, area=areas,
    )
    n0 = int(np.asarray(obs.valid[0]).sum())
    n1 = int(np.asarray(obs.valid[1]).sum())
    assert n0 > 0 and n1 == 0, (n0, n1)
    # scalar area still broadcasts to every target
    obs_s = match_survey_per_target(
        vt(depth_mm[:T]), vt(intr[:T]), vt(Rs[:T]), vt(ts[:T]),
        tile(depth_mm), tile(rgbs), tile(intr), tile(Rs), tile(ts),
        min_cover, area=jnp.float32(H * W),
    )
    ref = match_survey(
        vt(depth_mm[:T]), vt(intr[:T]), vt(Rs[:T]), vt(ts[:T]),
        vt(depth_mm), vt(rgbs), vt(intr), vt(Rs), vt(ts),
        min_cover, area=jnp.float32(H * W),
    )
    np.testing.assert_array_equal(
        np.asarray(obs_s.valid), np.asarray(ref.valid)
    )


def test_indexed_survey_equals_per_target_tables():
    """match_survey_indexed (flat-index gather from the SHARED stack)
    must reproduce match_survey_per_target fed tables gathered with the
    same view ids — including pad slots (id >= V), per-target areas,
    and both raw-u8/u16 and float stacks."""
    import jax

    from sucre_tpu.ops.matching import (
        match_survey_indexed,
        match_survey_per_target,
        to_f32_depth,
        to_f32_rgb,
    )

    rng = np.random.default_rng(7)
    T, V, S, H, W = 2, 5, 3, 24, 32
    depth_mm = (
        rng.uniform(1200, 3000, size=(V, H, W))
        * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(_intr(30.0, 30.0, W / 2, H / 2), (V, 1))
    Rs, ts = [], []
    for k in range(V):
        th = 0.04 * k
        Rs.append(np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32))
        ts.append(np.array([0.08 * k, 0.0, 0.0], np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    j = jnp.asarray
    targs = (j(depth_mm[:T]), j(intr[:T]), j(Rs[:T]), j(ts[:T]))
    mc = jnp.float32(1e-6)
    # target 0: views 1, 3 + one pad; target 1: views 0, 2, 4
    idx = np.array([[1, 3, V], [0, 2, 4]], np.int32)

    def tables(arr):
        safe = np.concatenate(
            [arr, np.zeros_like(arr[:1])], axis=0
        )  # pad slot -> all-zero view
        return j(safe[idx])

    for raw in (True, False):
        if raw:
            vd, vr = j(depth_mm), j(rgbs)
            tvd, tvr = tables(depth_mm), tables(rgbs)
        else:
            vd = to_f32_depth(j(depth_mm))
            vr = to_f32_rgb(j(rgbs))
            tvd, tvr = (
                to_f32_depth(tables(depth_mm)), to_f32_rgb(tables(rgbs)),
            )
        for bilinear in (False, True):
            obs_i = match_survey_indexed(
                *targs, vd, vr, j(intr), j(Rs), j(ts), j(idx), mc,
                bilinear=bilinear,
            )
            obs_t = match_survey_per_target(
                *targs, tvd, tvr, tables(intr), tables(Rs), tables(ts),
                mc, bilinear=bilinear,
            )
            for f in ("valid", "z", "I"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(obs_i, f)),
                    np.asarray(getattr(obs_t, f)),
                    err_msg=f"{f} raw={raw} bilinear={bilinear}",
                )
            assert int(np.asarray(obs_i.valid).sum()) > 50
    # per-target area: huge area on target 1 kills its pairs
    areas = jnp.asarray([float(H * W), 1e9], jnp.float32)
    obs_a = match_survey_indexed(
        *targs, j(depth_mm), j(rgbs), j(intr), j(Rs), j(ts), j(idx), mc,
        area=areas,
    )
    assert int(np.asarray(obs_a.valid[0]).sum()) > 0
    assert int(np.asarray(obs_a.valid[1]).sum()) == 0


def test_indexed_survey_distorted_equals_per_target():
    """Distorted-lens flat-index survey: the (V, 8) per-view distortion
    vectors gather by view id exactly like the camera params."""
    from sucre_tpu.ops.matching import (
        match_survey_indexed,
        match_survey_per_target,
    )

    rng = np.random.default_rng(9)
    T, V, S, H, W = 2, 4, 2, 24, 32
    depth_mm = (
        rng.uniform(1200, 3000, size=(V, H, W))
        * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(_intr(30.0, 30.0, W / 2, H / 2), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack(
        [np.array([0.06 * k, 0.0, 0.0], np.float32) for k in range(V)]
    )
    dists = np.zeros((V, 8), np.float32)
    dists[:, 0] = np.linspace(-0.05, 0.05, V)  # k1 per view
    j = jnp.asarray
    targs = (j(depth_mm[:T]), j(intr[:T]), j(Rs[:T]), j(ts[:T]))
    idx = np.array([[1, 3], [0, 2]], np.int32)

    def tables(arr):
        return j(arr[idx])

    mc = jnp.float32(1e-6)
    obs_i = match_survey_indexed(
        *targs, j(depth_mm), j(rgbs), j(intr), j(Rs), j(ts), j(idx), mc,
        t_dists=j(dists[:T]), v_dists=j(dists), dist_model="rational",
    )
    obs_t = match_survey_per_target(
        *targs, tables(depth_mm), tables(rgbs), tables(intr), tables(Rs),
        tables(ts), mc,
        t_dists=j(dists[:T]), v_dists=tables(dists), dist_model="rational",
    )
    for f in ("valid", "z", "I"):
        np.testing.assert_array_equal(
            np.asarray(getattr(obs_i, f)), np.asarray(getattr(obs_t, f)),
            err_msg=f,
        )
    assert int(np.asarray(obs_i.valid).sum()) > 50


def test_indexed_survey_mixed_tag_equals_per_target():
    """Mixed-rig (target_tag, view_tag) tuple tags through the
    flat-index program: pinhole targets over distorted views."""
    from sucre_tpu.ops.matching import (
        match_survey_indexed,
        match_survey_per_target,
    )

    rng = np.random.default_rng(13)
    T, V, H, W = 2, 4, 24, 32
    depth_mm = (
        rng.uniform(1200, 3000, size=(V, H, W))
        * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    intr = np.tile(_intr(30.0, 30.0, W / 2, H / 2), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack(
        [np.array([0.06 * k, 0.0, 0.0], np.float32) for k in range(V)]
    )
    dists = np.zeros((V, 8), np.float32)
    dists[:, 0] = np.linspace(-0.04, 0.04, V)
    j = jnp.asarray
    targs = (j(depth_mm[:T]), j(intr[:T]), j(Rs[:T]), j(ts[:T]))
    idx = np.array([[0, 2], [1, 3]], np.int32)
    tables = lambda a: j(a[idx])
    mc = jnp.float32(1e-6)
    tag = ("none", "rational")
    obs_i = match_survey_indexed(
        *targs, j(depth_mm), j(rgbs), j(intr), j(Rs), j(ts), j(idx), mc,
        v_dists=j(dists), dist_model=tag,
    )
    obs_t = match_survey_per_target(
        *targs, tables(depth_mm), tables(rgbs), tables(intr), tables(Rs),
        tables(ts), mc, v_dists=tables(dists), dist_model=tag,
    )
    for f in ("valid", "z", "I"):
        np.testing.assert_array_equal(
            np.asarray(getattr(obs_i, f)), np.asarray(getattr(obs_t, f)),
            err_msg=f,
        )
    assert int(np.asarray(obs_i.valid).sum()) > 50
