"""Unit tests for SE(3) and pinhole ops (golden values + property tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from sucre_tpu.ops import (
    Intrinsics,
    K_from_intrinsics,
    hat,
    intrinsics_from_K,
    pixel_grid,
    pose_inverse,
    project,
    quat_to_rotmat,
    se3_exp,
    transform_points,
    unproject,
)


def se3_exp_scipy(twist):
    """Oracle: matrix exponential of the 4x4 Lie-algebra matrix (reference
    semantics, se3.py:22-27) computed with scipy in float64."""
    w1, w2, w3, p1, p2, p3 = np.asarray(twist, dtype=np.float64)
    X = np.array(
        [
            [0, -w3, w2, p1],
            [w3, 0, -w1, p2],
            [-w2, w1, 0, p3],
            [0, 0, 0, 0],
        ]
    )
    M = expm(X)
    return M[:3, :3], M[:3, 3]


class TestSE3:
    def test_hat(self):
        w = jnp.array([1.0, 2.0, 3.0])
        W = hat(w)
        v = jnp.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(W @ v, jnp.cross(w, v), rtol=1e-6)

    @pytest.mark.parametrize(
        "twist",
        [
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0, -2.0, 3.0],
            [0.3, -0.2, 0.5, 1.0, 0.0, -1.0],
            [1e-8, 0.0, 0.0, 1.0, 1.0, 1.0],
            [2.5, 1.5, -0.5, 0.1, 0.2, 0.3],
        ],
    )
    def test_se3_exp_vs_expm(self, twist):
        R, t = se3_exp(jnp.array(twist, dtype=jnp.float32))
        R_ref, t_ref = se3_exp_scipy(twist)
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_ref, atol=1e-5)

    def test_se3_exp_rotation_orthonormal(self):
        R, _ = se3_exp(jnp.array([0.7, -1.1, 0.4, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5

    def test_se3_exp_grad_finite_at_zero(self):
        g = jax.grad(lambda tw: jnp.sum(se3_exp(tw)[0]) + jnp.sum(se3_exp(tw)[1]))(
            jnp.zeros(6)
        )
        assert np.all(np.isfinite(np.asarray(g)))

    def test_quat_to_rotmat_identity(self):
        np.testing.assert_allclose(
            quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0])), np.eye(3), atol=1e-7
        )

    def test_quat_to_rotmat_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        q_wxyz = np.array([0.7071068, 0.0, 0.7071068, 0.0])
        R = quat_to_rotmat(jnp.array(q_wxyz))
        R_ref = Rotation.from_quat(np.roll(q_wxyz, -1)).as_matrix()  # scipy xyzw
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-6)

    def test_pose_inverse_roundtrip(self):
        R, t = se3_exp(jnp.array([0.3, 0.1, -0.4, 1.0, 2.0, 3.0]))
        Ri, ti = pose_inverse(R, t)
        P = jnp.array([[1.0, 2.0, 3.0], [-1.0, 0.5, 4.0]])
        P2 = transform_points(Ri, ti, transform_points(R, t, P))
        np.testing.assert_allclose(np.asarray(P2), np.asarray(P), atol=1e-5)

    def test_transform_points_batched_pose(self):
        twists = jnp.array([[0.3, 0.1, -0.4, 1.0, 2.0, 3.0], [0.0] * 6])
        R, t = jax.vmap(se3_exp)(twists)
        P = jnp.array([1.0, 2.0, 3.0])
        out = jax.vmap(lambda R_, t_: transform_points(R_, t_, P))(R, t)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(out[1]), [1.0, 2.0, 3.0], atol=1e-6)


class TestPinhole:
    INTR = Intrinsics(
        fx=jnp.float32(500.0), fy=jnp.float32(400.0), cx=jnp.float32(320.0), cy=jnp.float32(240.0)
    )

    def test_unproject_golden(self):
        # Pixel (10, 20), depth 2: X = 2*(10.5-320)/500, Y = 2*(20.5-240)/400, Z = 2
        P = unproject(self.INTR, jnp.int32(10), jnp.int32(20), jnp.float32(2.0))
        np.testing.assert_allclose(
            np.asarray(P), [2 * (10.5 - 320) / 500, 2 * (20.5 - 240) / 400, 2.0], rtol=1e-6
        )

    def test_project_unproject_roundtrip(self):
        u, v = pixel_grid(8, 16)
        d = jnp.full((8, 16), 3.7, jnp.float32)
        P = unproject(self.INTR, u, v, d)
        x, y = project(self.INTR, P)
        np.testing.assert_allclose(np.asarray(x), np.asarray(u) + 0.5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(y), np.asarray(v) + 0.5, atol=1e-3)
        # Integer truncation recovers exact pixel coordinates (self-match identity)
        assert np.array_equal(np.asarray(x.astype(jnp.int32)), np.asarray(u))
        assert np.array_equal(np.asarray(y.astype(jnp.int32)), np.asarray(v))

    def test_K_roundtrip(self):
        K = K_from_intrinsics(self.INTR)
        np.testing.assert_allclose(
            np.asarray(K), [[500.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1]], atol=1e-6
        )
        intr = intrinsics_from_K(K)
        assert float(intr.fx) == 500.0 and float(intr.cy) == 240.0

    def test_project_matches_K_matmul(self):
        P = jnp.array([[0.3, -0.2, 2.0], [1.5, 0.9, 5.0]])
        K = np.asarray(K_from_intrinsics(self.INTR), dtype=np.float64)
        cp = K @ np.asarray(P, np.float64).T
        px_ref = cp[:2] / cp[2]
        x, y = project(self.INTR, P)
        np.testing.assert_allclose(np.asarray(x), px_ref[0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(y), px_ref[1], rtol=1e-6)

    def test_truncation_toward_zero(self):
        # torch .long() truncates toward zero: -0.5 -> 0 (which then passes the
        # 0 <= u bound). jnp astype(int32) must match.
        x = jnp.array([-0.5, -1.5, 0.5, 1.9])
        np.testing.assert_array_equal(np.asarray(x.astype(jnp.int32)), [0, -1, 0, 1])


def test_devices_virtual_mesh():
    assert jax.device_count() == 8


def test_se3_exp_gradient_through_f32_cancellation_band():
    """For th in (1e-6, ~2.4e-4), f32 cos/sin cancellation makes the
    EXACT Rodrigues branch return B = C = 0 with an autodiff gradient of
    ~0.5/th^2 (wrong sign, orders of magnitude off). The Taylor branch
    must cover that whole band: dt/dw at tiny rotation is ~-0.5 [p]x."""
    p = jnp.asarray([0.3, -0.7, 1.1], jnp.float32)

    def t_of_w(w):
        R, t = se3_exp(jnp.concatenate([w, p]))
        return t

    for scale in (1e-5, 1e-4, 5e-4):
        w = jnp.asarray([scale, -scale, 0.5 * scale], jnp.float32)
        J = jax.jacobian(t_of_w)(w)
        expected = -0.5 * np.asarray(hat(p))  # d(0.5 w x p)/dw
        np.testing.assert_allclose(np.asarray(J), expected, atol=2e-3)
        # and the value itself: t ~ p + 0.5 w x p
        t = t_of_w(w)
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(p + 0.5 * jnp.cross(w, p)), atol=1e-6
        )
