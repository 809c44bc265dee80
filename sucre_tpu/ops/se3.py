"""SE(3) / SO(3) ops as pure JAX functions on arrays.

Replaces the reference's torch Lie ops (se3.py:22-27 `exp` via
`torch.matrix_exp`, sfm.py:32-59 `Pose`) with closed-form, fully
differentiable, vmap-friendly functions. Points are (..., 3) row vectors
(JAX-idiomatic trailing feature dim), poses are (R, t) with R (3, 3) and
t (3,).

The SE(3) exponential uses the exact Rodrigues closed form (with Taylor
guards at theta -> 0) instead of a Pade matrix exponential: cheaper on
TPU (no 4x4 expm iteration), exact, and safely differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

# Taylor-branch threshold for the Rodrigues coefficients. Must sit ABOVE
# float32's cancellation band, not at f64-epsilon scale: for
# th in (1e-6, ~2.4e-4), f32 cos(th) rounds to exactly 1.0 and sin(th)
# to th, so the exact branch returns B = C = 0 (true ~0.5 and ~1/6) and
# autodiff through (1-cos)/th^2 yields ~0.5/th^2 — a wrong-sign,
# orders-of-magnitude-off translation gradient precisely where a
# camera-to-light pose with near-parallel mounting converges. At 1e-3
# the truncated Taylor error is ~th^4/120 ~ 1e-14, far below f32 eps.
_SMALL = 1e-3


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector: hat(w) @ v == cross(w, v).

    Supports batched input (..., 3) -> (..., 3, 3).
    """
    w1, w2, w3 = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(w1)
    rows = jnp.stack(
        [
            jnp.stack([zero, -w3, w2], axis=-1),
            jnp.stack([w3, zero, -w1], axis=-1),
            jnp.stack([-w2, w1, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def se3_exp(twist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exponential map se(3) -> SE(3).

    ``twist = (w1, w2, w3, p1, p2, p3)`` — rotation part first, matching
    the reference's parameter layout (se3.py:22-27, used for the
    camera-to-light pose sucre.py:44,53-56).

    Returns (R, t) with R (3, 3) and t (3,). Closed form:
      R = I + A [w]x + B [w]x^2,   t = V p,
      V = I + B [w]x + C [w]x^2,
      A = sin(th)/th, B = (1-cos(th))/th^2, C = (th-sin(th))/th^3,
    with Taylor-series values at th -> 0 (A=1, B=1/2, C=1/6), selected
    through a safe-denominator ``where`` so gradients stay finite.
    """
    w = twist[..., :3]
    p = twist[..., 3:]
    th2 = jnp.sum(w * w, axis=-1)
    th = jnp.sqrt(th2)
    small = th < _SMALL
    # Safe theta avoids 0/0 in the exact branch; the where picks Taylor there.
    th2_safe = jnp.where(small, 1.0, th2)
    th_safe = jnp.sqrt(th2_safe)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th_safe) / th_safe)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th_safe)) / th2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - th2 / 120.0, (th_safe - jnp.sin(th_safe)) / (th2_safe * th_safe)
    )
    W = hat(w)
    # [w]x^2 == w w^T - (w.w) I, computed elementwise: exact float32 on TPU
    # (a 3x3 `@` would route through the MXU at bf16 default precision).
    W2 = w[..., :, None] * w[..., None, :] - th2[..., None, None] * jnp.eye(
        3, dtype=twist.dtype
    )
    eye = jnp.eye(3, dtype=twist.dtype)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = matvec3(V, p)
    return R, t


def matvec3(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact-f32 3x3 matrix-vector product via elementwise multiply-add.

    M (..., 3, 3), v (..., 3) -> (..., 3). Avoids MXU bf16 default
    precision for tiny contractions; broadcasts leading dims.
    """
    return (
        M[..., :, 0] * v[..., None, 0]
        + M[..., :, 1] * v[..., None, 1]
        + M[..., :, 2] * v[..., None, 2]
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """COLMAP-convention quaternion (w, x, y, z) -> rotation matrix (3, 3).

    Normalizes first (COLMAP stores unit quaternions; this guards round-trip
    through text formats). Batched (..., 4) -> (..., 3, 3).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return R


def pose_inverse(R: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert an SE(3) pose: (R, t) -> (R^T, -R^T t). Batched over leading dims.

    Parity: sfm.py:42-47 ``Pose.inverse``.
    """
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -matvec3(Rt, t)


def transform_points(R: jnp.ndarray, t: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points: R @ P + t, with P as (..., 3) row vectors.

    R is (..., 3, 3), t (..., 3); batch dims broadcast against P's.
    Parity: sfm.py:49-55 ``Pose.transform`` (which uses (3, n) columns).
    Elementwise multiply-add keeps exact f32 on TPU (no bf16 MXU pass).
    """
    return matvec3(R, P) + t
