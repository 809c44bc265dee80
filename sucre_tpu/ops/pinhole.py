"""Pinhole camera projection ops as pure JAX functions.

Replaces the reference's 3x3 K matmuls (sfm.py:90-107) with scalar
intrinsics math — on TPU a (fx, fy, cx, cy) elementwise formulation
fuses into the surrounding VPU work instead of forcing tiny (3, n)
matmuls, and it vmaps cleanly over a stacked (V, 4) intrinsics array.

Conventions (exact parity with the reference):
  - pixel centers at +0.5: unproject uses homogeneous (u + 0.5, v + 0.5, 1)
    (sfm.py:90-93).
  - projection returns *float* pixel coordinates computed as
    (K @ P)[:2] / (K @ P)[2] — i.e. (fx*X + cx*Z) / Z, matching the
    reference's rounding order (sfm.py:103-107) — and match candidates
    integer-truncate toward zero (torch ``.long()``, sfm.py:116).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """PINHOLE intrinsics; each field scalar or (V,)-batched."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def intrinsics_from_K(K: jnp.ndarray) -> Intrinsics:
    """(..., 3, 3) K matrix -> Intrinsics tuple."""
    return Intrinsics(K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2])


def K_from_intrinsics(intr: Intrinsics) -> jnp.ndarray:
    """Intrinsics tuple -> (..., 3, 3) K matrix."""
    fx, fy, cx, cy = (jnp.asarray(x, dtype=jnp.float32) for x in intr)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, zero, cx], -1),
            jnp.stack([zero, fy, cy], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        axis=-2,
    )


def unproject(intr: Intrinsics, u: jnp.ndarray, v: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Backproject pixels to camera-frame 3D points.

    ``u, v`` are integer (or float) pixel coordinates, ``d`` the depth
    (Z, meters). Returns (..., 3) points. Parity with sfm.py:90-93:
    cP = K^-1 @ (d * [u+0.5, v+0.5, 1]); here written elementwise as
    X = d*(u+0.5-cx)/fx, Y = d*(v+0.5-cy)/fy, Z = d.
    """
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    X = d * (u + 0.5 - intr.cx) / intr.fx
    Y = d * (v + 0.5 - intr.cy) / intr.fy
    return jnp.stack([X, Y, d], axis=-1)


def project(intr: Intrinsics, P: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points (..., 3) to float pixel coordinates.

    Returns (x, y) each (...,). Uses the reference's rounding order
    (fx*X + cx*Z)/Z (sfm.py:103-107). Z == 0 yields inf/nan which the
    caller's bounds mask rejects (same behavior as the reference).
    """
    X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
    x = (intr.fx * X + intr.cx * Z) / Z
    y = (intr.fy * Y + intr.cy * Z) / Z
    return x, y


def pixel_grid(height: int, width: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense integer pixel coordinate grids u (H, W), v (H, W), int32."""
    v = jnp.arange(height, dtype=jnp.int32)[:, None] * jnp.ones((1, width), jnp.int32)
    u = jnp.ones((height, 1), jnp.int32) * jnp.arange(width, dtype=jnp.int32)[None, :]
    return u, v
