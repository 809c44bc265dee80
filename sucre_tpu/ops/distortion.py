"""Lens distortion models — COLMAP camera coverage beyond the reference.

The reference hard-asserts PINHOLE (`sfm.py:192`) and tells users to run
COLMAP's image undistorter first (`sucre.py:270` "undistorted COLMAP
model directory"). This module removes that pre-processing step: surveys
reconstructed with ANY COLMAP camera model — SIMPLE_RADIAL / RADIAL /
OPENCV / FULL_OPENCV / OPENCV_FISHEYE / SIMPLE_RADIAL_FISHEYE /
RADIAL_FISHEYE / FOV / THIN_PRISM_FISHEYE — restore directly, with the
distortion folded into the matching geometry.

TPU-first rationale: matching is bound by the gather engine (~10
cycles/row, see BASELINE.md) and ALL elementwise reprojection math hides
behind it — so an inline fixed-point/Newton undistortion (~60 VPU
ops/pixel) is effectively free. No per-camera LUT (that would add a
second gather on the bound resource), no dynamic shapes, no host work.

Four canonical models (static tags, one compiled program per tag):
  - ``"rational"`` — the OpenCV rational polynomial in normalized
    coordinates, parameter vector ``(k1, k2, p1, p2, k3, k4, k5, k6)``
    (cv2 distCoeffs order, so parity tests pass vectors verbatim).
    SIMPLE_RADIAL / RADIAL / OPENCV / FULL_OPENCV all embed into it.
  - ``"fisheye"`` — the OpenCV/COLMAP equidistant fisheye model,
    parameters ``(k1, k2, k3, k4, 0, 0, 0, 0)``; SIMPLE_RADIAL_FISHEYE
    and RADIAL_FISHEYE embed into it (fewer polynomial terms).
  - ``"fov"`` — the Devernay-Faugeras FOV model (COLMAP FOV), one
    parameter ``(omega, 0, ...)``; its inverse is CLOSED FORM.
  - ``"thin_prism_fisheye"`` — COLMAP's THIN_PRISM_FISHEYE: equidistant
    angle mapping composed with an r^8 radial + tangential + thin-prism
    polynomial, parameters ``(k1, k2, p1, p2, k3, k4, sx1, sy1)``
    (COLMAP's own order).
  - ``"none"`` — the exact pinhole path (callers skip this module).

Inversion is iterative (fixed point for rational, Newton for fisheye) and
NaN-poisons pixels whose inversion does not converge (verified by a
forward-distortion roundtrip): the NaN propagates through the projection
chain into ``matching._trunc_px``'s finite mask, so diverged pixels are
rejected exactly like out-of-bounds ones — no new validity plumbing.

Every function takes ``xp`` (numpy or jax.numpy): the same math runs
inside jitted matching programs and in the host-side numpy culling.
"""

from __future__ import annotations

import numpy as np

# Number of slots in the canonical parameter vector.
DIST_PARAMS = 8

# Static model tags. "none" is handled by callers (exact pinhole path);
# passing it to distort/undistort is an error by design.
DIST_MODELS = ("none", "rational", "fisheye", "fov", "thin_prism_fisheye")

# Reject an inversion whose forward-distortion roundtrip misses by more
# than this (normalized units; ~0.5 px at f=500). Interior pixels of
# physically-plausible lenses converge to <1e-6; divergence (outside the
# lens's invertible domain) is catastrophic, so the threshold is not
# delicate.
ROUNDTRIP_TOL = 1e-3

# Fixed point converges linearly (factor ~0.3-0.5/iter at practical
# coefficients): 30 iterations reach the f64 tail (~1e-10 normalized) and
# saturate f32 long before. The unrolled chain is pure VPU work measured
# to hide completely behind the matching gather (BASELINE.md), so extra
# iterations are free on the hot path.
_FIXED_POINT_ITERS = 30
_NEWTON_ITERS = 15


def _check_model(model: str) -> None:
    if model == "none" or model not in DIST_MODELS:
        raise ValueError(
            f"unknown distortion model {model!r} (expected one of "
            f"{DIST_MODELS[1:]}; 'none' must be handled by the caller)"
        )


def _distort_rational(xp, dist, x, y):
    k1, k2, p1, p2, k3, k4, k5, k6 = (dist[..., i] for i in range(8))
    r2 = x * x + y * y
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
    radial = num / den
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def _distort_fisheye(xp, dist, x, y):
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    r2 = x * x + y * y
    r = xp.sqrt(r2)
    theta = xp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    # theta_d/r -> 1 as r -> 0 (atan(r) ~ r); guard the 0/0.
    scale = xp.where(r > 1e-9, theta_d / xp.where(r > 1e-9, r, 1.0), 1.0)
    return x * scale, y * scale


def _distort_fov(xp, dist, x, y):
    # Devernay-Faugeras FOV model (COLMAP FOVCameraModel): one parameter
    # omega; rd = atan(2 r tan(omega/2)) / omega. Branch-free guards for
    # the r -> 0 limit (2 tan(omega/2)/omega) and omega -> 0 (identity).
    omega = dist[..., 0]
    r = xp.sqrt(x * x + y * y)
    small_w = xp.abs(omega) < 1e-8
    safe_w = xp.where(small_w, 1.0, omega)
    tan_half = xp.tan(0.5 * safe_w)
    small_r = r < 1e-9
    safe_r = xp.where(small_r, 1.0, r)
    factor = xp.arctan(2.0 * safe_r * tan_half) / (safe_r * safe_w)
    factor = xp.where(small_r, 2.0 * tan_half / safe_w, factor)
    factor = xp.where(small_w, xp.ones_like(factor), factor)
    return x * factor, y * factor


def _tpf_poly(xp, dist, uu, vv):
    # The polynomial half of COLMAP's ThinPrismFisheye model: radial to
    # r^8 + tangential + thin-prism offsets ON THE THETA-SCALED coords.
    k1, k2, p1, p2, k3, k4, sx1, sy1 = (dist[..., i] for i in range(8))
    u2 = uu * uu
    v2 = vv * vv
    uv = uu * vv
    r2 = u2 + v2
    radial = r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    du = uu * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2) + sx1 * r2
    dv = vv * radial + p1 * (r2 + 2.0 * v2) + 2.0 * p2 * uv + sy1 * r2
    return du, dv


def _distort_tpf(xp, dist, x, y):
    # COLMAP THIN_PRISM_FISHEYE: equidistant angle mapping first
    # (uu = theta * x / r), then the thin-prism polynomial on (uu, vv).
    r2 = x * x + y * y
    r = xp.sqrt(r2)
    theta = xp.arctan(r)
    scale = xp.where(r > 1e-9, theta / xp.where(r > 1e-9, r, 1.0), 1.0)
    uu = x * scale
    vv = y * scale
    du, dv = _tpf_poly(xp, dist, uu, vv)
    return uu + du, vv + dv


def distort(model: str, dist, x, y, xp=np):
    """Normalized undistorted coords -> distorted coords (closed form).

    ``dist`` is the canonical (..., 8) parameter vector; ``x, y`` are
    normalized image-plane coordinates (X/Z, Y/Z). Broadcasting applies.
    """
    _check_model(model)
    if model == "rational":
        return _distort_rational(xp, dist, x, y)
    if model == "fov":
        return _distort_fov(xp, dist, x, y)
    if model == "thin_prism_fisheye":
        return _distort_tpf(xp, dist, x, y)
    return _distort_fisheye(xp, dist, x, y)


def _undistort_rational(xp, dist, xd, yd, iters):
    k1, k2, p1, p2, k3, k4, k5, k6 = (dist[..., i] for i in range(8))
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        # Single divide per iteration (den/num, then two multiplies):
        # divides are the expensive VPU op in this unrolled chain — the
        # 3-divide form measured 1.37x pinhole matching cost, this one
        # 1.14x (scripts/probe_distortion_r3.py numbers in BASELINE.md).
        inv_radial = den / num
        x = (xd - dx) * inv_radial
        y = (yd - dy) * inv_radial
    return x, y


def _undistort_fisheye(xp, dist, xd, yd, iters):
    k1, k2, k3, k4 = (dist[..., i] for i in range(4))
    theta_d = xp.sqrt(xd * xd + yd * yd)
    # Newton on f(theta) = theta * poly(theta^2) - theta_d, theta0 = theta_d.
    # Clamp inside (0, pi/2): tan must stay finite; out-of-domain inputs
    # land on the clamp and fail the roundtrip check below.
    theta = xp.minimum(theta_d, 1.55)
    for _ in range(iters):
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = 2.0 * k1 + t2 * (4.0 * k2 + t2 * (6.0 * k3 + t2 * 8.0 * k4))
        f = theta * poly - theta_d
        fp = poly + t2 * dpoly
        fp = xp.where(xp.abs(fp) > 1e-9, fp, 1.0)
        theta = xp.clip(theta - f / fp, 0.0, 1.55)
    r = xp.tan(theta)
    scale = xp.where(theta_d > 1e-9, r / xp.where(theta_d > 1e-9, theta_d, 1.0), 1.0)
    return xd * scale, yd * scale


def _undistort_fov(xp, dist, xd, yd):
    # CLOSED-FORM inverse (the FOV model's selling point): ru = tan(rd *
    # omega) / (2 tan(omega/2)). Out-of-domain pixels (rd*omega beyond
    # pi/2) produce garbage tan values that fail the roundtrip check.
    omega = dist[..., 0]
    rd = xp.sqrt(xd * xd + yd * yd)
    small_w = xp.abs(omega) < 1e-8
    safe_w = xp.where(small_w, 1.0, omega)
    tan_half = xp.tan(0.5 * safe_w)
    small_r = rd < 1e-9
    safe_rd = xp.where(small_r, 1.0, rd)
    factor = xp.tan(safe_rd * safe_w) / (2.0 * tan_half * safe_rd)
    factor = xp.where(small_r, safe_w / (2.0 * tan_half), factor)
    factor = xp.where(small_w, xp.ones_like(factor), factor)
    return xd * factor, yd * factor


def _undistort_tpf(xp, dist, xd, yd, iters):
    # Fixed point on the additive polynomial (uu = xd - poly(uu, vv)),
    # then the exact equidistant inverse (r = tan(theta)).
    uu, vv = xd, yd
    for _ in range(iters):
        du, dv = _tpf_poly(xp, dist, uu, vv)
        uu = xd - du
        vv = yd - dv
    theta = xp.sqrt(uu * uu + vv * vv)
    # theta is an ANGLE here; clamp inside (0, pi/2) like the fisheye
    # Newton — beyond-hemisphere pixels land on the clamp and fail the
    # roundtrip check below.
    theta_c = xp.minimum(theta, 1.55)
    r = xp.tan(theta_c)
    scale = xp.where(theta > 1e-9, r / xp.where(theta > 1e-9, theta, 1.0), 1.0)
    return uu * scale, vv * scale


def undistort(model: str, dist, xd, yd, xp=np, iters: int | None = None):
    """Normalized distorted coords -> undistorted coords (iterative,
    except the FOV model whose inverse is closed form).

    Non-converged pixels (outside the lens model's invertible domain)
    come back NaN — callers' finite/bounds masks reject them (see module
    doc). Iteration counts are static, so the jitted form is a fixed
    unrolled elementwise chain.
    """
    _check_model(model)
    if model == "rational":
        x, y = _undistort_rational(
            xp, dist, xd, yd,
            iters if iters is not None else _FIXED_POINT_ITERS,
        )
    elif model == "fov":
        x, y = _undistort_fov(xp, dist, xd, yd)
    elif model == "thin_prism_fisheye":
        x, y = _undistort_tpf(
            xp, dist, xd, yd,
            iters if iters is not None else _FIXED_POINT_ITERS,
        )
    else:
        x, y = _undistort_fisheye(
            xp, dist, xd, yd,
            iters if iters is not None else _NEWTON_ITERS,
        )
    xr, yr = distort(model, dist, x, y, xp=xp)
    err2 = (xr - xd) ** 2 + (yr - yd) ** 2
    bad = ~(err2 < ROUNDTRIP_TOL * ROUNDTRIP_TOL)  # catches NaN err too
    nan_x = xp.full_like(x, float("nan"))
    return xp.where(bad, nan_x, x), xp.where(bad, nan_x, y)


def unproject_dist(intr, dist, model: str, u, v, d, xp=np):
    """Distorted-camera backprojection: pixel + depth -> camera-frame 3D.

    The distorted counterpart of ``ops.pinhole.unproject`` (same +0.5
    pixel-center convention, same d = Z depth semantics): normalize,
    invert the distortion, scale the ray by depth. ``intr`` is
    (fx, fy, cx, cy), ``dist`` the canonical (8,) vector.
    """
    fx, fy, cx, cy = (intr[..., i] for i in range(4))
    ft = fx.dtype  # f32 on device, f64 in host-side (culling) callers
    u = xp.asarray(u).astype(ft)
    v = xp.asarray(v).astype(ft)
    xn = (u + 0.5 - cx) / fx
    yn = (v + 0.5 - cy) / fy
    x, y = undistort(model, dist, xn, yn, xp=xp)
    return xp.stack([d * x, d * y, d * xp.ones_like(x)], axis=-1)


def project_dist(intr, dist, model: str, P, xp=np):
    """Distorted-camera projection: camera-frame 3D -> float pixel coords.

    The distorted counterpart of ``ops.pinhole.project``. Divides by Z
    first (the distortion acts on normalized coordinates), so Z == 0
    yields non-finite coords the caller's masks reject — same contract
    as the pinhole path.
    """
    fx, fy, cx, cy = (intr[..., i] for i in range(4))
    X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
    x = X / Z
    y = Y / Z
    xd, yd = distort(model, dist, x, y, xp=xp)
    return fx * xd + cx, fy * yd + cy


def unproject_any(intr, dist, dist_model: str, u, v, d):
    """Backprojection dispatch (jnp): the exact pinhole path when
    dist_model is "none" (reference parity — untouched program), else the
    distorted unprojection (inline iterative inverse; NaN at
    non-invertible pixels propagates into the callers' finite masks).
    Pure elementwise VPU work either way — hides behind the matching
    gather (BASELINE.md)."""
    import jax.numpy as jnp

    from sucre_tpu.ops.pinhole import Intrinsics, unproject

    if dist_model == "none":
        return unproject(Intrinsics(intr[0], intr[1], intr[2], intr[3]), u, v, d)
    return unproject_dist(intr, dist, dist_model, u, v, d, xp=jnp)


def project_any(intr, dist, dist_model: str, P):
    """Projection dispatch (jnp; see unproject_any)."""
    import jax.numpy as jnp

    from sucre_tpu.ops.pinhole import Intrinsics, project

    if dist_model == "none":
        return project(Intrinsics(intr[0], intr[1], intr[2], intr[3]), P)
    return project_dist(intr, dist, dist_model, P, xp=jnp)


def resolve_dist_model(models) -> str:
    """Resolve a set of per-view model tags to one static tag for a
    stacked program. Pinhole ("none") embeds in a rational stack (the
    zero vector is the exact identity on normalized coordinates); the
    zero-parameter fisheye map is NOT the identity, so fisheye cameras
    cannot share a STACK with anything else — the pipeline buckets views
    into fisheye/non-fisheye stacks and matches across them with
    per-camera (target_tag, view_tag) tuple tags (matching._split_tags),
    so mixed rigs still restore; this error is a guard for direct
    callers who stacked incompatible cameras themselves."""
    models = set(models)
    non_none = models - {"none"}
    if not non_none:
        return "none"
    if non_none == {"rational"}:
        return "rational"
    if len(models) == 1:
        (tag,) = models
        return tag
    raise ValueError(
        "views mix incompatible distortion models (only pinhole embeds in "
        f"a rational stack; every other tag stacks only with itself); got "
        f"{sorted(models)}. Bucket views by ops.distortion.stack_class "
        "first."
    )


def stack_class(tag: str) -> str:
    """Which stack a camera can join: "none"/"rational" embed together
    (the zero vector is the exact rational identity, see
    resolve_dist_model); every other lens family stacks only with itself
    (its zero-parameter map is not the identity). Pipeline bucket keys
    include this class so one survey may carry several lens families."""
    return "std" if tag in ("none", "rational") else tag


def pair_tag(t_tag: str, v_tag: str):
    """Static distortion tag for a (target, view-stack) program: the
    plain joint tag when one expresses both sides (keeping single-rig
    trace signatures and their committed compile caches identical),
    else a per-camera (target_tag, view_tag) tuple (mixed rigs)."""
    # Differing sides always take per-camera tags: for none + rational
    # the zero vector WOULD embed pinhole exactly, but per-side tags skip
    # the pointless 30-iteration identity inversion on the pinhole side
    # (same math, fewer VPU ops); for fisheye mixes there is no embedding.
    return t_tag if t_tag == v_tag else (t_tag, v_tag)


# --- COLMAP camera-model embedding -----------------------------------------

# model name -> (dist_model tag, param layout). Layouts map COLMAP's
# params array (after the intrinsic prefix) into the canonical vector.
COLMAP_DISTORTED_MODELS = (
    "SIMPLE_RADIAL",
    "RADIAL",
    "OPENCV",
    "FULL_OPENCV",
    "OPENCV_FISHEYE",
    "FOV",
    "SIMPLE_RADIAL_FISHEYE",
    "RADIAL_FISHEYE",
    "THIN_PRISM_FISHEYE",
)


def colmap_to_canonical(model_name: str, params) -> tuple[str, np.ndarray, float, float, float, float]:
    """COLMAP camera (model name + params) -> (dist_model tag, canonical
    (8,) dist vector, fx, fy, cx, cy). Raises ValueError on unsupported
    models. Pinhole models come back with tag "none" and a zero vector.
    """
    p = np.asarray(params, dtype=np.float64)
    d = np.zeros(DIST_PARAMS, np.float32)
    if model_name == "PINHOLE":
        fx, fy, cx, cy = p
        return "none", d, fx, fy, cx, cy
    if model_name == "SIMPLE_PINHOLE":
        f, cx, cy = p
        return "none", d, f, f, cx, cy
    if model_name == "SIMPLE_RADIAL":
        f, cx, cy, k = p
        d[0] = k
        return "rational", d, f, f, cx, cy
    if model_name == "RADIAL":
        f, cx, cy, k1, k2 = p
        d[0], d[1] = k1, k2
        return "rational", d, f, f, cx, cy
    if model_name == "OPENCV":
        fx, fy, cx, cy, k1, k2, p1, p2 = p
        d[:4] = (k1, k2, p1, p2)
        return "rational", d, fx, fy, cx, cy
    if model_name == "FULL_OPENCV":
        fx, fy, cx, cy, k1, k2, p1, p2, k3, k4, k5, k6 = p
        d[:] = (k1, k2, p1, p2, k3, k4, k5, k6)
        return "rational", d, fx, fy, cx, cy
    if model_name == "OPENCV_FISHEYE":
        fx, fy, cx, cy, k1, k2, k3, k4 = p
        d[:4] = (k1, k2, k3, k4)
        return "fisheye", d, fx, fy, cx, cy
    if model_name == "SIMPLE_RADIAL_FISHEYE":
        # equidistant with one polynomial term: theta_d = theta (1 + k th^2)
        f, cx, cy, k = p
        d[0] = k
        return "fisheye", d, f, f, cx, cy
    if model_name == "RADIAL_FISHEYE":
        f, cx, cy, k1, k2 = p
        d[0], d[1] = k1, k2
        return "fisheye", d, f, f, cx, cy
    if model_name == "FOV":
        fx, fy, cx, cy, omega = p
        d[0] = omega
        return "fov", d, fx, fy, cx, cy
    if model_name == "THIN_PRISM_FISHEYE":
        # canonical layout keeps COLMAP's own order:
        # (k1, k2, p1, p2, k3, k4, sx1, sy1) — exactly 8 slots
        fx, fy, cx, cy = p[:4]
        d[:] = p[4:]
        return "thin_prism_fisheye", d, fx, fy, cx, cy
    raise ValueError(
        f"camera model {model_name!r} is not supported (supported: "
        f"PINHOLE, SIMPLE_PINHOLE, {', '.join(COLMAP_DISTORTED_MODELS)})"
    )
