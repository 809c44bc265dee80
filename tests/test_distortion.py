"""Distortion-model parity and contract tests (ops/distortion.py).

Parity anchor is OpenCV: COLMAP's SIMPLE_RADIAL/RADIAL/OPENCV/FULL_OPENCV
models are the OpenCV rational polynomial and OPENCV_FISHEYE is the
OpenCV equidistant fisheye, so ``cv2.projectPoints`` /
``cv2.fisheye.projectPoints`` are executable ground truth for the
forward map, and composing OUR inverse with CV2's forward proves the
inverse against the same ground truth independent of cv2's internal
iteration counts.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sucre_tpu.ops import distortion as D

# Realistic coefficient sets (GoPro-ish wide angle, mild tangential).
RATIONAL_5 = np.array([-0.28, 0.07, 1e-3, -5e-4, 0.015, 0.0, 0.0, 0.0], np.float64)
RATIONAL_8 = np.array([-0.3, 0.09, 8e-4, -6e-4, 0.02, -0.05, 0.011, -0.002], np.float64)
FISHEYE_4 = np.array([-0.04, 0.01, -0.005, 0.001, 0, 0, 0, 0], np.float64)


def _norm_grid(rmax=0.7, n=21):
    """Grid of normalized image-plane coords with radius <= rmax."""
    x, y = np.meshgrid(np.linspace(-rmax, rmax, n), np.linspace(-rmax, rmax, n))
    keep = x * x + y * y <= rmax * rmax
    return x[keep], y[keep]


@pytest.mark.parametrize("dist", [RATIONAL_5, RATIONAL_8], ids=["cv5", "cv8"])
def test_rational_forward_matches_cv2(dist):
    x, y = _norm_grid()
    P = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 1, 3)
    K = np.array([[500.0, 0, 320.0], [0, 510.0, 240.0], [0, 0, 1]])
    cv_px, _ = cv2.projectPoints(
        P, np.zeros(3), np.zeros(3), K, dist.reshape(1, 8)
    )
    intr = np.array([500.0, 510.0, 320.0, 240.0])
    u, v = D.project_dist(intr, dist, "rational", P[:, 0, :], xp=np)
    np.testing.assert_allclose(u, cv_px[:, 0, 0], rtol=0, atol=1e-9)
    np.testing.assert_allclose(v, cv_px[:, 0, 1], rtol=0, atol=1e-9)


def test_fisheye_forward_matches_cv2():
    x, y = _norm_grid(rmax=1.2)  # fisheye handles wide angles
    P = np.stack([x, y, np.ones_like(x)], -1).reshape(1, -1, 3)
    K = np.array([[400.0, 0, 321.0], [0, 405.0, 239.0], [0, 0, 1]])
    cv_px, _ = cv2.fisheye.projectPoints(
        P, np.zeros(3), np.zeros(3), K, FISHEYE_4[:4].reshape(4, 1)
    )
    intr = np.array([400.0, 405.0, 321.0, 239.0])
    u, v = D.project_dist(intr, FISHEYE_4, "fisheye", P[0], xp=np)
    np.testing.assert_allclose(u, cv_px[0, :, 0], rtol=0, atol=1e-8)
    np.testing.assert_allclose(v, cv_px[0, :, 1], rtol=0, atol=1e-8)


@pytest.mark.parametrize(
    "model,dist,rmax",
    [("rational", RATIONAL_5, 0.7), ("rational", RATIONAL_8, 0.7),
     ("fisheye", FISHEYE_4, 1.2)],
    ids=["cv5", "cv8", "fisheye"],
)
def test_undistort_inverts_cv2_forward(model, dist, rmax):
    """our_undistort(xd) pushed through CV2's forward model returns xd."""
    x, y = _norm_grid(rmax=rmax)
    xd, yd = D.distort(model, dist, x, y, xp=np)
    xu, yu = D.undistort(model, dist, xd, yd, xp=np)
    assert np.isfinite(xu).all(), "interior pixels must invert"
    P = np.stack([xu, yu, np.ones_like(xu)], -1)
    if model == "rational":
        cv_px, _ = cv2.projectPoints(
            P.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), np.eye(3),
            dist.reshape(1, 8),
        )
        back = cv_px[:, 0, :]
    else:
        cv_px, _ = cv2.fisheye.projectPoints(
            P.reshape(1, -1, 3), np.zeros(3), np.zeros(3), np.eye(3),
            dist[:4].reshape(4, 1),
        )
        back = cv_px[0]
    np.testing.assert_allclose(back[:, 0], xd, rtol=0, atol=1e-8)
    np.testing.assert_allclose(back[:, 1], yd, rtol=0, atol=1e-8)


@pytest.mark.parametrize(
    "model,dist", [("rational", RATIONAL_8), ("fisheye", FISHEYE_4)],
    ids=["rational", "fisheye"],
)
def test_roundtrip_jnp_f32(model, dist):
    """The jitted f32 path (what matching runs) round-trips to subpixel."""
    x, y = _norm_grid(rmax=0.65)
    d32 = jnp.asarray(dist, jnp.float32)

    @jax.jit
    def rt(x, y):
        xd, yd = D.distort(model, d32, x, y, xp=jnp)
        return D.undistort(model, d32, xd, yd, xp=jnp)

    xu, yu = rt(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(np.asarray(xu), x, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yu), y, rtol=0, atol=2e-5)


def test_zero_coeffs_rational_is_exact_identity():
    x, y = _norm_grid()
    zero = np.zeros(8)
    xd, yd = D.distort("rational", zero, x, y, xp=np)
    assert (xd == x).all() and (yd == y).all()
    xu, yu = D.undistort("rational", zero, x, y, xp=np)
    assert (xu == x).all() and (yu == y).all()


def test_diverged_pixels_become_nan():
    # Strong barrel distortion folds at large radius: the forward map is
    # non-injective there and the inverse must refuse, not hallucinate.
    dist = np.array([-0.5, 0, 0, 0, 0, 0, 0, 0], np.float64)
    xu, yu = D.undistort("rational", dist, np.array([5.0]), np.array([0.0]), xp=np)
    assert np.isnan(xu).all() and np.isnan(yu).all()
    # Fisheye: theta_d beyond the model's reach.
    xu, yu = D.undistort("fisheye", FISHEYE_4, np.array([9.0]), np.array([0.0]), xp=np)
    assert np.isnan(xu).all()


def test_unproject_project_roundtrip_pixel_centers():
    intr = np.array([500.0, 505.0, 320.0, 240.0])
    u, v = np.meshgrid(np.arange(0, 640, 37, np.float64),
                       np.arange(0, 480, 31, np.float64))
    d = np.full_like(u, 2.5)
    for model, dist in [("rational", RATIONAL_5), ("fisheye", FISHEYE_4)]:
        P = D.unproject_dist(intr, dist, model, u, v, d, xp=np)
        assert np.allclose(P[..., 2], 2.5)
        uu, vv = D.project_dist(intr, dist, model, P, xp=np)
        np.testing.assert_allclose(uu, u + 0.5, atol=1e-6 * 500)  # 1e-6 normalized
        np.testing.assert_allclose(vv, v + 0.5, atol=1e-6 * 500)


def test_colmap_to_canonical_embeddings():
    tag, d, fx, fy, cx, cy = D.colmap_to_canonical("PINHOLE", [500, 510, 320, 240])
    assert tag == "none" and (d == 0).all() and (fx, fy) == (500, 510)
    tag, d, fx, fy, cx, cy = D.colmap_to_canonical("SIMPLE_PINHOLE", [450, 320, 240])
    assert tag == "none" and fx == fy == 450
    tag, d, *_ = D.colmap_to_canonical("SIMPLE_RADIAL", [450, 320, 240, -0.1])
    assert tag == "rational" and d[0] == np.float32(-0.1) and (d[1:] == 0).all()
    tag, d, *_ = D.colmap_to_canonical("RADIAL", [450, 320, 240, -0.1, 0.02])
    assert tag == "rational" and tuple(d[:2]) == (np.float32(-0.1), np.float32(0.02))
    tag, d, fx, fy, *_ = D.colmap_to_canonical(
        "OPENCV", [500, 510, 320, 240, -0.1, 0.02, 1e-3, -2e-3])
    assert tag == "rational" and d[2] == np.float32(1e-3) and (d[4:] == 0).all()
    tag, d, *_ = D.colmap_to_canonical(
        "FULL_OPENCV", [500, 510, 320, 240, -0.1, 0.02, 1e-3, -2e-3,
                        0.004, -0.03, 0.006, -0.0007])
    assert tag == "rational" and d[7] == np.float32(-0.0007)
    tag, d, *_ = D.colmap_to_canonical(
        "OPENCV_FISHEYE", [500, 510, 320, 240, -0.04, 0.01, -0.005, 0.001])
    assert tag == "fisheye" and d[3] == np.float32(0.001) and (d[4:] == 0).all()
    tag, d, fx, fy, *_ = D.colmap_to_canonical(
        "SIMPLE_RADIAL_FISHEYE", [450, 320, 240, -0.04])
    assert tag == "fisheye" and fx == fy == 450
    assert d[0] == np.float32(-0.04) and (d[1:] == 0).all()
    tag, d, *_ = D.colmap_to_canonical("RADIAL_FISHEYE", [450, 320, 240, -0.04, 0.01])
    assert tag == "fisheye" and tuple(d[:2]) == (np.float32(-0.04), np.float32(0.01))
    tag, d, fx, fy, *_ = D.colmap_to_canonical("FOV", [500, 510, 320, 240, 0.9])
    assert tag == "fov" and d[0] == np.float32(0.9) and (d[1:] == 0).all()
    assert (fx, fy) == (500, 510)
    tag, d, *_ = D.colmap_to_canonical(
        "THIN_PRISM_FISHEYE",
        [500, 510, 320, 240, -0.03, 0.008, 6e-4, -4e-4, -0.002, 5e-4, 8e-4, -5e-4])
    assert tag == "thin_prism_fisheye"
    np.testing.assert_allclose(
        d, np.float32([-0.03, 0.008, 6e-4, -4e-4, -0.002, 5e-4, 8e-4, -5e-4]))
    with pytest.raises(ValueError, match="not supported"):
        D.colmap_to_canonical("NOT_A_MODEL", [500, 320, 240, 0.9])


# --- FOV and THIN_PRISM_FISHEYE (no cv2 analog: the oracle is COLMAP's
# documented math, written out independently below in straight-line f64) --

FOV_W = np.array([0.9, 0, 0, 0, 0, 0, 0, 0], np.float64)
TPF_8 = np.array([-0.03, 0.008, 6e-4, -4e-4, -0.002, 5e-4, 8e-4, -5e-4],
                 np.float64)


def _fov_forward_oracle(omega, x, y):
    # Devernay-Faugeras: rd = atan(2 ru tan(omega/2)) / omega, per
    # COLMAP's FOVCameraModel::Distortion.
    ru = np.sqrt(x * x + y * y)
    factor = np.arctan(2.0 * ru * np.tan(omega / 2.0)) / (ru * omega)
    return x * factor, y * factor


def _tpf_forward_oracle(d, x, y):
    # COLMAP ThinPrismFisheyeCameraModel::WorldToImage: equidistant angle
    # mapping, then radial(r^8) + tangential + thin prism on the
    # theta-scaled coordinates.
    k1, k2, p1, p2, k3, k4, sx1, sy1 = d
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    uu = theta * x / r
    vv = theta * y / r
    r2 = uu * uu + vv * vv
    radial = k1 * r2 + k2 * r2**2 + k3 * r2**3 + k4 * r2**4
    du = uu * radial + 2 * p1 * uu * vv + p2 * (r2 + 2 * uu * uu) + sx1 * r2
    dv = vv * radial + p1 * (r2 + 2 * vv * vv) + 2 * p2 * uu * vv + sy1 * r2
    return uu + du, vv + dv


def test_fov_forward_matches_colmap_formula():
    x, y = _norm_grid(rmax=1.2)
    keep = x * x + y * y > 1e-18  # the oracle divides by r; our r -> 0
    x, y = x[keep], y[keep]       # guard is covered by the roundtrips
    xd, yd = D.distort("fov", FOV_W, x, y, xp=np)
    xo, yo = _fov_forward_oracle(0.9, x, y)
    np.testing.assert_allclose(xd, xo, rtol=0, atol=1e-14)
    np.testing.assert_allclose(yd, yo, rtol=0, atol=1e-14)


def test_tpf_forward_matches_colmap_formula():
    x, y = _norm_grid(rmax=1.2)
    keep = x * x + y * y > 1e-18
    x, y = x[keep], y[keep]
    xd, yd = D.distort("thin_prism_fisheye", TPF_8, x, y, xp=np)
    xo, yo = _tpf_forward_oracle(TPF_8, x, y)
    np.testing.assert_allclose(xd, xo, rtol=0, atol=1e-14)
    np.testing.assert_allclose(yd, yo, rtol=0, atol=1e-14)


def test_fov_inverse_is_closed_form_exact():
    """The FOV inverse is analytic — the f64 roundtrip hits machine
    epsilon, not an iteration tolerance."""
    x, y = _norm_grid(rmax=1.2)
    xd, yd = D.distort("fov", FOV_W, x, y, xp=np)
    xu, yu = D.undistort("fov", FOV_W, xd, yd, xp=np)
    np.testing.assert_allclose(xu, x, rtol=0, atol=1e-13)
    np.testing.assert_allclose(yu, y, rtol=0, atol=1e-13)


def test_tpf_undistort_inverts_forward():
    x, y = _norm_grid(rmax=1.0)
    xd, yd = D.distort("thin_prism_fisheye", TPF_8, x, y, xp=np)
    xu, yu = D.undistort("thin_prism_fisheye", TPF_8, xd, yd, xp=np)
    assert np.isfinite(xu).all(), "interior pixels must invert"
    np.testing.assert_allclose(xu, x, rtol=0, atol=1e-10)
    np.testing.assert_allclose(yu, y, rtol=0, atol=1e-10)


@pytest.mark.parametrize(
    "model,dist", [("fov", FOV_W), ("thin_prism_fisheye", TPF_8)],
    ids=["fov", "tpf"],
)
def test_roundtrip_jnp_f32_new_models(model, dist):
    x, y = _norm_grid(rmax=0.65)
    d32 = jnp.asarray(dist, jnp.float32)

    @jax.jit
    def rt(x, y):
        xd, yd = D.distort(model, d32, x, y, xp=jnp)
        return D.undistort(model, d32, xd, yd, xp=jnp)

    xu, yu = rt(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(np.asarray(xu), x, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(yu), y, rtol=0, atol=2e-5)


def test_fov_out_of_domain_becomes_nan():
    # rd * omega beyond pi/2 is outside the model's image: tan blows up
    # and the roundtrip check must poison, not hallucinate.
    xu, yu = D.undistort("fov", FOV_W, np.array([2.0]), np.array([0.0]), xp=np)
    assert np.isnan(xu).all() and np.isnan(yu).all()


def test_new_tags_stack_rules():
    assert D.stack_class("fov") == "fov"
    assert D.stack_class("thin_prism_fisheye") == "thin_prism_fisheye"
    assert D.resolve_dist_model(["fov", "fov"]) == "fov"
    assert D.resolve_dist_model(["thin_prism_fisheye"]) == "thin_prism_fisheye"
    for mix in (["none", "fov"], ["rational", "fov"],
                ["fov", "fisheye"], ["none", "thin_prism_fisheye"]):
        with pytest.raises(ValueError, match="stack"):
            D.resolve_dist_model(mix)
