"""Hypothesis property tests for the lens-distortion contract
(ops/distortion.py:54-59): over physically-plausible coefficient ranges,
for every model tag,

  1. the forward distortion is FINITE on the sampled normalized domain;
  2. every inversion either roundtrips through the forward model within
     ROUNDTRIP_TOL or comes back NaN — NEVER a wrong finite value (the
     matching geometry silently trusts non-NaN inversions);
  3. the f64-host (numpy, culling path) and f32-jnp (device matching
     path) inversions agree: the well-interior region is valid in both,
     and where both are valid they produce the same ray.

The fixed-vector parity/roundtrip tests live in test_distortion.py; this
file sweeps the coefficient DOMAIN (VERDICT r3 item 5). Ranges are
conservative real-lens envelopes chosen so the rational denominator
cannot cross zero inside the sampled radius (beyond that the forward
model itself is non-physical).

Example counts stay small (suite budget, 1-core VM); deadline=None
because jnp dispatch time would trip per-example deadlines.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sucre_tpu.ops.distortion import ROUNDTRIP_TOL, distort, undistort

finite = dict(allow_nan=False, allow_infinity=False)

# Normalized-coordinate sample grid: radius up to ~1.2 (a 100-degree
# full-FOV pinhole), odd count so the exact center (always invertible)
# is included.
_AXIS = np.linspace(-0.85, 0.85, 9)
_GX, _GY = (a.ravel() for a in np.meshgrid(_AXIS, _AXIS))
_CENTER = np.hypot(_GX, _GY) <= 0.5  # well-interior region


def _vec(*coeffs) -> np.ndarray:
    d = np.zeros(8, np.float64)
    d[: len(coeffs)] = coeffs
    return d


def _contract(model: str, d: np.ndarray) -> None:
    # 1. forward finite on the domain (f64 host path)
    xd, yd = distort(model, d, _GX, _GY, xp=np)
    assert np.isfinite(xd).all() and np.isfinite(yd).all(), (
        f"{model} forward distortion non-finite at plausible coefficients"
    )

    # 2. inversion: NaN or a true preimage — never a wrong finite value
    xu, yu = undistort(model, d, xd, yd, xp=np)
    val64 = np.isfinite(xu) & np.isfinite(yu)
    xr, yr = distort(
        model, d, np.where(val64, xu, 0.0), np.where(val64, yu, 0.0), xp=np
    )
    err = np.hypot(xr - xd, yr - yd)
    assert (err[val64] <= ROUNDTRIP_TOL).all(), (
        f"{model}: finite inversion missing its forward roundtrip "
        f"(max err {err[val64].max():.2e})"
    )

    # 3. f32-jnp path: same validity on the well-interior region, same
    # rays where both are valid (the domain boundary may legitimately
    # flip validity between precisions; the interior may not)
    xu32, yu32 = undistort(
        model,
        jnp.asarray(d, jnp.float32),
        jnp.asarray(xd, jnp.float32),
        jnp.asarray(yd, jnp.float32),
        xp=jnp,
    )
    xu32 = np.asarray(xu32, np.float64)
    yu32 = np.asarray(yu32, np.float64)
    val32 = np.isfinite(xu32) & np.isfinite(yu32)
    assert val64[_CENTER].all(), f"{model}: f64 inversion failed interior points"
    assert val32[_CENTER].all(), f"{model}: f32 inversion failed interior points"
    both = val64 & val32
    np.testing.assert_allclose(xu32[both], xu[both], atol=2e-3)
    np.testing.assert_allclose(yu32[both], yu[both], atol=2e-3)


@settings(max_examples=25, deadline=None)
@given(
    st.floats(-0.4, 0.4, **finite),    # k1
    st.floats(-0.1, 0.1, **finite),    # k2
    st.floats(-0.01, 0.01, **finite),  # p1
    st.floats(-0.01, 0.01, **finite),  # p2
    st.floats(-0.05, 0.05, **finite),  # k3
    st.floats(-0.1, 0.1, **finite),    # k4
    st.floats(-0.05, 0.05, **finite),  # k5
    st.floats(-0.02, 0.02, **finite),  # k6
)
def test_rational_contract(k1, k2, p1, p2, k3, k4, k5, k6):
    _contract("rational", _vec(k1, k2, p1, p2, k3, k4, k5, k6))


@settings(max_examples=25, deadline=None)
@given(
    st.floats(-0.15, 0.1, **finite),
    st.floats(-0.05, 0.05, **finite),
    st.floats(-0.02, 0.02, **finite),
    st.floats(-0.01, 0.01, **finite),
)
def test_fisheye_contract(k1, k2, k3, k4):
    _contract("fisheye", _vec(k1, k2, k3, k4))


@settings(max_examples=25, deadline=None)
@given(st.floats(-1.4, 1.4, **finite))
def test_fov_contract(omega):
    _contract("fov", _vec(omega))


@settings(max_examples=25, deadline=None)
@given(
    st.floats(-0.1, 0.1, **finite),      # k1
    st.floats(-0.05, 0.05, **finite),    # k2
    st.floats(-0.005, 0.005, **finite),  # p1
    st.floats(-0.005, 0.005, **finite),  # p2
    st.floats(-0.02, 0.02, **finite),    # k3
    st.floats(-0.01, 0.01, **finite),    # k4
    st.floats(-0.005, 0.005, **finite),  # sx1
    st.floats(-0.005, 0.005, **finite),  # sy1
)
def test_thin_prism_fisheye_contract(k1, k2, p1, p2, k3, k4, sx1, sy1):
    _contract("thin_prism_fisheye", _vec(k1, k2, p1, p2, k3, k4, sx1, sy1))


def test_out_of_domain_poisons_not_lies():
    """Past the invertible radius the inversion must come back NaN, and
    a crafted far-out-of-domain input must never return a wrong finite
    pair (the documented NaN-poison contract on the boundary itself)."""
    d = _vec(-0.4, 0.1)  # strong barrel: r_d saturates, far points lose
    xd = np.array([0.0, 0.3, 5.0, 50.0])
    yd = np.zeros_like(xd)
    xu, yu = undistort("rational", d, xd, yd, xp=np)
    val = np.isfinite(xu)
    xr, _ = distort("rational", d, np.where(val, xu, 0.0),
                    np.where(val, yu, 0.0), xp=np)
    assert val[0] and val[1]
    assert (np.abs(xr[val] - xd[val]) <= ROUNDTRIP_TOL).all()
