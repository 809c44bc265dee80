"""Formation-model tests: golden values, closed-form WLS correctness,
light-model math, NaN export parity."""

import jax
import jax.numpy as jnp
import numpy as np

from sucre_tpu.models import (
    closed_form_J,
    compute_l_z,
    formation_forward,
    init_params,
    residual_loss,
    restored_image_nan,
)
from sucre_tpu.ops.matching import DenseObs


def make_obs(rng, V=3, H=4, W=5, valid_p=0.8):
    valid = rng.uniform(size=(V, H, W)) < valid_p
    cP = rng.uniform(0.5, 3.0, size=(V, H, W, 3)).astype(np.float32)
    cP = np.where(valid[..., None], cP, 0.0).astype(np.float32)
    I = rng.uniform(0.0, 1.0, size=(V, H, W, 3)).astype(np.float32)
    I = np.where(valid[..., None], I, 0.0).astype(np.float32)
    return DenseObs(valid=jnp.array(valid), cP=jnp.array(cP), I=jnp.array(I))


def test_forward_golden(rng):
    obs = make_obs(rng)
    H, W = 4, 5
    J = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
    params = init_params(image=J)
    I_hat = formation_forward(params, params.J, obs.cP, obs.valid)
    # numpy oracle
    z = np.linalg.norm(np.where(np.asarray(obs.valid)[..., None], np.asarray(obs.cP), 1.0), axis=-1)
    z = np.where(np.asarray(obs.valid), z, 0.0)[..., None]
    expect = J[None] * np.exp(-0.1 * z) + 0.1 * (1 - np.exp(-0.1 * z))
    np.testing.assert_allclose(
        np.asarray(I_hat)[np.asarray(obs.valid)], expect[np.asarray(obs.valid)], rtol=1e-5
    )


def test_residual_loss_masks_invalid(rng):
    obs = make_obs(rng, valid_p=0.5)
    J = rng.uniform(0, 1, size=(4, 5, 3)).astype(np.float32)
    params = init_params(image=J)
    n = float(np.asarray(obs.valid).sum())
    nl, cost = residual_loss(params, params.J, obs, n)
    I_hat = np.asarray(formation_forward(params, params.J, obs.cP, obs.valid))
    sq = (np.asarray(obs.I) - I_hat) ** 2
    expect = sq[np.asarray(obs.valid)].sum()
    np.testing.assert_allclose(float(cost), expect, rtol=1e-5)
    np.testing.assert_allclose(float(nl), expect / n / 3, rtol=1e-5)


def test_closed_form_is_wls_optimum(rng):
    """closed_form_J must equal the per-pixel weighted LS solution, and be a
    local minimum of the residual in J."""
    obs = make_obs(rng, V=6)
    params = init_params(use_closed_form=True)
    J, observed = closed_form_J(params, obs)
    # numpy oracle: J = sum a (I - bs) / sum a^2
    valid = np.asarray(obs.valid)
    z = np.linalg.norm(np.where(valid[..., None], np.asarray(obs.cP), 1.0), axis=-1)
    z = np.where(valid, z, 0.0)[..., None]
    a = np.exp(-0.1 * z)
    bs = 0.1 * (1 - np.exp(-0.1 * z))
    m = valid[..., None]
    num = (np.where(m, a * (np.asarray(obs.I) - bs), 0)).sum(0)
    den = (np.where(m, a * a, 0)).sum(0)
    expect = np.where(den > 0, num / np.maximum(den, 1e-30), 0)
    np.testing.assert_allclose(np.asarray(J), expect, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(observed), (den > 0)[..., 0])
    # optimality: gradient of cost wrt J is ~0 at the closed form
    g = jax.grad(lambda Jx: residual_loss(params, Jx, obs, 1.0)[0])(J)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-4)


def test_light_model_golden(rng):
    obs = make_obs(rng, V=2)
    params = init_params(light_model=True, use_closed_form=True)
    # perturb the light params so the test is non-trivial
    params = params._replace(
        cam2light=jnp.array([0.05, -0.02, 0.01, 0.1, -0.1, 0.05], jnp.float32),
        sigma=jnp.array([[1.2, 0.1], [-0.2, 0.9]], jnp.float32),
    )
    l, z = compute_l_z(params, obs.cP, obs.valid)
    valid = np.asarray(obs.valid)
    # numpy oracle (reference math, sucre.py:52-64)
    from scipy.linalg import expm

    w1, w2, w3, p1, p2, p3 = np.asarray(params.cam2light, np.float64)
    T = expm(np.array([[0, -w3, w2, p1], [w3, 0, -w1, p2], [-w2, w1, 0, p3], [0, 0, 0, 0]]))
    R, t = T[:3, :3], T[:3, 3]
    sigma = np.asarray(params.sigma, np.float64)
    Sigma = sigma.T @ sigma
    Sinv = np.linalg.inv(Sigma)
    cP = np.asarray(obs.cP, np.float64)
    lP = np.einsum("ij,...j->...i", R, cP) + t
    lp = lP[..., :2] / lP[..., 2:3]
    q = np.einsum("...i,ij,...j->...", lp, Sinv, lp)
    l_ref = np.exp(-q / 2)
    z_ref = np.linalg.norm(cP, axis=-1) + np.linalg.norm(lP, axis=-1)
    np.testing.assert_allclose(np.asarray(l)[valid], l_ref[valid], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z)[valid], z_ref[valid], rtol=1e-4)
    # masked entries contribute zero and finite gradients
    g = jax.grad(
        lambda p: jnp.sum(jnp.where(obs.valid, compute_l_z(p, obs.cP, obs.valid)[0], 0.0))
    )(params)
    assert np.all(np.isfinite(np.asarray(g.cam2light)))
    assert np.all(np.isfinite(np.asarray(g.sigma)))


def test_restored_image_nan():
    J = jnp.ones((2, 2, 3))
    mask = jnp.array([[True, False], [True, True]])
    out = np.asarray(restored_image_nan(J, mask[..., None]))
    assert np.all(np.isnan(out[0, 1]))
    assert np.all(out[0, 0] == 1.0)
