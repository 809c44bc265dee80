"""Fused light-model Pallas kernel vs XLA autodiff: cost and every
gradient (J, B, beta, gamma, cam2light, sigma) must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sucre_tpu.models.sucre import SucreParams, residual_loss
from sucre_tpu.ops.matching import DenseObs
from sucre_tpu.ops.pallas.light_kernel import (
    fused_light_fit_grads,
    light_kernel_supported,
)

INTERPRET = jax.default_backend() != "tpu"


def _light_obs(rng, V=4, H=8, W=16):
    valid = rng.uniform(size=(V, H, W)) < 0.85
    dirs = rng.normal(size=(V, H, W, 3)) * 0.15 + np.array([0, 0, 1.0])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cP = (dirs * rng.uniform(1.5, 4.0, size=(V, H, W, 1))).astype(np.float32)
    cP = np.where(valid[..., None], cP, 0.0).astype(np.float32)
    I = (rng.uniform(0, 256, size=(V, H, W, 3))).astype(np.uint8)
    I = np.where(valid[..., None], I, 0).astype(np.uint8)
    return DenseObs(valid=jnp.asarray(valid), cP=jnp.asarray(cP), I=jnp.asarray(I))


def _light_params(rng, H=8, W=16):
    return SucreParams(
        B=jnp.asarray([0.12, 0.1, 0.08], jnp.float32),
        beta=jnp.asarray([0.2, 0.15, 0.1], jnp.float32),
        gamma=jnp.asarray([0.3, 0.25, 0.2], jnp.float32),
        J=jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        cam2light=jnp.asarray(
            np.array([0.03, -0.02, 0.05, 0.1, -0.15, 0.08], np.float32)
        ),
        sigma=jnp.asarray(np.array([[1.2, 0.1], [-0.05, 0.9]], np.float32)),
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_light_kernel_grads_equal_autodiff(rng, seed):
    rng = np.random.default_rng(seed)
    obs = _light_obs(rng)
    params = _light_params(rng)
    n_obs = jnp.float32(float(np.asarray(obs.valid).sum()))

    def loss_fn(p):
        nl, cost = residual_loss(p, p.J, obs, n_obs)
        return nl, cost

    (_, cost_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)

    cost, dJ, dB, dbeta, dgamma, dc2l, dsig = fused_light_fit_grads(
        params.J, params.B, params.beta, params.gamma,
        params.cam2light, params.sigma, obs.cP, obs.I, interpret=INTERPRET,
    )
    s = 1.0 / (n_obs * 3.0)  # kernel sums are unnormalized
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dJ) * s, np.asarray(g_ref.J), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dB) * s, np.asarray(g_ref.B), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dbeta) * s, np.asarray(g_ref.beta), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dgamma) * s, np.asarray(g_ref.gamma), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(dc2l) * s, np.asarray(g_ref.cam2light), rtol=5e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(dsig) * s, np.asarray(g_ref.sigma), rtol=5e-4, atol=1e-7
    )


def test_light_kernel_padding_invariance(rng):
    """Ragged V/H/W (padding in every axis) must not change any output."""
    obs = _light_obs(rng, V=3, H=7, W=13)
    params = _light_params(rng, H=7, W=13)
    n_obs = jnp.float32(float(np.asarray(obs.valid).sum()))

    def loss_fn(p):
        nl, cost = residual_loss(p, p.J, obs, n_obs)
        return nl, cost

    (_, cost_ref), g_ref = jax.value_and_grad(loss_fn, has_aux=True)(params)
    cost, dJ, dB, *_ = fused_light_fit_grads(
        params.J, params.B, params.beta, params.gamma,
        params.cam2light, params.sigma, obs.cP, obs.I, interpret=INTERPRET,
    )
    s = 1.0 / (n_obs * 3.0)
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dJ) * s, np.asarray(g_ref.J), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dB) * s, np.asarray(g_ref.B), rtol=2e-4)


def test_light_kernel_supported_widths():
    assert light_kernel_supported(960)
    assert light_kernel_supported(2048)
    assert not light_kernel_supported(2049)


def test_fit_light_kernel_equals_xla(rng):
    """solve.fit with the fused light kernel (use_pallas=True) must equal
    the XLA-autodiff fit across iterations."""
    from sucre_tpu.solve import FitConfig, fit

    rng = np.random.default_rng(1)
    obs = _light_obs(rng)
    params = _light_params(rng)
    ref = fit(params, obs, FitConfig(num_iter=6, use_pallas=False))
    got = fit(params, obs, FitConfig(num_iter=6, use_pallas=True))
    np.testing.assert_allclose(np.asarray(got.params.B), np.asarray(ref.params.B), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(got.params.cam2light), np.asarray(ref.params.cam2light), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.params.sigma), np.asarray(ref.params.sigma), atol=2e-6
    )
    np.testing.assert_allclose(np.asarray(got.J), np.asarray(ref.J), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(got.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-5
    )


def test_batched_light_grads_equal_single(rng):
    """fused_light_fit_grads_batched == per-target single-kernel calls."""
    from sucre_tpu.ops.pallas.light_kernel import (
        fused_light_fit_grads,
        fused_light_fit_grads_batched,
        prepare_light_obs_batched,
    )

    T, V, H, W = 3, 2, 8, 16
    valid = rng.uniform(size=(T, V, H, W)) < 0.8
    dirs = rng.normal(size=(T, V, H, W, 3)) * 0.1 + np.array([0, 0, 1.0])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cP = np.where(
        valid[..., None],
        (dirs * rng.uniform(1.5, 4.0, size=(T, V, H, W, 1))).astype(np.float32),
        0.0,
    ).astype(np.float32)
    I = rng.integers(0, 256, size=(T, V, H, W, 3), dtype=np.uint8)
    J = rng.uniform(0, 1, size=(T, H, W, 3)).astype(np.float32)
    B = rng.uniform(0.05, 0.2, size=(T, 3)).astype(np.float32)
    beta = rng.uniform(0.05, 0.2, size=(T, 3)).astype(np.float32)
    gamma = rng.uniform(0.05, 0.2, size=(T, 3)).astype(np.float32)
    c2l = (rng.normal(size=(T, 6)) * 0.05).astype(np.float32)
    sigma = np.tile(np.eye(2, dtype=np.float32), (T, 1, 1)) + (
        rng.normal(size=(T, 2, 2)) * 0.02
    ).astype(np.float32)

    cPt, It = prepare_light_obs_batched(jnp.asarray(cP), jnp.asarray(I))
    outs_b = fused_light_fit_grads_batched(
        jnp.asarray(J), jnp.asarray(B), jnp.asarray(beta), jnp.asarray(gamma),
        jnp.asarray(c2l), jnp.asarray(sigma), cPt, It, interpret=True,
    )
    for t in range(T):
        outs_s = fused_light_fit_grads(
            jnp.asarray(J[t]), jnp.asarray(B[t]), jnp.asarray(beta[t]),
            jnp.asarray(gamma[t]), jnp.asarray(c2l[t]), jnp.asarray(sigma[t]),
            jnp.asarray(cP[t]), jnp.asarray(I[t]), interpret=True,
        )
        for name, a, b in zip(
            ("cost", "dJ", "dB", "dbeta", "dgamma", "dc2l", "dsigma"),
            [o[t] for o in outs_b],
            outs_s,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
            )
