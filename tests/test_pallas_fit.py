"""Fused fit kernel vs XLA autodiff: exact gradient agreement (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sucre_tpu.models import init_params
from sucre_tpu.models.sucre import residual_loss
from sucre_tpu.ops.matching import DenseObs
from sucre_tpu.ops.pallas.fit_kernel import fused_fit_grads


@pytest.mark.parametrize("u8", [True, False])
def test_fused_grads_match_autodiff(rng, u8):
    V, H, W = 3, 40, 130  # exercises padding (H->64, W->256)
    z = rng.uniform(1.0, 5.0, (V, H, W)).astype(np.float32)
    z[rng.uniform(size=z.shape) < 0.2] = 0.0  # invalid entries
    if u8:
        I = rng.integers(0, 256, (V, H, W, 3), np.uint8)
        I_f32 = (I / 255).astype(np.float32)
    else:
        I = rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32)
        I_f32 = I
    valid = z > 0
    I = np.where(valid[..., None], I, 0).astype(I.dtype)
    I_f32 = np.where(valid[..., None], I_f32, 0).astype(np.float32)
    J = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    params = init_params(image=J)
    params = params._replace(
        B=jnp.array([0.2, 0.22, 0.25]), beta=jnp.array([0.1, 0.12, 0.09]),
        gamma=jnp.array([0.3, 0.28, 0.33]),
    )

    obs = DenseObs(valid=jnp.array(valid), cP=None, I=jnp.array(I_f32), z=jnp.array(z))

    def loss(p):
        nl, cost = residual_loss(p, p.J, obs, 1.0)
        return cost  # unnormalized, matching the kernel output

    cost_ref, grads_ref = jax.value_and_grad(loss)(params)

    cost, dJ, dB, dbeta, dgamma = fused_fit_grads(
        params.J, params.B, params.beta, params.gamma,
        jnp.array(z), jnp.array(I), interpret=True,
    )
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dJ), np.asarray(grads_ref.J), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(grads_ref.B), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dbeta), np.asarray(grads_ref.beta), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dgamma), np.asarray(grads_ref.gamma), rtol=1e-4, atol=1e-4)


def test_fused_grads_all_invalid(rng):
    z = np.zeros((2, 32, 128), np.float32)
    I = np.zeros((2, 32, 128, 3), np.uint8)
    J = rng.uniform(0, 1, (32, 128, 3)).astype(np.float32)
    cost, dJ, dB, dbeta, dgamma = fused_fit_grads(
        jnp.array(J), jnp.full((3,), 0.1), jnp.full((3,), 0.1), jnp.full((3,), 0.1),
        jnp.array(z), jnp.array(I), interpret=True,
    )
    assert float(cost) == 0.0
    np.testing.assert_array_equal(np.asarray(dJ), 0.0)
    np.testing.assert_array_equal(np.asarray(dB), 0.0)


def test_occupancy_skip_equals_dense(rng):
    """Tile-skipping (empty (row-tile, view-block) grid steps bypassed,
    the partial-overlap fit win) is exactly lossless: a sparse stack —
    one fully-empty view, one view with a single populated row tile —
    produces bit-identical outputs with occupancy on and off."""
    from sucre_tpu.ops.pallas.fit_kernel import (
        VB,
        fused_fit_grads_prepared,
        occupancy,
        prepare_obs,
        row_tile,
    )

    V, H, W = 5, 96, 130
    z = rng.uniform(1.0, 5.0, (V, H, W)).astype(np.float32)
    z[1] = 0.0  # empty view
    z[2, row_tile(256):] = 0.0  # only the first row tile populated
    z[4, : 2 * row_tile(256)] = 0.0  # only the tail tile populated
    I = rng.integers(0, 256, (V, H, W, 3), np.uint8)
    I = np.where((z > 0)[..., None], I, 0).astype(np.uint8)
    J = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    B = jnp.array([0.2, 0.22, 0.25])
    beta = jnp.array([0.1, 0.12, 0.09])
    gamma = jnp.array([0.3, 0.28, 0.33])

    zt, It = prepare_obs(jnp.array(z), jnp.array(I))
    occ = occupancy(zt)
    occ_np = np.asarray(occ)
    assert occ_np.shape == (1, zt.shape[2] // row_tile(zt.shape[3]), zt.shape[1] // VB)
    assert occ_np.sum() < occ_np.size  # some blocks actually skip

    dense = fused_fit_grads_prepared(
        jnp.array(J), B, beta, gamma, zt, It, interpret=True
    )
    skipped = fused_fit_grads_prepared(
        jnp.array(J), B, beta, gamma, zt, It, occ=occ, interpret=True
    )
    for a, b in zip(dense, skipped):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_with_pallas_matches_xla(rng):
    """fit(use_pallas=True) (interpret on CPU) must match the XLA path."""
    from sucre_tpu.solve import FitConfig, fit
    from tests.test_solve import _synthetic_obs

    obs, _ = _synthetic_obs(rng, V=4, H=12, W=16)
    I_u8 = (np.asarray(obs.I) * 255).round().astype(np.uint8)
    obs_c = DenseObs(valid=obs.valid, cP=obs.cP, I=jnp.asarray(I_u8)).compact()
    params = init_params(image=np.zeros((12, 16, 3), np.float32))
    r_xla = fit(params, obs_c, FitConfig(num_iter=5, use_pallas=False))
    r_pls = fit(params, obs_c, FitConfig(num_iter=5, use_pallas=True))
    np.testing.assert_allclose(
        np.asarray(r_xla.telemetry.cost), np.asarray(r_pls.telemetry.cost), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_xla.params.B), np.asarray(r_pls.params.B), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(r_xla.J), np.asarray(r_pls.J), atol=1e-5)


def test_fit_many_with_pallas_matches_xla(rng):
    from sucre_tpu.parallel.batch import fit_many, stack_obs, stack_params
    from sucre_tpu.solve import FitConfig
    from tests.test_solve import _synthetic_obs

    obs_list, params_list = [], []
    for t in range(2):
        obs, _ = _synthetic_obs(rng, V=3, H=10, W=12)
        I_u8 = (np.asarray(obs.I) * 255).round().astype(np.uint8)
        obs_list.append(DenseObs(valid=obs.valid, cP=obs.cP, I=jnp.asarray(I_u8)).compact())
        params_list.append(init_params(image=np.full((10, 12, 3), 0.2 * t, np.float32)))
    sp, so = stack_params(params_list), stack_obs(obs_list)
    cfg_x = FitConfig(num_iter=4, use_pallas=False)
    cfg_p = FitConfig(num_iter=4, use_pallas=True)
    px, Jx, ox, tx = fit_many(sp, so, cfg_x)
    pp, Jp, op, tp = fit_many(sp, so, cfg_p)
    np.testing.assert_allclose(np.asarray(tx.cost), np.asarray(tp.cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Jx), np.asarray(Jp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(px.B), np.asarray(pp.B), atol=1e-6)


def test_fused_grads_wide_image_tile(rng):
    """Widths past 1024 lanes select the 16-row tile (adaptive VMEM
    budget); gradients must still match autodiff exactly."""
    from sucre_tpu.ops.pallas.fit_kernel import kernel_supported, row_tile

    assert row_tile(1024) == 32 and row_tile(1152) == 16
    assert kernel_supported(1920) and not kernel_supported(2100)

    V, H, W = 2, 20, 1100  # Wp=1152 -> th=16
    z = rng.uniform(1.0, 5.0, (V, H, W)).astype(np.float32)
    z[rng.uniform(size=z.shape) < 0.2] = 0.0
    I = rng.integers(0, 256, (V, H, W, 3), np.uint8)
    valid = z > 0
    I = np.where(valid[..., None], I, 0).astype(np.uint8)
    I_f32 = (I / 255).astype(np.float32)
    J = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    params = init_params(image=J)
    obs = DenseObs(valid=jnp.array(valid), cP=None, I=jnp.array(I_f32), z=jnp.array(z))

    def loss(p):
        nl, cost = residual_loss(p, p.J, obs, 1.0)
        return cost

    cost_ref, grads_ref = jax.value_and_grad(loss)(params)
    cost, dJ, dB, dbeta, dgamma = fused_fit_grads(
        params.J, params.B, params.beta, params.gamma,
        jnp.array(z), jnp.array(I), interpret=True,
    )
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dJ), np.asarray(grads_ref.J), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dB), np.asarray(grads_ref.B), rtol=1e-4, atol=1e-4)
