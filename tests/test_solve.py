"""Solver tests: torch one-step Adam parity oracle, chunked-gradient
equivalence, convergence on synthetic observations, snapshot cadence."""

import jax.numpy as jnp
import numpy as np

from sucre_tpu.models import init_params
from sucre_tpu.ops.matching import DenseObs
from sucre_tpu.solve import FitConfig, fit
from tests.test_model import make_obs


def _synthetic_obs(rng, V=8, H=6, W=7, B=(0.2, 0.25, 0.3), beta=(0.12, 0.1, 0.08),
                   gamma=(0.35, 0.3, 0.25)):
    """Observations rendered exactly by the formation model from a known J."""
    J = rng.uniform(0.05, 0.95, size=(H, W, 3))
    valid = rng.uniform(size=(V, H, W)) < 0.9
    # ranges between 1.5 and 5 meters, direction mostly +z
    dirs = rng.normal(size=(V, H, W, 3)) * 0.15 + np.array([0, 0, 1.0])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(1.5, 5.0, size=(V, H, W, 1))
    cP = (dirs * r).astype(np.float32)
    z = np.linalg.norm(cP, axis=-1)[..., None]
    B, beta, gamma = (np.asarray(x) for x in (B, beta, gamma))
    I = J[None] * np.exp(-beta * z) + B * (1 - np.exp(-gamma * z))
    obs = DenseObs(
        valid=jnp.array(valid),
        cP=jnp.array(np.where(valid[..., None], cP, 0.0), dtype=jnp.float32),
        I=jnp.array(np.where(valid[..., None], I, 0.0), dtype=jnp.float32),
    )
    return obs, J.astype(np.float32)


def test_one_step_torch_parity(rng):
    """One full-batch Adam step must match an independent torch
    implementation of the reference objective (sucre.py:79-82, 124-148)."""
    import torch

    obs = make_obs(rng, V=4, H=5, W=6)
    J0 = rng.uniform(0, 1, size=(5, 6, 3)).astype(np.float32)
    params = init_params(image=J0)
    n_obs = float(np.asarray(obs.valid).sum())

    res = fit(params, obs, FitConfig(lr=0.05, num_iter=1))

    # --- torch oracle (packed observations, reference-style shapes) ---
    valid = np.asarray(obs.valid)
    k, v, u = np.nonzero(valid)
    cP = torch.tensor(np.asarray(obs.cP)[k, v, u].T)  # (3, N)
    I = torch.tensor(np.asarray(obs.I)[k, v, u].T)  # (3, N)
    tu = torch.tensor(u)
    tv = torch.tensor(v)
    J = torch.nn.Parameter(torch.tensor(J0))
    B = torch.nn.Parameter(torch.full((3, 1), 0.1))
    beta = torch.nn.Parameter(torch.full((3, 1), 0.1))
    gamma = torch.nn.Parameter(torch.full((3, 1), 0.1))
    opt = torch.optim.Adam([J, B, beta, gamma], lr=0.05)
    z = cP.norm(dim=0)
    I_hat = J[tv, tu].T * torch.exp(-beta * z) + B * (1 - torch.exp(-gamma * z))
    loss = torch.square(I - I_hat).sum()
    (loss / n_obs / 3).backward()
    opt.step()

    np.testing.assert_allclose(np.asarray(res.params.B), B.detach().numpy().ravel(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.params.beta), beta.detach().numpy().ravel(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.params.gamma), gamma.detach().numpy().ravel(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.params.J), J.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(float(res.telemetry.cost[0]), float(loss.detach()), rtol=1e-5)


def test_chunked_equals_unchunked(rng):
    obs, _ = _synthetic_obs(rng, V=7)
    params = init_params(image=np.zeros((6, 7, 3), np.float32))
    r1 = fit(params, obs, FitConfig(num_iter=3))
    r2 = fit(params, obs, FitConfig(num_iter=3, view_chunk=2))
    np.testing.assert_allclose(np.asarray(r1.params.B), np.asarray(r2.params.B), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.params.J), np.asarray(r2.params.J), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.telemetry.cost), np.asarray(r2.telemetry.cost), rtol=1e-5)


def test_convergence_direct(rng):
    obs, J_true = _synthetic_obs(rng)
    params = init_params(image=J_true + rng.normal(scale=0.05, size=J_true.shape).astype(np.float32))
    res = fit(params, obs, FitConfig(num_iter=150))
    cost = np.asarray(res.telemetry.cost)
    assert cost[-1] < cost[0] * 0.05
    assert np.all(np.isfinite(np.asarray(res.params.J)))


def test_convergence_closed_form(rng):
    obs, J_true = _synthetic_obs(rng)
    params = init_params(use_closed_form=True)
    res = fit(params, obs, FitConfig(num_iter=150, use_closed_form=True))
    cost = np.asarray(res.telemetry.cost)
    assert cost[-1] < cost[0] * 0.05
    # closed-form J approaches the true restored image on observed pixels
    observed = np.asarray(res.observed)
    err = np.abs(np.asarray(res.J) - J_true)[observed]
    assert np.median(err) < 0.05


def test_snapshot_cadence(rng):
    obs, _ = _synthetic_obs(rng, V=4)
    params = init_params(use_closed_form=True)
    iters = []
    res = fit(
        params,
        obs,
        FitConfig(num_iter=7, use_closed_form=True, save_interval=3),
        snapshot_fn=lambda i, p, J, o: iters.append(i),
    )
    assert iters == [0, 3, 6]
    assert len(res.telemetry.cost) == 7


def test_telemetry_shapes(rng):
    obs, _ = _synthetic_obs(rng, V=4)
    params = init_params(use_closed_form=True)
    res = fit(params, obs, FitConfig(num_iter=5, use_closed_form=True))
    assert res.telemetry.B.shape == (5, 3)
    assert res.telemetry.cost.shape == (5,)
    # cost strictly decreasing at the start of optimization
    assert res.telemetry.cost[1] < res.telemetry.cost[0]


def test_compact_layout_equals_full(rng):
    """Fit on the z-only/u8 compact layout must equal the full cP/f32
    layout exactly (z precompute and /255 fusion are value-preserving)."""
    import jax

    obs, _ = _synthetic_obs(rng, V=5)
    # Recast I as u8-sourced colors (exactly representable)
    I_u8 = (np.asarray(obs.I) * 255).round().astype(np.uint8)
    I_f32 = (I_u8 / 255).astype(np.float32)
    obs_full = DenseObs(valid=obs.valid, cP=obs.cP, I=jnp.asarray(I_f32))
    obs_compact = DenseObs(
        valid=obs.valid, cP=obs.cP, I=jnp.asarray(I_u8)
    ).compact()
    assert obs_compact.cP is None and obs_compact.z is not None
    assert obs_compact.I.dtype == jnp.uint8

    params = init_params(image=np.zeros((6, 7, 3), np.float32))
    r_full = fit(params, obs_full, FitConfig(num_iter=4))
    r_comp = fit(params, obs_compact, FitConfig(num_iter=4))
    np.testing.assert_allclose(
        np.asarray(r_full.params.B), np.asarray(r_comp.params.B), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_full.telemetry.cost), np.asarray(r_comp.telemetry.cost), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(r_full.J), np.asarray(r_comp.J), atol=1e-5)

    # closed form too
    pcf = init_params(use_closed_form=True)
    r1 = fit(pcf, obs_full, FitConfig(num_iter=3, use_closed_form=True))
    r2 = fit(pcf, obs_compact, FitConfig(num_iter=3, use_closed_form=True))
    np.testing.assert_allclose(np.asarray(r1.J), np.asarray(r2.J), atol=1e-5)

    # chunked grad accumulation handles the compact layout
    r3 = fit(params, obs_compact, FitConfig(num_iter=4, view_chunk=2))
    np.testing.assert_allclose(
        np.asarray(r_comp.telemetry.cost), np.asarray(r3.telemetry.cost), rtol=1e-5
    )


def test_light_model_requires_full_layout(rng):
    obs, _ = _synthetic_obs(rng, V=3)
    compact = obs.compact()
    params = init_params(light_model=True, use_closed_form=True)
    from sucre_tpu.models.sucre import obs_l_z
    import pytest as _pytest

    with _pytest.raises(ValueError, match="light model requires"):
        obs_l_z(params, compact)
