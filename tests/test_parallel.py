"""Sharding tests on the virtual 8-device CPU mesh: sharded fit ==
unsharded fit; batched multi-target fit == per-target fits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sucre_tpu.models import init_params
from sucre_tpu.parallel import (
    fit_many,
    fit_sharded,
    make_mesh,
    pad_obs_to_mesh,
    shard_obs,
    stack_obs,
    stack_params,
)
from sucre_tpu.solve import FitConfig, fit
from tests.test_solve import _synthetic_obs


def test_mesh_shapes():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"view": 2, "row": 4}
    with pytest.raises(ValueError):
        make_mesh(4, 4)


def test_pad_and_shard(rng):
    obs, _ = _synthetic_obs(rng, V=5, H=6, W=7)
    mesh = make_mesh(2, 4)
    padded = pad_obs_to_mesh(obs, mesh)
    assert padded.valid.shape == (6, 8, 7)  # V 5->6, H 6->8
    assert int(padded.valid.sum()) == int(obs.valid.sum())
    sharded = shard_obs(padded, mesh)
    assert sharded.cP.sharding.spec == jax.sharding.PartitionSpec("view", "row", None, None)


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_sharded_equals_unsharded(rng, closed_form):
    obs, J_true = _synthetic_obs(rng, V=8, H=8, W=7)
    image = None if closed_form else np.zeros((8, 7, 3), np.float32)
    params = init_params(image=image, use_closed_form=closed_form)
    cfg = FitConfig(num_iter=5, use_closed_form=closed_form)
    ref = fit(params, obs, cfg)
    mesh = make_mesh(2, 4)
    got = fit_sharded(params, obs, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got.params.B), np.asarray(ref.params.B), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.J), np.asarray(ref.J), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-4
    )
    assert got.J.shape == (8, 7, 3)


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_many_equals_individual(rng, closed_form):
    T = 3
    obs_list, params_list, refs = [], [], []
    cfg = FitConfig(num_iter=4, use_closed_form=closed_form)
    for t in range(T):
        obs, _ = _synthetic_obs(rng, V=4 + t, H=6, W=7)  # ragged V: exercises padding
        image = None if closed_form else np.full((6, 7, 3), 0.1 * t, np.float32)
        p = init_params(image=image, use_closed_form=closed_form)
        obs_list.append(obs)
        params_list.append(p)
        refs.append(fit(p, obs, cfg))
    params, J, observed, tel = fit_many(
        stack_params(params_list), stack_obs(obs_list), cfg
    )
    assert J.shape == (T, 6, 7, 3)
    assert tel.cost.shape == (4, T)
    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(params.B[t]), np.asarray(refs[t].params.B), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(J[t]), np.asarray(refs[t].J), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(tel.cost[:, t]), np.asarray(refs[t].telemetry.cost), rtol=1e-4
        )


def test_fit_many_sharded_batch(rng):
    T = 8
    cfg = FitConfig(num_iter=3, use_closed_form=True)
    obs_list = [_synthetic_obs(rng, V=4, H=6, W=7)[0] for _ in range(T)]
    params_list = [init_params(use_closed_form=True) for _ in range(T)]
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), axis_names=("batch",))
    params, J, observed, tel = fit_many(
        stack_params(params_list), stack_obs(obs_list), cfg, mesh=mesh
    )
    assert J.shape == (T, 6, 7, 3)
    # all targets actually optimized
    assert np.all(np.asarray(tel.cost[-1]) < np.asarray(tel.cost[0]))


def test_shard_targets():
    from sucre_tpu.parallel.multihost import shard_targets

    targets = [f"img_{i}" for i in range(10)]
    shards = [shard_targets(targets, process_id=p, num_processes=3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(targets)
    assert shards[0] == ["img_0", "img_3", "img_6", "img_9"]
    # single process = everything
    assert shard_targets(targets, process_id=0, num_processes=1) == targets
