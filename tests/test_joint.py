"""Joint shared-globals fit: T=1 reproduces the single-image fit; joint
estimation over many targets recovers the water parameters better than
per-image fits on the same data."""

import jax.numpy as jnp
import numpy as np

from sucre_tpu.models import init_params
from sucre_tpu.parallel.batch import stack_obs
from sucre_tpu.parallel.joint import fit_joint, init_joint_params
from sucre_tpu.solve import FitConfig, fit
from tests.test_solve import _synthetic_obs


def test_joint_single_target_equals_fit(rng):
    obs, _ = _synthetic_obs(rng, V=5, H=6, W=7)
    image = np.zeros((6, 7, 3), np.float32)
    single = fit(init_params(image=image), obs, FitConfig(num_iter=5, use_pallas=False))
    jp = init_joint_params(images=[image])
    params, J, observed, tel = fit_joint(jp, stack_obs([obs]), FitConfig(num_iter=5))
    np.testing.assert_allclose(np.asarray(params.B), np.asarray(single.params.B), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J[0]), np.asarray(single.J), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tel.cost[:, 0]), np.asarray(single.telemetry.cost), rtol=1e-5
    )


def test_joint_improves_global_recovery(rng):
    """With shared globals over 6 'images', beta recovery beats the average
    single-image fit at the same iteration budget."""
    true_beta = np.array([0.12, 0.1, 0.08])
    obs_list = [_synthetic_obs(rng, V=6, H=8, W=9)[0] for _ in range(6)]
    iters = 120

    errs_single = []
    for o in obs_list:
        r = fit(init_params(use_closed_form=True), o,
                FitConfig(num_iter=iters, use_closed_form=True))
        errs_single.append(np.abs(np.asarray(r.params.beta) - true_beta).mean())

    jp = init_joint_params(T=6, use_closed_form=True)
    params, J, observed, tel = fit_joint(
        jp, stack_obs(obs_list), FitConfig(num_iter=iters, use_closed_form=True)
    )
    err_joint = np.abs(np.asarray(params.beta) - true_beta).mean()
    assert err_joint <= np.mean(errs_single) + 1e-6
    # all targets' costs decreased
    assert np.all(np.asarray(tel.cost[-1]) < np.asarray(tel.cost[0]))
    assert J.shape == (6, 8, 9, 3)


def test_joint_light_model(rng):
    obs_list = [_synthetic_obs(rng, V=3, H=6, W=7)[0] for _ in range(2)]
    jp = init_joint_params(T=2, light_model=True, use_closed_form=True)
    params, J, observed, tel = fit_joint(
        jp, stack_obs(obs_list), FitConfig(num_iter=5, use_closed_form=True)
    )
    assert np.all(np.isfinite(np.asarray(params.cam2light)))
    assert np.all(np.isfinite(np.asarray(tel.cost)))


def test_joint_kernel_equals_xla(rng):
    """Joint fits routed through the fused kernels (per-target passes,
    shared-global gradients summed) must match the autodiff path — both
    without and with the light model."""
    import dataclasses

    from sucre_tpu.ops.matching import DenseObs

    T, V, H, W = 2, 3, 8, 16

    def mk(seed, with_cP):
        r = np.random.default_rng(seed)
        valid = r.uniform(size=(V, H, W)) < 0.8
        dirs = r.normal(size=(V, H, W, 3)) * 0.1 + np.array([0, 0, 1.0])
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        cP = np.where(
            valid[..., None],
            (dirs * r.uniform(1.5, 4.0, size=(V, H, W, 1))).astype(np.float32),
            0.0,
        ).astype(np.float32)
        I = r.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
        obs = DenseObs(valid=jnp.asarray(valid), cP=jnp.asarray(cP), I=jnp.asarray(I))
        return obs if with_cP else obs.compact()

    for light in (False, True):
        so = stack_obs([mk(t, with_cP=light) for t in range(T)])
        imgs = [
            np.random.default_rng(9).uniform(0, 1, size=(H, W, 3)).astype(np.float32)
            for _ in range(T)
        ]
        jp = init_joint_params(images=imgs, T=T, light_model=light)
        cfg = FitConfig(num_iter=4)
        pa, Ja, oa, ta = fit_joint(jp, so, dataclasses.replace(cfg, use_pallas=True))
        pb, Jb, ob, tb = fit_joint(jp, so, dataclasses.replace(cfg, use_pallas=False))
        np.testing.assert_allclose(
            np.asarray(ta.cost), np.asarray(tb.cost), rtol=1e-4, err_msg=f"light={light}"
        )
        np.testing.assert_allclose(
            np.asarray(pa.B), np.asarray(pb.B), atol=1e-4, err_msg=f"light={light}"
        )
        np.testing.assert_allclose(
            np.asarray(pa.beta), np.asarray(pb.beta), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jb), atol=1e-3)


def test_restore_survey_rejects_multi_batch_joint(tmp_path):
    """joint_params = ONE shared water model across ALL targets; a batch
    split would silently fit one model per batch, so restore_survey
    refuses it (the CLI avoids it by raising batch_targets)."""
    import pytest

    from sucre_tpu.pipeline import RestoreConfig, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path, n_views=4, width=48, height=36)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    with pytest.raises(ValueError, match="single batch"):
        restore_survey(
            scene, sd.names, tmp_path / "out",
            RestoreConfig(num_iter=1, verbose=False, store="memory",
                          joint_params=True),
            batch_targets=2,
        )
