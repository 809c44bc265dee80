"""Mid-run checkpoint/resume: a fit interrupted at iteration k and resumed
must produce bit-identical results to an uninterrupted run."""

import numpy as np
import pytest

from sucre_tpu.models import init_params
from sucre_tpu.solve import FitConfig, fit
from sucre_tpu.utils import fit_checkpoint as fckpt
from tests.test_solve import _synthetic_obs


def test_resume_exact(rng, tmp_path):
    obs, _ = _synthetic_obs(rng, V=4, H=6, W=7)
    params = init_params(image=np.zeros((6, 7, 3), np.float32))

    ref = fit(params, obs, FitConfig(num_iter=10))

    ck = tmp_path / "ck"
    # Run 1: checkpoints every 4 iters, "crashes" after 8 (we emulate by
    # running only 8 iterations with checkpointing on).
    fit(params, obs, FitConfig(num_iter=8, checkpoint_dir=ck, checkpoint_interval=4))
    snaps = sorted(p.name for p in ck.glob("fit_state_*.npz"))
    assert snaps == ["fit_state_000004.npz"]  # no snapshot at the final iter

    # Run 2: resume to 10 total iterations from the iteration-4 state.
    res = fit(params, obs, FitConfig(num_iter=10, checkpoint_dir=ck, checkpoint_interval=4))
    np.testing.assert_allclose(np.asarray(res.params.B), np.asarray(ref.params.B), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.params.J), np.asarray(ref.params.J), atol=1e-7)
    # telemetry covers only the resumed iterations 4..9
    assert res.telemetry.cost.shape == (6,)
    np.testing.assert_allclose(
        res.telemetry.cost, np.asarray(ref.telemetry.cost)[4:], rtol=1e-6
    )


def test_resume_past_end(rng, tmp_path):
    obs, _ = _synthetic_obs(rng, V=3)
    params = init_params(use_closed_form=True)
    ck = tmp_path / "ck"
    fit(params, obs, FitConfig(num_iter=6, use_closed_form=True,
                               checkpoint_dir=ck, checkpoint_interval=3))
    # resume with num_iter == already-completed checkpoint count
    res = fit(params, obs, FitConfig(num_iter=3, use_closed_form=True,
                                     checkpoint_dir=ck, checkpoint_interval=3))
    assert res.telemetry.cost.shape == (0,)
    assert np.isfinite(np.asarray(res.J)).all()


def test_state_shape_mismatch_raises(rng, tmp_path):
    obs, _ = _synthetic_obs(rng, V=3)
    params = init_params(image=np.zeros((6, 7, 3), np.float32))
    import optax

    opt_state = optax.adam(0.05).init(params)
    fckpt.save_fit_state(tmp_path, 2, params, opt_state)
    bad = init_params(image=np.zeros((5, 7, 3), np.float32))
    bad_state = optax.adam(0.05).init(bad)
    with pytest.raises(ValueError, match="shape"):
        fckpt.load_fit_state(fckpt.latest_fit_state(tmp_path), bad, bad_state)


def test_changed_fit_flags_refused(rng, tmp_path):
    """A checkpoint from a --light-model run must refuse to resume a
    no-light fit (different params pytree): silently loading the
    overlapping leaves would resume a DIFFERENT objective at iteration N
    with foreign Adam moments."""
    import optax

    light = init_params(
        image=np.zeros((6, 7, 3), np.float32), light_model=True
    )
    fckpt.save_fit_state(tmp_path, 5, light, optax.adam(0.05).init(light))
    plain = init_params(image=np.zeros((6, 7, 3), np.float32))
    with pytest.raises(ValueError, match="fit configuration"):
        fckpt.load_fit_state(
            fckpt.latest_fit_state(tmp_path), plain, optax.adam(0.05).init(plain)
        )
