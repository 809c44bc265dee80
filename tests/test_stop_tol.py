"""Measured-convergence early stop (--stop-tol).

The reference always runs exactly num_iter full-batch Adam iterations
(sucre.py:291); stop_tol is an opt-in framework extension that ends the
fit once the relative cost improvement per stop_check-iteration window
stalls (|rate| < tol) for EVERY target. These tests pin:

  - parity: default (stop_tol=None) runs exactly num_iter iterations on
    every path;
  - the stop is never premature: the run stops at the FIRST boundary
    where the criterion holds on its own cost series and at none before
    (including the measured closed-form overshoot, where cost transiently
    RISES — the |rate| form must keep running through it);
  - the early-stopped trajectory is the full run's prefix (segmented
    scans are mathematically the single scan).
"""

import numpy as np
import pytest

from sucre_tpu.models import init_params
from sucre_tpu.solve import FitConfig, fit, improvement_converged
from tests.test_solve import _synthetic_obs


def _boundary_costs(cost: np.ndarray, window: int):
    """Segment-end costs the segmented driver measures: cost[w-1],
    cost[2w-1], ... over a full-run series."""
    return [
        (k + min(window, len(cost) - k) - 1, min(window, len(cost) - k))
        for k in range(0, len(cost), window)
    ]


def _predicted_stop(cost: np.ndarray, window: int, tol: float) -> int:
    """Iteration count at which the segmented driver stops, replayed on a
    full-run cost series."""
    prev = None
    for end, n in _boundary_costs(cost, window):
        if improvement_converged(prev, cost[end], n, window, tol):
            return end + 1
        prev = cost[end]
    return len(cost)


@pytest.fixture()
def obs_params(rng):
    obs, _ = _synthetic_obs(rng, V=8, H=12, W=14)
    params = init_params(image=np.zeros((12, 14, 3), np.float32))
    return obs, params


def test_default_runs_exactly_num_iter(obs_params):
    """Parity: without stop_tol the fit runs every iteration."""
    obs, params = obs_params
    res = fit(params, obs, FitConfig(num_iter=60))
    assert len(res.telemetry.cost) == 60


def test_invalid_stop_config_rejected():
    """stop_check=0 would crash the sequential segment planner and make
    the batched paths stop after one segment (rate scaled by 0 is always
    < tol); both degenerate configs must be rejected up front."""
    with pytest.raises(ValueError, match="stop_check"):
        FitConfig(stop_tol=0.05, stop_check=0)
    with pytest.raises(ValueError, match="stop_check"):
        FitConfig(stop_tol=0.05, stop_check=-3)
    with pytest.raises(ValueError, match="stop_tol"):
        FitConfig(stop_tol=0.0)
    # stop_check alone (stop_tol off) stays unvalidated: it is inert
    FitConfig(stop_check=0)


def test_stop_tol_stops_early_and_exactly_at_criterion(obs_params):
    """The run ends at the FIRST boundary where its own cost series
    satisfies the criterion — never before, never after — and early
    enough to matter."""
    obs, params = obs_params
    cfg_full = FitConfig(num_iter=300)
    full = fit(params, obs, cfg_full)
    c_full = np.asarray(full.telemetry.cost)

    tol, window = 0.15, 10
    cfg = FitConfig(num_iter=300, stop_tol=tol, stop_check=window)
    res = fit(params, obs, cfg)
    c = np.asarray(res.telemetry.cost)

    assert len(c) < 300, "expected an early stop on this workload"
    assert len(c) % window == 0
    # trajectory is the full run's prefix (segmentation changes nothing)
    np.testing.assert_allclose(c, c_full[: len(c)], rtol=1e-4)
    # stopped exactly where the criterion first holds on the full series
    assert len(c) == _predicted_stop(c_full, window, tol)
    # and the criterion genuinely held nowhere earlier
    prev = None
    for end, n in _boundary_costs(c[:-window], window):
        assert not improvement_converged(prev, c[end], n, window, tol)
        prev = c[end]


def test_overshoot_does_not_stop(rng):
    """Closed-form fits on exact-model data transiently INCREASE cost
    (Adam overshoot ~iteration 40) before falling many more orders of
    magnitude; a signed improvement-below-tol criterion would stop right
    there. The |rate| form must run through it."""
    obs, _ = _synthetic_obs(rng, V=8, H=12, W=14)
    params = init_params(use_closed_form=True)
    cfg = FitConfig(
        num_iter=120, use_closed_form=True, stop_tol=0.05, stop_check=10
    )
    res = fit(params, obs, cfg)
    c = np.asarray(res.telemetry.cost)
    # the series rises somewhere (the overshoot this test exists for) ...
    ends = [c[e] for e, _ in _boundary_costs(c, 10)]
    assert any(b > a for a, b in zip(ends, ends[1:])), (
        "workload no longer overshoots; pick one that does"
    )
    # ... and the run kept going through it (cost improves hugely after)
    assert len(c) == 120
    assert c[-1] < 0.05 * c[39]


def test_fit_many_stops_when_all_targets_converge(rng):
    """Batched stop: the fit runs until EVERY target's improvement
    stalls, and the early trajectory is the full batched run's prefix."""
    from sucre_tpu.parallel.batch import fit_many, stack_obs, stack_params

    obs_list, params_list = [], []
    for t in range(2):
        o, _ = _synthetic_obs(np.random.default_rng(t), V=6, H=10, W=12)
        obs_list.append(o.compact())
        params_list.append(init_params(image=np.zeros((10, 12, 3), np.float32)))
    so = stack_obs(obs_list)
    sp = stack_params(params_list)

    full = fit_many(sp, so, FitConfig(num_iter=300))
    c_full = np.asarray(full[3].cost)  # (300, 2)

    tol, window = 0.15, 10
    p, J, observed, tel = fit_many(
        sp, so, FitConfig(num_iter=300, stop_tol=tol, stop_check=window)
    )
    c = np.asarray(tel.cost)
    assert 0 < len(c) < 300 and len(c) % window == 0
    np.testing.assert_allclose(c, c_full[: len(c)], rtol=1e-4)
    # per-target predictions: the batch stops at the LATEST target's stop
    stops = [_predicted_stop(c_full[:, t], window, tol) for t in range(2)]
    assert len(c) == max(stops)
    # results are usable (J finalized after the early stop)
    assert J.shape == (2, 10, 12, 3)
    assert bool(np.asarray(observed).any())
    np.testing.assert_allclose(
        np.asarray(p.B), np.asarray(full[0].B), atol=0.05
    )


def test_fit_many_joint_stop_tol_smoke(rng):
    """The joint fit's segmented stop runs and finalizes."""
    from sucre_tpu.parallel.joint import JointParams, fit_joint

    obs_list = []
    for t in range(2):
        o, _ = _synthetic_obs(np.random.default_rng(t), V=6, H=10, W=12)
        obs_list.append(o.compact())
    from sucre_tpu.parallel.batch import stack_obs

    so = stack_obs(obs_list)
    jp = JointParams(
        B=np.full((3,), 0.1, np.float32),
        beta=np.full((3,), 0.1, np.float32),
        gamma=np.full((3,), 0.1, np.float32),
        J=np.zeros((2, 10, 12, 3), np.float32),
    )
    params, J, observed, tel = fit_joint(
        jp, so, FitConfig(num_iter=300, stop_tol=0.15, stop_check=10)
    )
    c = np.asarray(tel.cost)
    assert 0 < len(c) < 300 and len(c) % 10 == 0
    assert J.shape == (2, 10, 12, 3)
    full = fit_joint(jp, so, FitConfig(num_iter=300))
    np.testing.assert_allclose(c, np.asarray(full[3].cost)[: len(c)], rtol=1e-4)


def test_sharded_kernel_stop_tol(rng):
    """stop_tol on the (view x row) sharded-kernel batched route stops
    early and matches the unsegmented run's prefix (interpret mode)."""
    from sucre_tpu.parallel.batch import fit_many, stack_obs, stack_params
    from sucre_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 4)
    obs_list, params_list = [], []
    for t in range(2):
        o, _ = _synthetic_obs(np.random.default_rng(t), V=4, H=16, W=16)
        obs_list.append(o.compact())
        params_list.append(init_params(image=np.zeros((16, 16, 3), np.float32)))
    so = stack_obs(obs_list)
    sp = stack_params(params_list)
    cfg = FitConfig(num_iter=60, stop_tol=0.2, stop_check=10, use_pallas=True)
    p, J, observed, tel = fit_many(sp, so, cfg, mesh=mesh)
    c = np.asarray(tel.cost)
    assert len(c) % 10 == 0 and len(c) <= 60
    full = fit_many(
        sp, so, FitConfig(num_iter=60, use_pallas=True), mesh=mesh
    )
    np.testing.assert_allclose(c, np.asarray(full[3].cost)[: len(c)], rtol=1e-4)
    assert J.shape == (2, 16, 16, 3)


def test_cli_stop_tol_reports_fewer_iters(tmp_path):
    """--stop-tol drives the batched CLI path end to end; the report's
    per-target iteration counts come in under --num-iter."""
    import json

    from sucre_tpu.cli import main
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "scene", n_views=4)
    out = tmp_path / "out"
    rc = main([
        "--image-dir", str(sd.image_dir), "--depth-dir", str(sd.depth_dir),
        "--model-dir", str(sd.model_dir), "--output-dir", str(out),
        "--image-ids", "0", "9", "--num-iter", "300",
        "--stop-tol", "0.15", "--stop-check", "10",
        "--store", "memory", "--quiet", "--report",
    ])
    assert rc == 0
    report = json.loads((out / "report.json").read_text())
    iters = [t["iters"] for t in report["targets"]]
    assert iters and all(0 < i < 300 and i % 10 == 0 for i in iters)


def test_snapshot_segments_do_not_perturb_stop_point(obs_params):
    """Convergence must be evaluated ONLY at the stop_check cadence:
    save_interval carves extra (down to 1-iteration) segments into the
    plan, and a single-step cost delta extrapolated x stop_check is
    noise — before the cadence gate, a near-zero 1-step delta at any
    plateau or turning point stopped the fit at a non-check boundary."""
    obs, params = obs_params
    tol, window = 0.15, 10
    cfg = FitConfig(num_iter=300, stop_tol=tol, stop_check=window)
    base = fit(params, obs, cfg)
    n_base = len(np.asarray(base.telemetry.cost))
    assert n_base < 300 and n_base % window == 0

    # save_interval=7 makes segment bounds {1, 8, 15, ...} ∪ {10, 20, ...}:
    # plenty of 1-3 iteration segments, including some ending adjacent to
    # check boundaries
    cfg_snap = FitConfig(
        num_iter=300, stop_tol=tol, stop_check=window, save_interval=7
    )
    snaps = []
    res = fit(params, obs, cfg_snap, snapshot_fn=lambda it, p, J, o: snaps.append(it))
    c = np.asarray(res.telemetry.cost)
    assert len(c) == n_base, (
        "snapshot-induced segments changed the stop iteration"
    )
    np.testing.assert_allclose(c, np.asarray(base.telemetry.cost), rtol=1e-4)
    assert snaps, "snapshot_fn never fired"
