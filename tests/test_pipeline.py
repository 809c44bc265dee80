"""End-to-end pipeline tests on the synthetic scene: the full minimum slice
(SURVEY.md §7 step 6) — match, store lifecycle, fit, artifacts, recovery of
the ground-truth restored image."""

from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.pipeline import RestoreConfig, restore_image
from sucre_tpu.scene import Scene
from sucre_tpu.store import MatchesFile
from sucre_tpu.utils import checkpoint as ckpt
from sucre_tpu.models.sucre import init_params
from tests.synthetic import make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scene")
    scene_def = make_scene(tmp, n_views=5, width=64, height=48)
    return scene_def


def _psnr(a, b, mask):
    mse = np.mean((a[mask] - b[mask]) ** 2)
    return 10 * np.log10(1.0 / mse)


class TestEndToEnd:
    def test_restore_recovers_ground_truth(self, scene_dir, tmp_path):
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        out = tmp_path / "out"
        cfg = RestoreConfig(num_iter=200, verbose=False, keep_matches=True)
        res = restore_image(scene, "img_002.png", out, cfg)

        # Observations: 5 views x ~full coverage of the overlapping region
        assert res.n_obs > 5 * 0.5 * 64 * 48

        # The restored J approximates the true plane texture as seen by
        # the target camera (per-view ground truth from the generator).
        J_true = scene_dir.J_views[2]

        valid = res.valid & ~np.isnan(res.J).any(axis=-1)
        assert valid.mean() > 0.9
        # Ceiling is set by the 8-bit quantization of the rendered inputs
        # (the ~1/255 noise is amplified by exp(beta*z) in the inversion);
        # ~24 dB is the expected recovery at these settings.
        psnr = _psnr(res.J, J_true.astype(np.float32), valid)
        assert psnr > 23.0, f"PSNR {psnr:.2f} dB too low"

        # Global-parameter recovery: beta approaches truth (fully converging
        # B/gamma takes far more than the default 200 full-batch Adam
        # iterations — identical behavior to the reference, whose math this
        # solver matches step-for-step; see test_solve one-step parity).
        np.testing.assert_allclose(np.asarray(res.params.beta), scene_dir.beta, atol=0.05)

        # Artifacts with reference-parity names
        assert (out / "img_002_rgb.png").exists()
        assert (out / "img_002_reconstruction.png").exists()
        assert (out / "img_002.npz").exists()
        assert (out / "img_002.h5").exists()  # keep_matches

        # Cost decreased substantially
        cost = np.asarray(res.telemetry.cost)
        assert cost[-1] < cost[0] * 0.1

    def test_cache_lifecycle(self, scene_dir, tmp_path):
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        out = tmp_path / "out"
        cfg = RestoreConfig(num_iter=2, verbose=False, keep_matches=True)
        res1 = restore_image(scene, "img_001.png", out, cfg)
        h5 = out / "img_001.h5"
        assert h5.exists()
        mtime = h5.stat().st_mtime_ns

        # Second run reuses the cache (same file, untouched)
        res2 = restore_image(scene, "img_001.png", out, cfg)
        assert h5.stat().st_mtime_ns == mtime
        assert res2.n_obs == res1.n_obs

        # force recompute rewrites it
        cfg2 = RestoreConfig(num_iter=2, verbose=False, force_compute_matches=True)
        restore_image(scene, "img_001.png", out, cfg2)
        assert not h5.exists()  # keep_matches=False deletes it

    def test_closed_form_mode(self, scene_dir, tmp_path):
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        cfg = RestoreConfig(num_iter=100, verbose=False, use_closed_form=True)
        res = restore_image(scene, "img_002.png", tmp_path / "out", cfg)
        cost = np.asarray(res.telemetry.cost)
        assert cost[-1] < cost[0] * 0.1
        assert np.isnan(res.J[~res.valid]).all()

    def test_warm_start(self, scene_dir, tmp_path):
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        out = tmp_path / "out"
        cfg = RestoreConfig(num_iter=50, verbose=False)
        res1 = restore_image(scene, "img_002.png", out, cfg)
        # warm start from saved params: initial cost must be near res1's final
        cfg2 = RestoreConfig(num_iter=3, verbose=False, params_path=out / "img_002.npz")
        res2 = restore_image(scene, "img_002.png", out, cfg2)
        assert res2.telemetry.cost[0] < res1.telemetry.cost[0] * 0.5

    def test_pairing_filter(self, scene_dir, tmp_path):
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        cfg = RestoreConfig(num_iter=2, verbose=False, keep_matches=True)
        # restrict pairing to 2 views (target not among them — still works)
        image_list = [scene["img_000.png"], scene["img_001.png"]]
        res = restore_image(scene, "img_004.png", tmp_path / "o", cfg, image_list=image_list)
        mf = MatchesFile((tmp_path / "o" / "img_004.png").with_suffix(".h5"))
        assert set(mf.pair_names()) <= {"img_000.png", "img_001.png"}
        assert res.n_obs > 0


class TestStoreParity:
    def test_h5_reload_equals_memory(self, scene_dir, tmp_path):
        """The dense stack rebuilt from the HDF5 cache must equal the
        in-memory stack from matching (same observations, any view order)."""
        from sucre_tpu.pipeline import compute_matches

        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        target = scene["img_002.png"]
        mf = MatchesFile(tmp_path / "m.h5")
        obs_mem, names = compute_matches(target, scene.view_list(), mf)
        obs_h5, names_h5 = mf.load_dense(scene, target.height, target.width)
        assert sorted(names) == sorted(names_h5)
        # reorder memory stack to h5 (alphabetical) order
        order = [names.index(n) for n in names_h5]
        np.testing.assert_array_equal(
            np.asarray(obs_mem.valid)[order], np.asarray(obs_h5.valid)
        )
        np.testing.assert_allclose(
            np.asarray(obs_mem.cP)[order], np.asarray(obs_h5.cP), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(obs_mem.I)[order], np.asarray(obs_h5.I), atol=1e-7
        )
        mf.check_integrity()
        assert len(mf) == int(np.asarray(obs_mem.valid).sum())


class TestCheckpoints:
    def test_npz_roundtrip(self, tmp_path, rng):
        J = rng.uniform(0, 1, (4, 5, 3)).astype(np.float32)
        params = init_params(image=J, light_model=True)
        valid = rng.uniform(size=(4, 5)) < 0.8
        ckpt.save_params(tmp_path / "p.npz", params, J=J, valid=valid)
        loaded = ckpt.load_params(tmp_path / "p.npz", init_params(image=np.zeros_like(J), light_model=True))
        np.testing.assert_allclose(np.asarray(loaded.B), np.asarray(params.B))
        np.testing.assert_allclose(np.asarray(loaded.sigma), np.asarray(params.sigma))
        # NaN pixels in checkpoint keep the target's init values
        np.testing.assert_allclose(np.asarray(loaded.J)[valid], J[valid])
        np.testing.assert_allclose(np.asarray(loaded.J)[~valid], 0.0)

    def test_pt_interop(self, tmp_path, rng):
        import torch

        J = rng.uniform(0, 1, (4, 5, 3)).astype(np.float32)
        params = init_params(image=J)
        ckpt.save_params(tmp_path / "p.pt", params, J=J)
        raw = torch.load(tmp_path / "p.pt", weights_only=True)
        assert raw["B"].shape == (3, 1)  # reference state-dict shape
        assert raw["J"].shape == (4, 5, 3)
        loaded = ckpt.load_params(tmp_path / "p.pt", init_params(image=np.zeros_like(J)))
        np.testing.assert_allclose(np.asarray(loaded.J), J)


class TestRestoreMany:
    def test_matches_restore_image(self, scene_dir, tmp_path):
        """Batched multi-target restore must reproduce the single-target
        pipeline (same observations, same fit results)."""
        from sucre_tpu.pipeline import restore_many

        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        cfg = RestoreConfig(num_iter=5, verbose=False)
        names = ["img_001.png", "img_003.png"]
        many = restore_many(scene, names, tmp_path / "many", cfg)
        for name, res_m in zip(names, many):
            res_1 = restore_image(scene, name, tmp_path / f"one_{name}", cfg)
            assert res_m.n_obs == res_1.n_obs
            np.testing.assert_allclose(
                np.asarray(res_m.params.B), np.asarray(res_1.params.B), atol=1e-5
            )
            # export_dtype defaults to f32 — both paths fetch full precision
            np.testing.assert_allclose(
                np.nan_to_num(res_m.J), np.nan_to_num(res_1.J), atol=1e-5
            )
            np.testing.assert_allclose(
                res_m.telemetry.cost, np.asarray(res_1.telemetry.cost), rtol=1e-4
            )
            assert (tmp_path / "many" / f"{Path(name).stem}_rgb.png").exists()

    def test_memory_store_skips_h5(self, scene_dir, tmp_path):
        from sucre_tpu.pipeline import restore_many

        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        cfg = RestoreConfig(num_iter=2, verbose=False, store="memory", keep_matches=True)
        restore_many(scene, ["img_000.png"], tmp_path / "m", cfg)
        assert not (tmp_path / "m" / "img_000.h5").exists()
        assert (tmp_path / "m" / "img_000.npz").exists()

    def test_warns_on_dropped_snapshot_config(self, scene_dir, tmp_path):
        """The batched paths have no per-iteration host callbacks, so a
        RestoreConfig carrying save_interval/checkpoint_interval must warn
        library callers instead of dropping the fields silently (the CLI
        falls back to the sequential path on its own, cli.py)."""
        import pytest as _pytest

        from sucre_tpu.pipeline import restore_many, restore_survey

        scene = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
        )
        cfg = RestoreConfig(
            num_iter=2, verbose=False, store="memory", save_interval=1
        )
        with _pytest.warns(UserWarning, match="save_interval"):
            restore_many(scene, ["img_000.png"], tmp_path / "w1", cfg)
        cfg2 = RestoreConfig(
            num_iter=2, verbose=False, store="memory", checkpoint_interval=1
        )
        with _pytest.warns(UserWarning, match="checkpoint_interval"):
            restore_survey(scene, ["img_000.png"], tmp_path / "w2", cfg2)

    def test_h5_cache_reused(self, scene_dir, tmp_path):
        from sucre_tpu.pipeline import restore_many

        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
        cfg = RestoreConfig(num_iter=2, verbose=False, keep_matches=True)
        r1 = restore_many(scene, ["img_002.png"], tmp_path / "c", cfg)
        h5 = tmp_path / "c" / "img_002.h5"
        mtime = h5.stat().st_mtime_ns
        r2 = restore_many(scene, ["img_002.png"], tmp_path / "c", cfg)
        assert h5.stat().st_mtime_ns == mtime
        assert r1[0].n_obs == r2[0].n_obs


class TestMultiCamera:
    def test_bucketing_two_camera_dims(self, tmp_path):
        """Views from cameras with different dimensions are bucketed and all
        contribute observations."""
        sd = make_scene(tmp_path, n_views=6, two_cameras=True)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        dims = {(v.width, v.height) for v in scene.view_list()}
        assert len(dims) == 2
        cfg = RestoreConfig(num_iter=5, verbose=False, keep_matches=True)
        res = restore_image(scene, "img_000.png", tmp_path / "o", cfg)
        mf = MatchesFile((tmp_path / "o" / "img_000.png").with_suffix(".h5"))
        paired = mf.pair_names()
        # pairs from BOTH buckets (odd views use camera 2)
        assert any(n in paired for n in ("img_001.png", "img_003.png", "img_005.png"))
        assert any(n in paired for n in ("img_000.png", "img_002.png", "img_004.png"))
        assert res.n_obs > 0
        # u2/v2 coords in the small-camera groups stay within its dims
        import h5py

        with h5py.File(mf.path, "r") as f:
            if "img_001.png" in f:
                v2 = scene["img_001.png"]
                assert f["img_001.png"]["u2"][()].max() < v2.width
                assert f["img_001.png"]["v2"][()].max() < v2.height


class TestLightModelE2E:
    def test_light_scene_fit(self, tmp_path):
        """A scene rendered WITH vignetting fits better with the light model
        enabled than without (and the light fit converges)."""
        sd = make_scene(tmp_path, n_views=5, light=True)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        cfg_l = RestoreConfig(num_iter=120, verbose=False, light_model=True,
                              use_closed_form=True, store="memory")
        res_l = restore_image(scene, "img_002.png", tmp_path / "l", cfg_l)
        cost_l = np.asarray(res_l.telemetry.cost)
        assert cost_l[-1] < cost_l[0] * 0.2
        assert (tmp_path / "l" / "img_002_vignetting.png").exists()
        cfg_n = RestoreConfig(num_iter=120, verbose=False, use_closed_form=True,
                              store="memory")
        res_n = restore_image(scene, "img_002.png", tmp_path / "n", cfg_n)
        assert cost_l[-1] < np.asarray(res_n.telemetry.cost)[-1]


def test_device_views_equals_streaming(scene_dir, tmp_path):
    """Matching from the device-resident view stack must equal the
    streaming-upload path exactly."""
    from sucre_tpu.pipeline import DeviceViews, ViewCache, match_targets_shared

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    cache = ViewCache()
    cache.prefill(scene.view_list())
    dv = DeviceViews(scene.view_list(), cache, match_chunk=3)
    targets = [scene["img_001.png"], scene["img_003.png"]]
    a, names_a = match_targets_shared(targets, scene.view_list(), cache, compact=True)
    b, names_b = match_targets_shared(
        targets, scene.view_list(), cache, compact=True, device_views=dv
    )
    assert names_a == names_b
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x.valid), np.asarray(y.valid))
        np.testing.assert_allclose(np.asarray(x.z), np.asarray(y.z), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(x.I), np.asarray(y.I))


def test_survey_program_equals_chunked(scene_dir, tmp_path):
    """restore_many via the single survey program (memory store +
    device_views) must match the chunked streaming path."""
    from sucre_tpu.pipeline import DeviceViews, ViewCache, restore_many

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_001.png", "img_002.png"]
    cfg = RestoreConfig(num_iter=5, verbose=False, store="memory")
    cache = ViewCache()
    cache.prefill(scene.view_list())
    dv = DeviceViews(scene.view_list(), cache)
    a = restore_many(scene, names, tmp_path / "a", cfg, cache=cache, device_views=dv)
    b = restore_many(scene, names, tmp_path / "b", cfg, cache=cache)
    for ra, rb in zip(a, b):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(np.asarray(ra.params.B), np.asarray(rb.params.B), atol=1e-6)
        np.testing.assert_allclose(ra.telemetry.cost, rb.telemetry.cost, rtol=1e-5)
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-6)


def test_restore_survey_pipelined_equals_restore_many(scene_dir, tmp_path):
    """restore_survey (batched + software-pipelined) must produce the same
    results and artifact set as sequential restore_many batches."""
    from sucre_tpu.pipeline import restore_many, restore_survey

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_000.png", "img_001.png", "img_002.png", "img_003.png", "img_004.png"]
    cfg = RestoreConfig(num_iter=5, verbose=False, store="memory")

    res_s = restore_survey(scene, names, tmp_path / "s", cfg, batch_targets=2)
    res_m = []
    for group in (names[0:2], names[2:4], names[4:5]):
        res_m.extend(restore_many(scene, list(group), tmp_path / "m", cfg))

    assert [r.image_name for r in res_s] == names
    for ra, rb in zip(res_s, res_m):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(np.asarray(ra.params.B), np.asarray(rb.params.B), atol=1e-6)
        np.testing.assert_allclose(ra.telemetry.cost, rb.telemetry.cost, rtol=1e-5)
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-6)
    for n in names:
        stem = Path(n).stem
        assert (tmp_path / "s" / f"{stem}_rgb.png").exists()
        assert (tmp_path / "s" / f"{stem}_reconstruction.png").exists()
        assert (tmp_path / "s" / f"{stem}.npz").exists()


def test_restore_survey_closed_form_and_light(scene_dir, tmp_path):
    """Survey mode covers the non-default model modes: closed-form J (uses
    the fetched observed mask for export validity) and the light model
    (full cP layout; vignetting artifact per target)."""
    from sucre_tpu.pipeline import restore_survey

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_001.png", "img_002.png", "img_003.png"]

    cfg_cf = RestoreConfig(num_iter=5, verbose=False, store="memory", use_closed_form=True)
    res = restore_survey(scene, names, tmp_path / "cf", cfg_cf, batch_targets=2)
    for r in res:
        assert r.valid.sum() > 0.3 * r.valid.size
        assert np.isfinite(r.J[r.valid]).all()

    cfg_li = RestoreConfig(num_iter=5, verbose=False, store="memory", light_model=True)
    res = restore_survey(scene, names, tmp_path / "li", cfg_li, batch_targets=2)
    for n in names:
        assert (tmp_path / "li" / f"{Path(n).stem}_vignetting.png").exists()


def test_restore_survey_h5_lifecycle(scene_dir, tmp_path):
    """Survey mode with the HDF5 store keeps the reference cache protocol:
    .h5 written during matching, reused on a second run, deleted after a
    successful restore unless keep_matches."""
    from sucre_tpu.pipeline import restore_survey

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_001.png", "img_002.png"]
    out = tmp_path / "out"

    cfg = RestoreConfig(num_iter=3, verbose=False, keep_matches=True)
    a = restore_survey(scene, names, out, cfg, batch_targets=2)
    assert (out / "img_001.h5").exists() and (out / "img_002.h5").exists()

    # second run loads from cache (mutate one .h5's I dataset to prove
    # the cache, not fresh matching, feeds the fit)
    import h5py

    with h5py.File(out / "img_001.h5", "r+") as f:
        g = f[list(f.keys())[0]]
        g["I"][()] = np.zeros_like(g["I"][()])
    b = restore_survey(scene, names, out, cfg, batch_targets=2)
    assert not np.allclose(
        np.nan_to_num(a[0].J), np.nan_to_num(b[0].J), atol=1e-5
    )
    np.testing.assert_allclose(
        np.nan_to_num(a[1].J), np.nan_to_num(b[1].J), atol=1e-6
    )

    cfg2 = RestoreConfig(num_iter=3, verbose=False, keep_matches=False,
                         force_compute_matches=True)
    restore_survey(scene, names, out, cfg2, batch_targets=2)
    assert not (out / "img_001.h5").exists()


def test_restore_image_scale(scene_dir, tmp_path):
    """image_scale=0.5 restores at halved dims through both the single
    path (float resized inputs) and the survey path (generic two-gather
    matching branch)."""
    from sucre_tpu.pipeline import restore_survey

    scene = Scene.from_colmap(
        scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir, image_scale=0.5
    )
    cfg = RestoreConfig(num_iter=5, verbose=False, store="memory")
    res = restore_image(scene, "img_002.png", tmp_path / "a", cfg)
    assert res.J.shape == (24, 32, 3)
    assert res.n_obs > 500

    import dataclasses

    cfg32 = dataclasses.replace(cfg, export_dtype="f32")  # exact-compare vs single path
    res_s = restore_survey(
        scene, ["img_001.png", "img_002.png"], tmp_path / "s", cfg32, batch_targets=2
    )
    assert res_s[1].J.shape == (24, 32, 3)
    np.testing.assert_allclose(
        np.nan_to_num(res_s[1].J), np.nan_to_num(res.J), atol=1e-5
    )


def test_restore_survey_mixed_dims_input_order(tmp_path):
    """Mixed-camera surveys are internally batched per dimension group but
    results come back in input order (positional zip with names is safe)."""
    from sucre_tpu.pipeline import restore_survey

    sd = make_scene(tmp_path, n_views=6, two_cameras=True)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = ["img_000.png", "img_001.png", "img_002.png", "img_003.png"]  # interleaved dims
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory")
    res = restore_survey(scene, names, tmp_path / "o", cfg, batch_targets=2)
    assert [r.image_name for r in res] == names
    dims = [(scene[n].height, scene[n].width) for n in names]
    assert [r.J.shape[:2] for r in res] == dims


def test_store_three_match_pair_orientation(tmp_path):
    """A pair with exactly N == 3 matches must round-trip colors exactly
    (the old (N,3)-vs-(3,N) shape heuristic transposed this case)."""
    import h5py

    mf = MatchesFile(tmp_path / "m.h5")
    I = np.array([[0.0, 0.1, 0.2], [0.3, 0.4, 0.5], [0.6, 0.7, 0.8]], np.float32)
    mf.save_pair(
        "other.png",
        u1=np.array([1, 2, 3]), v1=np.array([4, 5, 6]),
        u2=np.array([7, 8, 9]), v2=np.array([1, 2, 3]),
        d=np.array([1.0, 2.0, 3.0], np.float32),
        I=I,
    )
    with h5py.File(mf.path, "r") as f:
        stored = f["other.png"]["I"][()]
    assert stored.shape == (3, 3)
    np.testing.assert_allclose(stored, I.T)  # channels-first schema
    with pytest.raises(ValueError):
        mf2 = MatchesFile(tmp_path / "m2.h5")
        mf2.save_pair(
            "x.png", u1=np.zeros(3), v1=np.zeros(3), u2=np.zeros(3),
            v2=np.zeros(3), d=np.ones(3), I=I.reshape(9, 1),
        )


def test_store_image_named_u1(tmp_path):
    """An image literally named '<dir>/u1' makes a 'u1' SUBGROUP under its
    parent — the pair-group walk must require a 'u1' DATASET, or the
    parent misclassifies as a pair group and every reader crashes."""
    mf = MatchesFile(tmp_path / "m.h5")
    pairs = {"cam0/u1": np.float32(1.0), "cam0/other.png": np.float32(2.0)}
    for name, dval in pairs.items():
        mf.save_pair(
            name,
            u1=np.array([1, 2, 3]), v1=np.array([4, 5, 6]),
            u2=np.array([7, 8, 9]), v2=np.array([1, 2, 3]),
            d=np.full(3, dval, np.float32),
            I=np.zeros((3, 3), np.float32),
        )
    assert sorted(mf.pair_names()) == sorted(pairs)
    mf.check_integrity()
    assert len(mf) == 6


def test_joint_params_export_four_targets(scene_dir, tmp_path):
    """Joint-mode telemetry is broadcast per target: exporting a batch of
    4+ targets must not crash (globals trajectories were (iters, 3) and
    got sliced per target)."""
    from sucre_tpu.pipeline import restore_many

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_000.png", "img_001.png", "img_002.png", "img_003.png"]
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory", joint_params=True)
    res = restore_many(scene, names, tmp_path / "o", cfg)
    assert len(res) == 4
    for r in res:
        assert r.telemetry.B.shape == (3, 3)  # (iters, 3) per-target slice
        # shared water model: all targets carry identical globals
        np.testing.assert_allclose(np.asarray(r.params.B), np.asarray(res[0].params.B))


def test_bilinear_cache_mode_mismatch(scene_dir, tmp_path):
    """A cache written under one color-sampling mode refuses to serve a
    run requesting the other (colors differ; geometry is the same)."""
    import dataclasses

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    out = tmp_path / "o"
    cfg_bi = RestoreConfig(num_iter=2, verbose=False, keep_matches=True,
                           bilinear_colors=True)
    restore_image(scene, "img_001.png", out, cfg_bi)
    cfg_nn = dataclasses.replace(cfg_bi, bilinear_colors=False)
    with pytest.raises(RuntimeError, match="color sampling"):
        restore_image(scene, "img_001.png", out, cfg_nn)
    # force recompute clears the mismatch
    cfg_force = dataclasses.replace(cfg_nn, force_compute_matches=True)
    res = restore_image(scene, "img_001.png", out, cfg_force)
    assert res.n_obs > 0


def test_survey_size_guard_falls_back_to_chunked(scene_dir, tmp_path, monkeypatch):
    """With a tiny pixel-pair budget the survey program is bypassed; the
    chunked path must produce identical results."""
    from sucre_tpu.pipeline import DeviceViews, ViewCache, restore_many

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_001.png", "img_002.png"]
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory", export_dtype="f32")
    cache = ViewCache()
    cache.prefill(scene.view_list())
    dv = DeviceViews(scene.view_list(), cache)
    a = restore_many(scene, names, tmp_path / "a", cfg, cache=cache, device_views=dv)
    monkeypatch.setenv("SUCRE_SURVEY_MAX_PAIRS", "1")
    b = restore_many(scene, names, tmp_path / "b", cfg, cache=cache, device_views=dv)
    for ra, rb in zip(a, b):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-6)


def test_partial_overlap_routes_per_target_tables(tmp_path, monkeypatch):
    """A partial-overlap batch must route through the per-target-table
    survey program (one dispatch, pairs = T x max kept views instead of
    T x V_union — the shared-table program can't apply per-target
    culling), and all three routes (per-target tables, chunked
    rectangles, shared-table survey) must agree."""
    from tests.synthetic import make_scene
    from sucre_tpu.pipeline import DeviceViews, ViewCache, restore_many

    sd = make_scene(tmp_path / "scene", n_views=16, width=64, height=48, spread=30)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = [sd.names[2], sd.names[13]]
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory", match_chunk=4)
    cache = ViewCache()
    cache.prefill(scene.view_list())
    dv = DeviceViews(scene.view_list(), cache)

    import sucre_tpu.ops.matching as m

    calls = {"pt": 0}
    real_pt = m.match_survey_indexed

    def counting_pt(*a, **k):
        calls["pt"] += 1
        assert a[4].ndim == 3  # SHARED (V, H2, W2) stack, no table copies
        assert a[9].ndim == 2  # (T, S) per-target view-id array
        return real_pt(*a, **k)

    monkeypatch.setattr(m, "match_survey_indexed", counting_pt)

    # pin a small chunked margin: on fast local devices the adaptive
    # factor (0.9) would route this batch chunked before the per-target
    # tables get a look-in. Pin the pad granularity + rate factor too:
    # on this tiny scene the default piecewise pad (5 kept -> 8) times
    # the measured gather-rate charge (1.8x) correctly prefers the
    # shared program — the test's job is exercising the pt ROUTE, so
    # force its engagement deterministically.
    monkeypatch.setenv("SUCRE_CHUNKED_ROUTE_FACTOR", "0.1")
    monkeypatch.setenv("SUCRE_PT_PAD_GRAN", "2")
    monkeypatch.setenv("SUCRE_PT_RATE_FACTOR", "1.0")
    a = restore_many(scene, names, tmp_path / "a", cfg, cache=cache, device_views=dv)
    assert calls["pt"] == 1, "partial overlap should take per-target tables"

    # forced chunked (rectangles always "predict" a win)
    monkeypatch.setenv("SUCRE_PER_TARGET_SURVEY", "0")
    monkeypatch.setenv("SUCRE_CHUNKED_ROUTE_FACTOR", "1e9")
    b = restore_many(scene, names, tmp_path / "b", cfg, cache=cache, device_views=dv)
    # forced shared-table survey program
    monkeypatch.setenv("SUCRE_CHUNKED_ROUTE_FACTOR", "0")
    c = restore_many(scene, names, tmp_path / "c", cfg, cache=cache, device_views=dv)
    assert calls["pt"] == 1  # neither forced route used the tables
    for ra, rb, rc in zip(a, b, c):
        assert ra.n_obs == rb.n_obs == rc.n_obs
        for other in (rb, rc):
            np.testing.assert_allclose(
                np.asarray(ra.params.B), np.asarray(other.params.B), atol=1e-6
            )
            np.testing.assert_allclose(
                np.nan_to_num(ra.J), np.nan_to_num(other.J), atol=1e-6
            )


def test_restore_image_shared_cache_equals_plain(scene_dir, tmp_path):
    """restore_image with a shared ViewCache (decode once across a
    sequential loop) produces the same result as the cacheless path."""
    from sucre_tpu.pipeline import ViewCache

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    cfg = RestoreConfig(num_iter=4, verbose=False, store="memory")
    plain = restore_image(scene, "img_002.png", tmp_path / "a", cfg)
    cache = ViewCache()
    cache.prefill(scene.view_list())
    cached = restore_image(scene, "img_002.png", tmp_path / "b", cfg, cache=cache)
    assert plain.n_obs == cached.n_obs
    np.testing.assert_allclose(
        np.asarray(cached.params.B), np.asarray(plain.params.B), atol=1e-6
    )
    np.testing.assert_allclose(
        np.nan_to_num(cached.J), np.nan_to_num(plain.J), atol=1e-6
    )


def test_restore_survey_salvages_completed_batches(scene_dir, tmp_path, monkeypatch):
    """A failure while dispatching batch k+1 must not discard batch k's
    finished device work: its artifacts are exported before the error
    propagates (mid-survey fault tolerance at batch granularity)."""
    import sucre_tpu.pipeline as pl

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    cfg = RestoreConfig(num_iter=2, verbose=False, store="memory")
    names = [f"img_{i:03d}.png" for i in range(4)]

    real_dispatch = pl.dispatch_survey_batch
    calls = {"n": 0}
    batch1: list[str] = []

    def failing_dispatch(scene_, names_, *args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected batch-2 failure")
        batch1.extend(names_)
        return real_dispatch(scene_, names_, *args, **kwargs)

    monkeypatch.setattr(pl, "dispatch_survey_batch", failing_dispatch)
    with pytest.raises(RuntimeError, match="injected"):
        pl.restore_survey(
            scene, names, tmp_path / "o", cfg, batch_targets=2
        )
    # the first dispatched batch (whichever two targets the spatial
    # batching picked) finished its device work: its artifacts must exist
    assert len(batch1) == 2
    for n in names:
        stem = Path(n).stem
        assert (tmp_path / "o" / f"{stem}.npz").exists() == (n in batch1)


def test_nested_image_names_end_to_end(tmp_path):
    """Multi-camera layouts name images with subdirectories
    ('cam0/img.png'). The whole lifecycle must work: depth-path
    derivation (reference with_stem semantics), nested h5 pair groups
    (h5py splits names on '/'), artifact/checkpoint writes under
    output subdirectories without cross-camera collisions, and resume
    from the kept cache."""
    import dataclasses
    import shutil

    from sucre_tpu.io import colmap as cio
    from sucre_tpu.pipeline import RestoreConfig, restore_image
    from sucre_tpu.scene import Scene
    from sucre_tpu.store import MatchesFile
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=4, width=48, height=32)
    # Rewrite the scene into a nested layout: every image under cam0/.
    for n in sd.names:
        (sd.image_dir / "cam0").mkdir(exist_ok=True)
        (sd.depth_dir / "cam0").mkdir(exist_ok=True)
        shutil.move(sd.image_dir / n, sd.image_dir / "cam0" / n)
        dname = f"depth_{Path(n).stem}.png"
        shutil.move(sd.depth_dir / dname, sd.depth_dir / "cam0" / dname)
    cams, imgs, _ = cio.read_model(sd.model_dir)
    imgs = {
        k: dataclasses.replace(im, name=f"cam0/{im.name}")
        for k, im in imgs.items()
    }
    cio.write_cameras_bin(cams, sd.model_dir / "cameras.bin")
    cio.write_images_bin(imgs, sd.model_dir / "images.bin")

    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    out = tmp_path / "out"
    cfg = RestoreConfig(num_iter=3, verbose=False, keep_matches=True)
    res = restore_image(scene, "cam0/img_001.png", out, cfg)
    assert res.n_obs > 0
    # artifacts land under out/cam0/, not flattened
    assert (out / "cam0" / "img_001_rgb.png").exists()
    assert (out / "cam0" / "img_001.npz").exists()
    mf = MatchesFile(out / "cam0" / "img_001.h5")
    names = mf.pair_names()
    assert all(n.startswith("cam0/") for n in names) and len(names) >= 2
    mf.check_integrity()
    assert len(mf) == res.n_obs
    # resume path: reuse the kept cache (load_dense through nested groups)
    res2 = restore_image(scene, "cam0/img_001.png", out, cfg)
    assert res2.n_obs == res.n_obs
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(res2.J)), np.nan_to_num(np.asarray(res.J)),
        atol=1e-5,
    )

    # the pipelined batched survey path with nested names (device export
    # + threaded artifact writer + checkpoint parents)
    from sucre_tpu.pipeline import restore_survey

    out2 = tmp_path / "out2"
    names = [f"cam0/{n}" for n in sd.names]
    results = restore_survey(
        scene, names, out2,
        RestoreConfig(num_iter=2, verbose=False, store="memory"),
        batch_targets=2,
    )
    assert len(results) == len(names)
    for n in sd.names:
        assert (out2 / "cam0" / f"{Path(n).stem}_rgb.png").exists()
        assert (out2 / "cam0" / f"{Path(n).stem}.npz").exists()


def test_restore_survey_duplicate_names(tmp_path):
    """A name listed twice restores once (the reference's sequential loop
    restores it twice to the same artifacts; a batched run must not
    collide on the shared matches cache). Results mirror the input."""
    from sucre_tpu.pipeline import RestoreConfig, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=3, width=48, height=32)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = ["img_001.png", "img_001.png", "img_002.png"]
    results = restore_survey(
        scene, names, tmp_path / "o",
        RestoreConfig(num_iter=2, verbose=False), batch_targets=4,
    )
    assert [r.image_name for r in results] == names
    assert results[0] is results[1]
    assert (tmp_path / "o" / "img_001_rgb.png").exists()

    # restore_many shares the contract (it dispatches one batch directly,
    # skipping restore_survey's grouping — its own dedup must hold)
    from sucre_tpu.pipeline import restore_many

    results = restore_many(
        scene, names, tmp_path / "o2",
        RestoreConfig(num_iter=2, verbose=False),
    )
    assert [r.image_name for r in results] == names
    assert results[0] is results[1]
    assert (tmp_path / "o2" / "img_001_rgb.png").exists()


def test_survey_skips_zero_obs_target(tmp_path):
    """One observationless target (empty depth map) must not kill the
    survey: the other targets restore, the failure is logged, and the
    result list simply lacks the bad target. restore_image keeps the
    reference's raise."""
    import io
    import logging

    import cv2

    from sucre_tpu.pipeline import RestoreConfig, restore_image, restore_many, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=4, width=48, height=32)
    cv2.imwrite(str(sd.depth_dir / "depth_img_001.png"),
                np.zeros((32, 48), np.uint16))
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = [f"img_{i:03d}.png" for i in range(4)]
    cfg = RestoreConfig(num_iter=2, verbose=False)

    # capture the framework logger directly (its stdout handler binds the
    # stream at first creation, which races with capsys across the suite)
    stream = io.StringIO()
    handler = logging.StreamHandler(stream)
    logger = logging.getLogger("sucre_tpu")
    logger.addHandler(handler)
    try:
        results = restore_survey(scene, names, tmp_path / "o", cfg,
                                 batch_targets=4)
    finally:
        logger.removeHandler(handler)
    assert [r.image_name for r in results] == [n for n in names if n != "img_001.png"]
    assert "No observations for img_001.png" in stream.getvalue()
    assert (tmp_path / "o" / "img_002_rgb.png").exists()
    assert not (tmp_path / "o" / "img_001_rgb.png").exists()

    # restore_many shares the skip contract
    results = restore_many(scene, names, tmp_path / "o2", cfg)
    assert len(results) == 3

    # the light model's full-cP layout takes the same empty placeholder
    results = restore_survey(
        scene, names, tmp_path / "ol",
        RestoreConfig(num_iter=2, verbose=False, light_model=True),
        batch_targets=4,
    )
    assert len(results) == 3

    # joint mode: the empty target must contribute NOTHING to the SHARED
    # water model (1/(0*3) would NaN the shared gradient sums and poison
    # every target — the max(n_obs,1) guards)
    for cf in (False, True):
        results = restore_many(
            scene, names, tmp_path / f"oj{cf}",
            RestoreConfig(num_iter=3, verbose=False, joint_params=True,
                          use_closed_form=cf),
        )
        assert len(results) == 3
        for r in results:
            assert np.isfinite(np.asarray(r.params.beta)).all()
            assert np.isfinite(r.metrics["final_cost"])

    # the single-target path raises (reference parity)
    with pytest.raises(RuntimeError, match="No observations"):
        restore_image(scene, "img_001.png", tmp_path / "o3", cfg)


def test_spatial_batch_order(tmp_path):
    """Survey batching orders targets along the camera path's principal
    axis (tight per-batch culling on transects given in arbitrary
    order); results still mirror the input list and are identical to an
    in-order run."""
    import random

    from sucre_tpu.pipeline import RestoreConfig, _spatial_order, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=6, width=48, height=32, spread=3.0)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = list(sd.names)
    shuffled = names[:]
    random.Random(7).shuffle(shuffled)

    ordered = _spatial_order(scene, shuffled)
    # principal-axis order is the transect traversal (or its reverse)
    assert ordered in (names, names[::-1])

    cfg = RestoreConfig(num_iter=3, verbose=False)
    r_in = restore_survey(scene, names, tmp_path / "a", cfg, batch_targets=2)
    r_sh = restore_survey(scene, shuffled, tmp_path / "b", cfg, batch_targets=2)
    assert [r.image_name for r in r_sh] == shuffled
    by_name = {r.image_name: r for r in r_in}
    for r in r_sh:
        np.testing.assert_allclose(
            np.nan_to_num(r.J), np.nan_to_num(by_name[r.image_name].J),
            atol=1e-6,
        )


def test_fit_quality_metrics(tmp_path):
    """Every result carries the fit-quality summary: final_cost/obs_rmse
    (observation-space residual) and recon_psnr (reconstruction render vs
    the raw image — the quantitative plot_reconstruction check), on both
    the single-target and batched paths, both J modes."""
    from sucre_tpu.pipeline import RestoreConfig, restore_image, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=3, width=48, height=32)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)

    res = restore_image(scene, "img_001.png", tmp_path / "o1",
                        RestoreConfig(num_iter=40, verbose=False,
                                      ssim_metric=True))
    m = res.metrics
    assert m["final_cost"] > 0
    assert 0 < m["obs_rmse"] < 0.5
    assert np.isclose(m["obs_rmse"],
                      np.sqrt(m["final_cost"] / (res.n_obs * 3)))
    # after 40 iterations the reconstruction should resemble the input
    assert m["recon_psnr"] > 15.0
    assert 0.3 < m["recon_ssim"] <= 1.0

    for cf in (False, True):
        results = restore_survey(
            scene, [f"img_{i:03d}.png" for i in (1, 2)], tmp_path / f"o2{cf}",
            RestoreConfig(num_iter=40, verbose=False, use_closed_form=cf,
                          ssim_metric=True),
            batch_targets=2,
        )
        for r in results:
            assert r.metrics["recon_psnr"] > 15.0
            assert 0.3 < r.metrics["recon_ssim"] <= 1.0
            assert r.metrics["obs_rmse"] < 0.5


class TestCacheGuards:
    """Crash-consistency + cross-scale guards on the matches cache.

    Pairs are appended to the .h5 incrementally during matching; these
    tests pin that a partial file from a killed run is discarded (not
    half-loaded), that a cache written at one --image-scale refuses to
    serve another, and that corrupt coordinates fail loudly instead of
    numpy-wrapping onto the far edge of the grid."""

    def _restore_with_cache(self, scene_dir, out):
        scene = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
        )
        cfg = RestoreConfig(num_iter=2, verbose=False, keep_matches=True)
        res = restore_image(scene, "img_001.png", out, cfg)
        return scene, cfg, res, (out / "img_001.h5")

    def test_incomplete_cache_discarded_and_recomputed(self, scene_dir, tmp_path):
        import h5py

        scene, cfg, res1, h5 = self._restore_with_cache(scene_dir, tmp_path / "o")
        # simulate a run killed mid-matching: our writer stamp present,
        # complete never set
        with h5py.File(h5, "a") as f:
            f.attrs["complete"] = False
            # drop one pair group = the partial-write state
            del f[next(iter(f.keys()))]
        res2 = restore_image(scene, "img_001.png", tmp_path / "o", cfg)
        assert res2.n_obs == res1.n_obs  # recomputed, not half-loaded
        mf = MatchesFile(h5)
        assert mf.is_complete()  # the rewrite finalized

    def test_reference_written_cache_accepted(self, scene_dir, tmp_path):
        """Files without the writer stamp (written by the reference
        implementation) must load: the reference has no completeness
        marker, so absence of the stamp means 'complete'."""
        import h5py

        scene, cfg, res1, h5 = self._restore_with_cache(scene_dir, tmp_path / "o")
        with h5py.File(h5, "a") as f:
            for key in list(f.attrs):
                del f.attrs[key]
        mf = MatchesFile(h5)
        assert mf.is_complete()
        mf.check_grid(123, 456)  # no dims attrs -> cannot verify, pass
        res2 = restore_image(scene, "img_001.png", tmp_path / "o", cfg)
        assert res2.n_obs == res1.n_obs

    def test_cross_scale_cache_refused(self, scene_dir, tmp_path):
        import pytest

        scene, cfg, _, h5 = self._restore_with_cache(scene_dir, tmp_path / "o")
        half = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir,
            image_scale=0.5,
        )
        with pytest.raises(RuntimeError, match="image-scale"):
            restore_image(half, "img_001.png", tmp_path / "o", cfg)

    def test_load_dense_rejects_out_of_grid_coords(self, scene_dir, tmp_path):
        import pytest

        scene = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
        )
        t = scene["img_001.png"]
        mf = MatchesFile(tmp_path / "bad.h5")
        mf.save_pair(
            "img_000.png",
            u1=np.asarray([1, -1], np.int16), v1=np.asarray([0, 2], np.int16),
            u2=np.asarray([3, 4], np.int16), v2=np.asarray([5, 6], np.int16),
            d=np.asarray([1.0, 2.0], np.float32),
            I=np.zeros((2, 3), np.float32),
        )
        with pytest.raises(RuntimeError, match="outside"):
            mf.load_dense(scene, t.height, t.width)

    def test_load_dense_compact_equals_device_compact(self, scene_dir, tmp_path):
        scene, cfg, _, h5 = self._restore_with_cache(scene_dir, tmp_path / "o")
        t = scene["img_001.png"]
        mf = MatchesFile(h5)
        full, names = mf.load_dense(scene, t.height, t.width)
        comp, names2 = mf.load_dense(scene, t.height, t.width, compact=True)
        assert names == names2
        dev = full.compact()
        assert comp.cP is None
        np.testing.assert_array_equal(np.asarray(comp.valid), np.asarray(dev.valid))
        np.testing.assert_allclose(
            np.asarray(comp.z), np.asarray(dev.z), rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(comp.I), np.asarray(dev.I))


def test_restore_survey_streams_past_residency_budget(scene_dir, tmp_path, monkeypatch):
    """A survey whose raw stack exceeds SUCRE_RESIDENT_BYTES must stream
    view chunks from the host cache (no DeviceViews upload) and produce
    the same results as the resident path, instead of OOMing at startup."""
    from sucre_tpu.pipeline import restore_survey

    scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir)
    names = ["img_001.png", "img_002.png"]
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory")
    a = restore_survey(scene, names, tmp_path / "a", cfg, batch_targets=2)
    monkeypatch.setenv("SUCRE_RESIDENT_BYTES", "1")
    b = restore_survey(scene, names, tmp_path / "b", cfg, batch_targets=2)
    for ra, rb in zip(a, b):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-6)


def test_artifacts_renders_mode(scene_dir, tmp_path):
    """artifacts='renders' writes only the PNG renders (no .npz/.pt) with
    pixel-identical content to the full export, skips the J fetch
    (result.J is None), and the single path matches the survey path."""
    import dataclasses

    from sucre_tpu.pipeline import restore_survey

    scene = Scene.from_colmap(
        scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
    )
    names = ["img_001.png", "img_002.png"]
    # pin both u8 renders to the device path so full vs renders compare
    # byte-for-byte (the survey default host-renders from fetched J)
    base = RestoreConfig(
        num_iter=4, verbose=False, store="memory",
        rgb_plot_on_device=True, reconstruction_on_device=True,
    )
    full = restore_survey(
        scene, names, tmp_path / "full", base, batch_targets=2
    )
    cfg_r = dataclasses.replace(base, artifacts="renders")
    rend = restore_survey(
        scene, names, tmp_path / "rend", cfg_r, batch_targets=2
    )
    for r_full, r_rend, n in zip(full, rend, names):
        stem = Path(n).stem
        assert r_rend.J is None
        assert r_full.J is not None
        assert not (tmp_path / "rend" / f"{stem}.npz").exists()
        assert not any(
            str(a).endswith(".npz") for a in r_rend.artifacts
        )
        for suffix in ("_rgb.png", "_reconstruction.png"):
            a = (tmp_path / "full" / (stem + suffix)).read_bytes()
            b = (tmp_path / "rend" / (stem + suffix)).read_bytes()
            assert a == b, suffix
        # params still fetched for the report/telemetry
        np.testing.assert_allclose(
            np.asarray(r_rend.params.beta), np.asarray(r_full.params.beta)
        )
        assert r_rend.metrics["recon_psnr"] == r_full.metrics["recon_psnr"]

    # single-image path
    res1 = restore_image(scene, "img_002.png", tmp_path / "one", cfg_r)
    assert res1.J is None
    assert (tmp_path / "one" / "img_002_rgb.png").exists()
    assert (tmp_path / "one" / "img_002_reconstruction.png").exists()
    assert not (tmp_path / "one" / "img_002.npz").exists()


def test_artifacts_renders_closed_form(scene_dir, tmp_path):
    """renders mode in closed-form mode still fetches the observed mask
    (export-mask parity) while skipping J."""
    import dataclasses

    scene = Scene.from_colmap(
        scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
    )
    cfg = RestoreConfig(
        num_iter=4, verbose=False, store="memory", use_closed_form=True,
        artifacts="renders",
    )
    res = restore_image(scene, "img_002.png", tmp_path / "cf", cfg)
    assert res.J is None
    assert res.valid.any()
    assert (tmp_path / "cf" / "img_002_rgb.png").exists()
    assert not (tmp_path / "cf" / "img_002.npz").exists()


def test_link_rtt_self_corrects_high_estimate(monkeypatch):
    """A GROSSLY contaminated (>= 200 ms) first RTT sample must be
    corrected by later probes (process-wide min); plausible readings —
    low OR genuinely-slow-link — stick without re-probing (a mid-survey
    probe would stall the pipelined dispatch)."""
    import sucre_tpu.pipeline as pl

    monkeypatch.setattr(pl, "_LINK_RTT_S", 0.5)  # contaminated: 500 ms
    monkeypatch.setattr(pl, "_LINK_RTT_PROBES", 1)
    r = pl._link_rtt()  # re-probes on CPU (real RTT ~µs) and takes min
    assert r < 0.5
    # a plausible slow-tunnel reading is trusted: no further probes
    monkeypatch.setattr(pl, "_LINK_RTT_S", 0.03)
    monkeypatch.setattr(pl, "_LINK_RTT_PROBES", 1)
    assert pl._link_rtt() == 0.03
    # low-RTT classification sticks too
    monkeypatch.setattr(pl, "_LINK_RTT_S", 1e-6)
    monkeypatch.setattr(pl, "_LINK_RTT_PROBES", 3)
    assert pl._link_rtt() == 1e-6
