"""Mixed-rig surveys: fisheye AND pinhole/rational cameras in ONE COLMAP
reconstruction (e.g. a fisheye navigation camera plus a pinhole
documentation camera). A single joint distortion tag cannot express a
fisheye/non-fisheye pair (the zero-parameter fisheye map is not the
identity), so matching takes per-camera (target_tag, view_tag) tuple tags
(ops.matching._split_tags) and the pipeline buckets view stacks by stack
class (ops.distortion.stack_class). The reference cannot run ANY of this
(sfm.py:192 asserts PINHOLE); ground truth is the analytic f64
correspondence and the synthetic scene's known texture."""

import numpy as np
import pytest

import jax.numpy as jnp

from sucre_tpu.ops import distortion as D
from sucre_tpu.ops.matching import _split_tags, match_and_observe_chunk_jit, match_pair
from sucre_tpu.pipeline import (
    DeviceViews,
    RestoreConfig,
    ViewCache,
    compute_matches,
    restore_survey,
)
from sucre_tpu.scene import Scene
from tests.synthetic import make_scene

FISHEYE = np.array([-0.04, 0.01, -0.005, 0.001, 0, 0, 0, 0], np.float32)


def test_tag_helpers():
    assert _split_tags("rational") == ("rational", "rational")
    assert _split_tags(("fisheye", "none")) == ("fisheye", "none")
    assert D.pair_tag("fisheye", "fisheye") == "fisheye"
    assert D.pair_tag("none", "none") == "none"
    assert D.pair_tag("fisheye", "none") == ("fisheye", "none")
    assert D.pair_tag("none", "rational") == ("none", "rational")
    assert D.stack_class("none") == "std"
    assert D.stack_class("rational") == "std"
    assert D.stack_class("fisheye") == "fisheye"


def _fisheye_plane_depth(intr, W, H, t, plane_z=3.0, slope=0.3):
    """f64 Z-depth of the tilted plane Z = plane_z + slope*X seen by a
    fisheye camera at cam->world (R=I, t)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    fx, fy, cx, cy = (float(x) for x in intr)
    xn = (u + 0.5 - cx) / fx
    yn = (v + 0.5 - cy) / fy
    xr, yr = D.undistort("fisheye", FISHEYE.astype(np.float64), xn, yn, xp=np)
    zc = (plane_z + slope * t[0] - t[2]) / (1.0 - slope * xr)
    zc[~np.isfinite(xr)] = 0.0
    return zc, xr, yr


def _pinhole_plane_depth(intr, W, H, t, plane_z=3.0, slope=0.3):
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    fx, fy, cx, cy = (float(x) for x in intr)
    xr = (u + 0.5 - cx) / fx
    yr = (v + 0.5 - cy) / fy
    zc = (plane_z + slope * t[0] - t[2]) / (1.0 - slope * xr)
    return zc, xr, yr


def test_fisheye_target_pinhole_view_analytic():
    """match_pair with a ("fisheye", "none") tuple tag agrees with the
    exact f64 correspondence: fisheye unprojection of the target pixel,
    plain pinhole projection into the view."""
    W, H = 128, 96
    intr = np.array([0.85 * W, 0.85 * W, W / 2, H / 2], np.float32)
    t1 = np.array([0.0, 0.0, 0.0])
    t2 = np.array([0.4, 0.05, 0.1])
    zc1, xr1, yr1 = _fisheye_plane_depth(intr, W, H, t1)
    zc2, _, _ = _pinhole_plane_depth(intr, W, H, t2)
    m = match_pair(
        jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.asarray(t1, jnp.float32),
        jnp.asarray(zc2, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.asarray(t2, jnp.float32),
        dist1=jnp.asarray(FISHEYE), dist_model=("fisheye", "none"),
    )
    valid = np.asarray(m.valid)
    assert valid.mean() > 0.2, "overlapping views must match"
    # exact correspondence: world hit point through the fisheye lens,
    # pinhole-projected into view 2 (identity rotation)
    Pw = np.stack([t1[0] + xr1 * zc1, t1[1] + yr1 * zc1, t1[2] + zc1], -1)
    Pc2 = Pw - t2
    fx, fy, cx, cy = (float(x) for x in intr)
    u2_exact = fx * Pc2[..., 0] / Pc2[..., 2] + cx
    v2_exact = fy * Pc2[..., 1] / Pc2[..., 2] + cy
    du = np.asarray(m.u2)[valid] - np.trunc(u2_exact[valid])
    dv = np.asarray(m.v2)[valid] - np.trunc(v2_exact[valid])
    assert np.abs(du).max() <= 1 and np.abs(dv).max() <= 1
    assert (du == 0).mean() > 0.98 and (dv == 0).mean() > 0.98


def test_pinhole_target_fisheye_view_analytic():
    """The transposed tuple ("none", "fisheye"): pinhole target pixels
    land on the f64 fisheye projection into the view."""
    W, H = 128, 96
    intr = np.array([0.85 * W, 0.85 * W, W / 2, H / 2], np.float32)
    t1 = np.array([0.0, 0.0, 0.0])
    t2 = np.array([0.4, 0.05, 0.1])
    zc1, xr1, yr1 = _pinhole_plane_depth(intr, W, H, t1)
    zc2, _, _ = _fisheye_plane_depth(intr, W, H, t2)
    m = match_pair(
        jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.asarray(t1, jnp.float32),
        jnp.asarray(zc2, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.asarray(t2, jnp.float32),
        dist2=jnp.asarray(FISHEYE), dist_model=("none", "fisheye"),
    )
    valid = np.asarray(m.valid)
    assert valid.mean() > 0.2
    Pw = np.stack([t1[0] + xr1 * zc1, t1[1] + yr1 * zc1, t1[2] + zc1], -1)
    Pc2 = Pw - t2
    fx, fy, cx, cy = (float(x) for x in intr)
    xd, yd = D.distort("fisheye", FISHEYE.astype(np.float64),
                       Pc2[..., 0] / Pc2[..., 2], Pc2[..., 1] / Pc2[..., 2],
                       xp=np)
    u2_exact = fx * xd + cx
    v2_exact = fy * yd + cy
    du = np.asarray(m.u2)[valid] - np.trunc(u2_exact[valid])
    dv = np.asarray(m.v2)[valid] - np.trunc(v2_exact[valid])
    assert np.abs(du).max() <= 1 and np.abs(dv).max() <= 1
    assert (du == 0).mean() > 0.98 and (dv == 0).mean() > 0.98


def test_equal_sides_tuple_equals_plain_tag():
    """A ("fisheye", "fisheye") tuple compiles a program bit-identical in
    outputs to the plain "fisheye" tag (the tuple is only a mixed-rig
    spelling; equal sides are the same math)."""
    W, H = 96, 72
    intr = np.array([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    t2 = np.array([0.3, 0.02, 0.05], np.float32)
    zc1, _, _ = _fisheye_plane_depth(intr, W, H, np.zeros(3))
    zc2, _, _ = _fisheye_plane_depth(intr, W, H, t2)
    args = (
        jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.zeros(3),
        jnp.asarray(zc2, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.asarray(t2),
    )
    kw = dict(dist1=jnp.asarray(FISHEYE), dist2=jnp.asarray(FISHEYE))
    m_plain = match_pair(*args, dist_model="fisheye", **kw)
    m_tuple = match_pair(*args, dist_model=("fisheye", "fisheye"), **kw)
    np.testing.assert_array_equal(np.asarray(m_plain.valid), np.asarray(m_tuple.valid))
    np.testing.assert_array_equal(np.asarray(m_plain.u2), np.asarray(m_tuple.u2))
    np.testing.assert_array_equal(np.asarray(m_plain.v2), np.asarray(m_tuple.v2))


def test_chunk_driver_accepts_tuple_tags():
    """match_and_observe_chunk with a ("none", "fisheye") tuple: the
    view-side vectors ride, the target side stays on the exact pinhole
    path, and the observation set matches the per-pair oracle."""
    W, H, V = 64, 48, 2
    intr = np.array([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    zc1, _, _ = _pinhole_plane_depth(intr, W, H, np.zeros(3))
    depths, ts = [], []
    rng = np.random.default_rng(1)
    for k in range(V):
        t2 = np.array([0.2 * (k + 1), 0.01 * k, 0.03 * k])
        zc2, _, _ = _fisheye_plane_depth(intr, W, H, t2)
        depths.append((zc2 * 1000).astype(np.uint16))
        ts.append(t2.astype(np.float32))
    rgbs = rng.integers(0, 255, (V, H, W, 3), dtype=np.uint8)
    obs, m = match_and_observe_chunk_jit(
        jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
        jnp.zeros(3),
        jnp.asarray(np.stack(depths)), jnp.asarray(rgbs),
        jnp.asarray(np.tile(intr, (V, 1))),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))),
        jnp.asarray(np.stack(ts)),
        v_dists=jnp.asarray(np.tile(FISHEYE, (V, 1))),
        dist_model=("none", "fisheye"),
    )
    assert np.asarray(m.valid).any(axis=(1, 2)).all(), "every view must match"
    for k in range(V):
        mk = match_pair(
            jnp.asarray(zc1, jnp.float32), jnp.asarray(intr), jnp.eye(3),
            jnp.zeros(3),
            jnp.asarray(depths[k]).astype(jnp.float32) / 1000.0,
            jnp.asarray(intr), jnp.eye(3), jnp.asarray(ts[k]),
            dist2=jnp.asarray(FISHEYE), dist_model=("none", "fisheye"),
        )
        np.testing.assert_array_equal(
            np.asarray(m.valid[k]), np.asarray(mk.valid)
        )
        np.testing.assert_array_equal(np.asarray(m.u2[k]), np.asarray(mk.u2))


def test_match_survey_sharded_tuple_tag():
    """The (view x row)-sharded survey program with a per-camera
    ("none", "fisheye") tuple tag equals the single-device program:
    pinhole targets over a fisheye view stack, view-side vectors sharding
    with the intrinsics and NO target-side vectors at all."""
    import jax

    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import match_survey_sharded
    from sucre_tpu.parallel.mesh import make_mesh

    W, H, V = 64, 48, 4
    intr = np.array([0.8 * W, 0.8 * W, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(3)
    v_depths, v_ts = [], []
    for k in range(V):
        t2 = np.array([0.15 * (k + 1), 0.01 * k, 0.02 * k])
        zc, _, _ = _fisheye_plane_depth(intr, W, H, t2)
        v_depths.append(zc.astype(np.float32))
        v_ts.append(t2.astype(np.float32))
    t_depths = np.stack(
        [_pinhole_plane_depth(intr, W, H, np.array([0.05 * i, 0, 0]))[0]
         for i in range(2)]
    ).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    t_ts = np.stack([[0.05 * i, 0, 0] for i in range(2)]).astype(np.float32)
    args = (
        jnp.asarray(t_depths), jnp.asarray(np.tile(intr, (2, 1))),
        jnp.asarray(eye[:2]), jnp.asarray(t_ts),
        jnp.asarray(np.stack(v_depths)),
        jnp.asarray(rng.integers(0, 255, (V, H, W, 3), dtype=np.uint8)),
        jnp.asarray(np.tile(intr, (V, 1))), jnp.asarray(eye),
        jnp.asarray(np.stack(v_ts)),
    )
    v_dists = jnp.asarray(np.tile(FISHEYE, (V, 1)))
    ref = match_survey(*args, jnp.float32(1e-6), compact=True,
                       v_dists=v_dists, dist_model=("none", "fisheye"))
    assert int(np.asarray(ref.valid).sum()) > 0
    out = match_survey_sharded(
        make_mesh(2, 4), *args, v_dists=v_dists,
        dist_model=("none", "fisheye"),
    )
    np.testing.assert_array_equal(
        np.asarray(out.valid[:, :V, :H]), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(out.z[:, :V, :H]), np.asarray(ref.z), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out.I[:, :V, :H]), np.asarray(ref.I))


@pytest.fixture(scope="module")
def mixed_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mixed_rig")
    # even views: PINHOLE camera 1; odd views: OPENCV_FISHEYE camera 2
    # (same dimensions — the stack-class split, not the dims split)
    return make_scene(tmp, n_views=6, width=64, height=48,
                      camera_model="PINHOLE", camera_model2="OPENCV_FISHEYE")


def test_device_views_splits_stack_classes(mixed_scene):
    scene = Scene.from_colmap(
        mixed_scene.model_dir, mixed_scene.image_dir, mixed_scene.depth_dir
    )
    views = scene.view_list()
    assert {v.dist_model for v in views} == {"none", "fisheye"}
    cache = ViewCache()
    cache.prefill(views)
    dv = DeviceViews(views, cache)
    assert len(dv.buckets) == 2
    tags = sorted(b["dist_model"] for b in dv.buckets)
    assert tags == ["fisheye", "none"]
    fish = next(b for b in dv.buckets if b["dist_model"] == "fisheye")
    assert fish["dists"] is not None and fish["dists"].shape == (3, 8)


def test_mixed_rig_matches_both_classes(mixed_scene):
    """A pinhole target gathers observations from BOTH camera classes —
    the whole point of per-camera tags (a class-blind pipeline would
    either crash or silently drop half the survey)."""
    scene = Scene.from_colmap(
        mixed_scene.model_dir, mixed_scene.image_dir, mixed_scene.depth_dir
    )
    views = scene.view_list()
    cache = ViewCache()
    cache.prefill(views)
    for target_name in ("img_000.png", "img_001.png"):  # pinhole, fisheye
        target = scene[target_name]
        dense, kept = compute_matches(
            target, views, None, cache=cache, collect_dense=True,
        )
        kept_models = {scene[n].dist_model for n in kept}
        assert kept_models == {"none", "fisheye"}, (
            f"{target_name}: views from both stack classes must match"
        )
        assert dense.valid.sum() > 4 * 0.3 * 64 * 48


def test_mixed_rig_survey_end_to_end(mixed_scene, tmp_path):
    """restore_survey over a mixed rig: pinhole and fisheye targets batch
    separately (stack-class grouping) but share the resident view stacks,
    and both recover the ground-truth texture."""
    scene = Scene.from_colmap(
        mixed_scene.model_dir, mixed_scene.image_dir, mixed_scene.depth_dir
    )
    cfg = RestoreConfig(num_iter=200, verbose=False, store="memory")
    results = restore_survey(
        scene, ["img_002.png", "img_003.png"], tmp_path / "out", cfg
    )
    assert [r.image_name for r in results] == ["img_002.png", "img_003.png"]
    for r, ji in zip(results, (2, 3)):
        J_true = mixed_scene.J_views[ji]
        valid = r.valid & ~np.isnan(r.J).any(axis=-1)
        assert valid.mean() > 0.8
        mse = np.mean((r.J[valid] - J_true.astype(np.float32)[valid]) ** 2)
        psnr = 10 * np.log10(1.0 / mse)
        assert psnr > 22.0, f"{r.image_name}: PSNR {psnr:.2f} dB"
