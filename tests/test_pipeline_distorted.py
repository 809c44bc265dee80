"""End-to-end restoration of DISTORTED-camera scenes — the capability the
reference lacks entirely (sfm.py:192 asserts PINHOLE; its README requires
COLMAP's image undistorter). The synthetic generator renders through the
lens model, so depth maps, images, and the COLMAP model are mutually
consistent exactly like a real distorted survey, and the plane-texture
ground truth gives an analytic PSNR target."""

from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.pipeline import (
    RestoreConfig,
    ViewCache,
    restore_image,
    restore_many,
)
from sucre_tpu.scene import Scene
from tests.synthetic import make_scene


def _psnr(a, b, mask):
    mse = np.mean((a[mask] - b[mask]) ** 2)
    return 10 * np.log10(1.0 / mse)


@pytest.fixture(scope="module",
                params=["OPENCV", "OPENCV_FISHEYE", "FOV",
                        "THIN_PRISM_FISHEYE"])
def dist_scene(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"scene_{request.param}")
    return make_scene(tmp, n_views=5, width=64, height=48,
                      camera_model=request.param)


class TestDistortedEndToEnd:
    def test_restore_recovers_ground_truth(self, dist_scene, tmp_path):
        """Full hdf5-store path (chunked matcher + cache + resume cP)."""
        scene = Scene.from_colmap(
            dist_scene.model_dir, dist_scene.image_dir, dist_scene.depth_dir
        )
        assert scene.view_list()[0].dist_model == dist_scene.dist_model
        out = tmp_path / "out"
        cfg = RestoreConfig(num_iter=200, verbose=False)
        res = restore_image(scene, "img_002.png", out, cfg)

        assert res.n_obs > 5 * 0.4 * 64 * 48
        J_true = dist_scene.J_views[2]
        valid = res.valid & ~np.isnan(res.J).any(axis=-1)
        assert valid.mean() > 0.85
        psnr = _psnr(res.J, J_true.astype(np.float32), valid)
        # same u8-quantization ceiling as the pinhole e2e test (~24 dB);
        # a geometry bug (e.g. distortion ignored on one path) collapses
        # this to <15 dB, so the margin is diagnostic
        assert psnr > 22.5, f"{dist_scene.camera_model}: PSNR {psnr:.2f} dB"
        np.testing.assert_allclose(
            np.asarray(res.params.beta), dist_scene.beta, atol=0.06
        )
        assert (out / "img_002_rgb.png").exists()
        assert (out / "img_002_reconstruction.png").exists()

    def test_survey_program_matches_chunked(self, dist_scene, tmp_path):
        """The one-program survey path (memory store, device-resident
        stack) agrees with the chunked hdf5 path on the SAME targets:
        identical observation counts and near-identical J (both paths run
        the same distorted geometry)."""
        scene = Scene.from_colmap(
            dist_scene.model_dir, dist_scene.image_dir, dist_scene.depth_dir
        )
        cfg_mem = RestoreConfig(num_iter=40, verbose=False, store="memory")
        res_mem = restore_many(
            scene, ["img_001.png", "img_003.png"], tmp_path / "mem", cfg_mem
        )
        cfg_h5 = RestoreConfig(num_iter=40, verbose=False)
        res_h5 = [
            restore_image(scene, n, tmp_path / "h5", cfg_h5)
            for n in ["img_001.png", "img_003.png"]
        ]
        for rm, rh in zip(res_mem, res_h5):
            assert rm.n_obs == rh.n_obs, "observation sets must agree"
            m = rm.valid & rh.valid
            np.testing.assert_allclose(rm.J[m], rh.J[m], rtol=0, atol=2e-5)

    def test_culling_preserves_observations(self, dist_scene, tmp_path):
        """Surface + tile culling under distortion: the undistorted-ray
        AABBs stay conservative (identical observation sets with culling
        on and off)."""
        scene = Scene.from_colmap(
            dist_scene.model_dir, dist_scene.image_dir, dist_scene.depth_dir
        )
        base = RestoreConfig(num_iter=2, verbose=False, store="memory")
        import dataclasses

        res_on = restore_image(
            scene, "img_000.png", tmp_path / "on",
            dataclasses.replace(base, frustum_cull=True, cull_tiles=4),
            cache=ViewCache(),
        )
        res_off = restore_image(
            scene, "img_000.png", tmp_path / "off",
            dataclasses.replace(base, frustum_cull=False),
            cache=ViewCache(),
        )
        assert res_on.n_obs == res_off.n_obs


def test_fisheye_cannot_mix_with_pinhole(tmp_path):
    from sucre_tpu.ops.distortion import resolve_dist_model

    with pytest.raises(ValueError, match="fisheye"):
        resolve_dist_model(["none", "fisheye"])
    with pytest.raises(ValueError, match="fisheye"):
        resolve_dist_model(["rational", "fisheye"])


def test_distorted_image_scale_recovers_ground_truth(tmp_path):
    """--image-scale 0.5 on a DISTORTED survey: the lens model acts on
    normalized coordinates, so it is invariant to the pixel-grid rescale
    — only the intrinsics scale. The reference cannot run this at all;
    the oracle is the downscaled ground-truth texture."""
    import cv2

    s = make_scene(tmp_path / "scene", n_views=5, width=128, height=96,
                   camera_model="OPENCV_FISHEYE")
    scene = Scene.from_colmap(s.model_dir, s.image_dir, s.depth_dir,
                              image_scale=0.5)
    res = restore_image(
        scene, "img_002.png", tmp_path / "out",
        RestoreConfig(num_iter=200, verbose=False, store="memory"),
    )
    assert res.J.shape == (48, 64, 3)
    J_true = cv2.resize(s.J_views[2].astype(np.float32), (64, 48),
                        interpolation=cv2.INTER_AREA)
    valid = res.valid & ~np.isnan(res.J).any(axis=-1)
    assert valid.mean() > 0.8
    psnr = _psnr(res.J, J_true, valid)
    assert psnr > 22.0, f"scaled distorted PSNR {psnr:.2f} dB"


def test_distorted_transect_with_culling_quality(tmp_path):
    """A spread transect where culling actually drops views, under
    rational distortion: observation sets identical to unculled, and the
    restore still recovers the texture."""
    s = make_scene(tmp_path / "scene", n_views=8, width=64, height=48,
                   camera_model="SIMPLE_RADIAL", spread=4.0)
    scene = Scene.from_colmap(s.model_dir, s.image_dir, s.depth_dir)
    import dataclasses

    base = RestoreConfig(num_iter=2, verbose=False, store="memory")
    r_on = restore_image(scene, "img_000.png", tmp_path / "on",
                         dataclasses.replace(base, cull_tiles=4),
                         cache=ViewCache())
    r_off = restore_image(scene, "img_000.png", tmp_path / "off",
                          dataclasses.replace(base, frustum_cull=False),
                          cache=ViewCache())
    assert r_on.n_obs == r_off.n_obs
