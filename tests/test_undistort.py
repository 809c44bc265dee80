"""Undistorted-output export (--undistort-output): the reference-style
pinhole deliverable for natively-restored distorted rigs, without
COLMAP's image undistorter. The source-coordinate map is pinned against
cv2's initUndistortRectifyMap (plain and fisheye variants), the
resampler against exact analytic cases, and the end-to-end artifact
against the analytic pinhole-grid ground truth of the synthetic scene."""

from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.utils.undistort import (
    resample_bilinear,
    undistort_image,
    undistort_source_coords,
)


class TestSourceCoords:
    def test_matches_cv2_rational(self):
        """cv2.initUndistortRectifyMap is the independent oracle: its maps
        give, per undistorted output pixel, the source position on the
        distorted grid — ours in the +0.5-center convention, cv2's in the
        integer-center convention (shift cx/cy and the result by 0.5)."""
        import cv2

        W, H = 64, 48
        fx, fy, cx, cy = 52.0, 50.0, 33.0, 23.5
        dist = np.array([-0.2, 0.05, 8e-4, -6e-4, 0.01, -0.05, 0.011, -0.002])
        su, sv = undistort_source_coords(
            W, H, np.array([fx, fy, cx, cy]), dist, "rational"
        )
        K_cv = np.array([[fx, 0, cx - 0.5], [0, fy, cy - 0.5], [0, 0, 1]])
        mapx, mapy = cv2.initUndistortRectifyMap(
            K_cv, dist, None, K_cv, (W, H), cv2.CV_32FC1
        )
        np.testing.assert_allclose(su - 0.5, mapx, atol=2e-3)
        np.testing.assert_allclose(sv - 0.5, mapy, atol=2e-3)

    def test_matches_cv2_fisheye(self):
        import cv2

        W, H = 64, 48
        fx, fy, cx, cy = 52.0, 50.0, 32.0, 24.0
        dist = np.zeros(8)
        dist[:4] = (-0.04, 0.01, -0.005, 0.001)
        su, sv = undistort_source_coords(
            W, H, np.array([fx, fy, cx, cy]), dist, "fisheye"
        )
        K_cv = np.array([[fx, 0, cx - 0.5], [0, fy, cy - 0.5], [0, 0, 1]])
        mapx, mapy = cv2.fisheye.initUndistortRectifyMap(
            K_cv, dist[:4].reshape(4, 1), np.eye(3), K_cv, (W, H), cv2.CV_32FC1
        )
        np.testing.assert_allclose(su - 0.5, mapx, atol=2e-3)
        np.testing.assert_allclose(sv - 0.5, mapy, atol=2e-3)

    def test_zero_rational_is_identity(self):
        su, sv = undistort_source_coords(
            16, 12, np.array([20.0, 20.0, 8.0, 6.0]), np.zeros(8), "rational"
        )
        uu, vv = np.meshgrid(np.arange(16.0), np.arange(12.0))
        np.testing.assert_allclose(su, uu + 0.5, atol=1e-12)
        np.testing.assert_allclose(sv, vv + 0.5, atol=1e-12)


class TestResample:
    def test_identity_map_is_exact(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(12, 16, 3)).astype(np.float32)
        uu, vv = np.meshgrid(np.arange(16.0) + 0.5, np.arange(12.0) + 0.5)
        out, valid = resample_bilinear(img, uu, vv)
        assert valid.all()
        np.testing.assert_array_equal(out, img)

    def test_affine_image_is_exact(self):
        """Bilinear interpolation reproduces an affine function exactly at
        interior sample positions."""
        H, W = 20, 30
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H))
        img = (0.3 * uu + 0.7 * vv + 1.0).astype(np.float32)
        rng = np.random.default_rng(1)
        su = rng.uniform(1.0, W - 1.0, size=(8, 9))
        sv = rng.uniform(1.0, H - 1.0, size=(8, 9))
        out, valid = resample_bilinear(img, su, sv)
        assert valid.all()
        np.testing.assert_allclose(out, 0.3 * (su - 0.5) + 0.7 * (sv - 0.5) + 1.0,
                                   rtol=0, atol=1e-4)

    def test_nan_neighbors_renormalize(self):
        """One NaN source pixel must not poison its 2x2 neighborhoods: the
        remaining valid neighbors renormalize; an all-invalid neighborhood
        comes back invalid (NaN)."""
        img = np.ones((8, 8), np.float32) * 5.0
        img[3, 4] = np.nan
        # sample between (3,3) and (3,4): three valid neighbors remain
        out, valid = resample_bilinear(img, np.array([[4.5]]), np.array([[4.0]]))
        assert valid[0, 0]
        np.testing.assert_allclose(out[0, 0], 5.0, atol=1e-6)
        # sample exactly ON the NaN pixel's center: its weight is 1, no
        # valid contributor remains
        out, valid = resample_bilinear(img, np.array([[4.5]]), np.array([[3.5]]))
        assert not valid[0, 0]
        assert np.isnan(out[0, 0])

    def test_out_of_bounds_is_invalid(self):
        img = np.ones((8, 8), np.float32)
        out, valid = resample_bilinear(
            img, np.array([[-3.0, 4.0]]), np.array([[4.0, 40.0]])
        )
        assert not valid.any()
        # non-finite source coords (non-invertible forward map) too
        out, valid = resample_bilinear(
            img, np.array([[np.nan]]), np.array([[4.0]])
        )
        assert not valid[0, 0]

    def test_none_model_is_passthrough(self):
        img = np.full((4, 5, 3), 2.0, np.float32)
        out, valid = undistort_image(img, None, np.array([1.0, 1, 2, 2]),
                                     np.zeros(8), "none")
        np.testing.assert_array_equal(out, img)
        assert valid.all()


class TestEndToEnd:
    @pytest.mark.parametrize("camera_model", ["OPENCV", "OPENCV_FISHEYE"])
    def test_undistorted_artifact_matches_pinhole_ground_truth(
        self, camera_model, tmp_path
    ):
        """Restore a distorted synthetic survey with undistort_output on:
        the extra artifact exists, and resampling the restored J onto the
        pinhole grid reproduces the ANALYTIC pinhole-grid texture (the
        plane intersected by straight rays) at the same quality ceiling as
        the distorted-grid restoration itself."""
        from sucre_tpu import synth
        from sucre_tpu.pipeline import RestoreConfig, restore_image
        from sucre_tpu.scene import Scene

        s = synth.make_scene(tmp_path / "scene", n_views=5, width=64,
                             height=48, camera_model=camera_model)
        scene = Scene.from_colmap(s.model_dir, s.image_dir, s.depth_dir)
        out = tmp_path / "out"
        res = restore_image(
            scene, "img_002.png", out,
            RestoreConfig(num_iter=200, verbose=False, store="memory",
                          undistort_output=True),
        )
        assert (out / "img_002_rgb_undistorted.png").exists()
        assert any(p.name == "img_002_rgb_undistorted.png"
                   for p in res.artifacts)

        view = scene["img_002.png"]
        J_und, valid_und = undistort_image(
            res.J, res.valid, view.intrinsics, view.dist, view.dist_model
        )
        # analytic pinhole ground truth: straight rays intersect the
        # tilted plane (same construction as synth.make_scene, no lens)
        fx, fy, cx, cy = view.intrinsics
        uu, vv = np.meshgrid(np.arange(s.width), np.arange(s.height))
        xr = (uu + 0.5 - cx) / fx
        yr = (vv + 0.5 - cy) / fy
        _, t_cw = s.poses[2]
        slope = 0.35
        zc = (s.plane_z + slope * t_cw[0] - t_cw[2]) / (1.0 - slope * xr)
        J_true = synth.texture(t_cw[0] + xr * zc, t_cw[1] + yr * zc)
        m = valid_und & np.isfinite(J_und).all(axis=-1)
        assert m.mean() > 0.7, "undistorted frame mostly covered"
        mse = np.mean((J_und[m] - J_true[m].astype(np.float32)) ** 2)
        psnr = 10 * np.log10(1.0 / mse)
        assert psnr > 22.0, f"{camera_model}: undistorted PSNR {psnr:.2f} dB"

    def test_pinhole_target_flag_is_noop(self, tmp_path):
        from sucre_tpu import synth
        from sucre_tpu.pipeline import RestoreConfig, restore_image
        from sucre_tpu.scene import Scene

        s = synth.make_scene(tmp_path / "scene", n_views=3, width=32, height=24)
        scene = Scene.from_colmap(s.model_dir, s.image_dir, s.depth_dir)
        out = tmp_path / "out"
        res = restore_image(
            scene, "img_001.png", out,
            RestoreConfig(num_iter=2, verbose=False, store="memory",
                          undistort_output=True),
        )
        assert not any("undistorted" in p.name for p in res.artifacts)

    def test_cli_flag_reaches_config(self):
        from sucre_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["--image-dir", "i", "--depth-dir", "d", "--model-dir", "m",
             "--output-dir", "o", "--image-name", "x", "--undistort-output"]
        )
        assert args.undistort_output
