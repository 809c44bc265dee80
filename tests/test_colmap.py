"""COLMAP parser round-trip tests + Scene ingest parity tests."""

import numpy as np
import pytest

from sucre_tpu.io import colmap as cio
from sucre_tpu.scene import Scene, _qvec_to_rotmat_np
from tests.synthetic import make_scene, _rotmat_to_qvec


def _sample_model():
    cameras = {
        1: cio.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 480.0, 320.0, 240.0])),
        2: cio.ColmapCamera(2, "PINHOLE", 1920, 1080, np.array([1000.0, 1000.0, 960.0, 540.0])),
    }
    images = {
        3: cio.ColmapImage(
            3,
            qvec=np.array([0.99875, 0.0499, 0.0, 0.0]),
            tvec=np.array([0.1, -0.2, 0.3]),
            camera_id=1,
            name="a_img.png",
            xys=np.array([[1.5, 2.5], [3.0, 4.0]]),
            point3D_ids=np.array([7, -1], np.int64),
        ),
        5: cio.ColmapImage(
            5,
            qvec=np.array([1.0, 0.0, 0.0, 0.0]),
            tvec=np.zeros(3),
            camera_id=2,
            name="b dir/img2.jpg",
            xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        ),
    }
    points = {
        11: cio.ColmapPoint3D(
            11,
            xyz=np.array([1.0, 2.0, 3.0]),
            rgb=np.array([10, 20, 30], np.uint8),
            error=0.5,
            image_ids=np.array([3, 5], np.int32),
            point2D_idxs=np.array([0, 1], np.int32),
        )
    }
    return cameras, images, points


@pytest.mark.parametrize("fmt", ["bin", "txt"])
def test_roundtrip(tmp_path, fmt):
    cameras, images, points = _sample_model()
    if fmt == "bin":
        cio.write_cameras_bin(cameras, tmp_path / "cameras.bin")
        cio.write_images_bin(images, tmp_path / "images.bin")
        cio.write_points3D_bin(points, tmp_path / "points3D.bin")
    else:
        cio.write_cameras_txt(cameras, tmp_path / "cameras.txt")
        cio.write_images_txt(images, tmp_path / "images.txt")
        cio.write_points3D_txt(points, tmp_path / "points3D.txt")

    c2, i2, p2 = cio.read_model(tmp_path, with_points3D=True)

    assert set(c2) == set(cameras)
    for cid, cam in cameras.items():
        assert c2[cid].model == cam.model
        assert (c2[cid].width, c2[cid].height) == (cam.width, cam.height)
        np.testing.assert_allclose(c2[cid].params, cam.params)

    assert set(i2) == set(images)
    for iid, im in images.items():
        np.testing.assert_allclose(i2[iid].qvec, im.qvec)
        np.testing.assert_allclose(i2[iid].tvec, im.tvec)
        assert i2[iid].camera_id == im.camera_id
        assert i2[iid].name == im.name
        np.testing.assert_allclose(i2[iid].xys, im.xys)
        np.testing.assert_array_equal(i2[iid].point3D_ids, im.point3D_ids)

    assert set(p2) == set(points)
    pt = p2[11]
    np.testing.assert_allclose(pt.xyz, points[11].xyz)
    np.testing.assert_array_equal(pt.rgb, points[11].rgb)
    np.testing.assert_array_equal(pt.image_ids, points[11].image_ids)


def test_unsupported_camera_model_rejected(tmp_path):
    """ALL 11 real COLMAP camera models are accepted since round 3
    (ops/distortion.py), so format-level rejection is the only rejection
    left: a model name outside COLMAP's table fails the parse with an
    actionable message, and colmap_to_canonical (reachable through
    Scene.from_model_dicts with user-built dicts) rejects unknown names
    too."""
    cameras = {1: cio.ColmapCamera(
        1, "NOT_A_MODEL", 640, 480, np.array([500.0, 320.0, 240.0]))}
    cio.write_cameras_txt(cameras, tmp_path / "cameras.txt")
    cio.write_images_txt({}, tmp_path / "images.txt")
    with pytest.raises(ValueError, match="Unknown COLMAP camera model"):
        Scene.from_colmap(tmp_path, tmp_path, tmp_path)

    from sucre_tpu.ops.distortion import colmap_to_canonical
    with pytest.raises(ValueError, match="not supported"):
        colmap_to_canonical("NOT_A_MODEL", [500.0, 320.0, 240.0])


def test_distorted_models_ingest(tmp_path):
    """SIMPLE_RADIAL ingests with the canonical distortion vector."""
    cameras = {1: cio.ColmapCamera(
        1, "SIMPLE_RADIAL", 640, 480, np.array([500.0, 320.0, 240.0, -0.1]))}
    images = {
        1: cio.ColmapImage(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                           "a.png", np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    cio.write_cameras_txt(cameras, tmp_path / "cameras.txt")
    cio.write_images_txt(images, tmp_path / "images.txt")
    scene = Scene.from_colmap(tmp_path, tmp_path, tmp_path)
    v = scene["a.png"]
    assert v.dist_model == "rational" and v.fx == v.fy == 500.0
    assert v.dist[0] == np.float32(-0.1) and (v.dist[1:] == 0).all()


def test_simple_pinhole_accepted(tmp_path):
    """SIMPLE_PINHOLE (f, cx, cy) ingests as PINHOLE with fx = fy = f —
    losslessly undistorted, so there's no reason to force users through
    a model conversion (additive over the reference's PINHOLE assert)."""
    cameras = {
        1: cio.ColmapCamera(1, "SIMPLE_PINHOLE", 640, 480,
                            np.array([500.0, 320.0, 240.0])),
    }
    images = {
        1: cio.ColmapImage(1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1,
                           "a.png", np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    cio.write_cameras_txt(cameras, tmp_path / "cameras.txt")
    cio.write_images_txt(images, tmp_path / "images.txt")
    scene = Scene.from_colmap(tmp_path, tmp_path, tmp_path)
    v = scene["a.png"]
    assert (v.fx, v.fy, v.cx, v.cy) == (500.0, 500.0, 320.0, 240.0)
    # image_scale rescales f per-axis exactly like PINHOLE
    s = Scene.from_colmap(tmp_path, tmp_path, tmp_path, image_scale=0.5)["a.png"]
    assert (s.width, s.height) == (320, 240)
    assert (s.fx, s.fy) == (250.0, 250.0)


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = _qvec_to_rotmat_np(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        q2 = _rotmat_to_qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


class TestSceneIngest:
    def test_from_colmap(self, tmp_path):
        scene_def = make_scene(tmp_path, n_views=3)
        scene = Scene.from_colmap(scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir)
        assert len(scene) == 3
        view = scene["img_001.png"]
        assert view.width == scene_def.width and view.height == scene_def.height
        # Pose stored cam->world: matches the synthetic ground truth
        R_gt, t_gt = scene_def.poses[1]
        np.testing.assert_allclose(view.R, R_gt, atol=1e-6)
        np.testing.assert_allclose(view.t, t_gt, atol=1e-6)
        assert view.depth_path.name == "depth_img_001.png"
        assert view.rgb_path.exists() and view.depth_path.exists()

    def test_nested_image_names_keep_subdirs(self, tmp_path):
        """Depth-path with_stem parity (sfm.py:214): 'cam0/img.jpg' ->
        depth_dir/cam0/depth_img.png — flattening would collide
        same-basename images from different subdirectories."""
        scene_def = make_scene(tmp_path, n_views=2)
        from sucre_tpu.io import colmap as cio

        cameras, images, _ = cio.read_model(scene_def.model_dir)
        for i, im in images.items():
            im.name = f"cam{i % 2}/shot.png"
        cio.write_images_bin(images, scene_def.model_dir / "images.bin")
        scene = Scene.from_colmap(
            scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir
        )
        paths = {v.depth_path for v in scene.view_list()}
        assert paths == {
            scene_def.depth_dir / "cam0" / "depth_shot.png",
            scene_def.depth_dir / "cam1" / "depth_shot.png",
        }

    def test_text_model(self, tmp_path):
        scene_def = make_scene(tmp_path, n_views=2, binary=False)
        scene = Scene.from_colmap(scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir)
        assert len(scene) == 2

    def test_image_scale_parity(self, tmp_path):
        # Parity with sfm.py:193-199: int() truncation of scaled dims, then
        # separate w/h factors recomputed from the integer dims.
        scene_def = make_scene(tmp_path, n_views=1, width=64, height=48)
        scale = 0.37
        scene = Scene.from_colmap(
            scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir, image_scale=scale
        )
        v = scene["img_000.png"]
        width, height = int(64 * scale), int(48 * scale)
        assert (v.width, v.height) == (width, height)
        fx0, fy0 = 0.8 * 64, 0.8 * 64
        cx0, cy0 = 32.0, 24.0
        np.testing.assert_allclose(v.fx, fx0 * width / 64, rtol=1e-12)
        np.testing.assert_allclose(v.fy, fy0 * height / 48, rtol=1e-12)
        np.testing.assert_allclose(v.cx, cx0 * width / 64, rtol=1e-12)
        np.testing.assert_allclose(v.cy, cy0 * height / 48, rtol=1e-12)

    def test_stack(self, tmp_path):
        scene_def = make_scene(tmp_path, n_views=4)
        scene = Scene.from_colmap(scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir)
        stack = Scene.stack(scene.view_list())
        assert stack.intrinsics.shape == (4, 4)
        assert stack.R.shape == (4, 3, 3)
        assert stack.t.shape == (4, 3)
        assert len(stack) == 4


def test_images_txt_zero_points_and_spaced_names(tmp_path):
    """A zero-point image followed by a header whose name contains spaces
    (token count divisible by 3) must parse via strict two-line pairing."""
    from sucre_tpu.io import colmap as cio

    txt = "\n".join([
        "# comment",
        "1 1.0 0.0 0.0 0.0 0.1 0.2 0.3 1 my photo 01.png",
        "",  # zero POINTS2D
        "2 1.0 0.0 0.0 0.0 0.4 0.5 0.6 1 my photo 02.png",
        "1.5 2.5 7 3.5 4.5 9",
        "",
    ])
    p = tmp_path / "images.txt"
    p.write_text(txt)
    images = cio.read_images_txt(p)
    assert images[1].name == "my photo 01.png"
    assert len(images[1].point3D_ids) == 0
    assert images[2].name == "my photo 02.png"
    assert list(images[2].point3D_ids) == [7, 9]


def test_images_txt_preserves_consecutive_spaces_in_names(tmp_path):
    """COLMAP treats the name as the verbatim line remainder; a
    split/rejoin parser would collapse 'frame  001.png' (double space)
    to 'frame 001.png' and every path lookup would miss."""
    from sucre_tpu.io import colmap as cio

    txt = "\n".join([
        "1 1.0 0.0 0.0 0.0 0.1 0.2 0.3 1 cam0/frame  001.png",
        "",
        "",
    ])
    p = tmp_path / "images.txt"
    p.write_text(txt)
    images = cio.read_images_txt(p)
    assert images[1].name == "cam0/frame  001.png"


def test_scene_rejects_unknown_camera_id(tmp_path):
    """An images.bin entry referencing a camera missing from cameras.bin
    (truncated/filtered model) must fail with a named error, not a bare
    KeyError from deep inside ingest."""
    import pytest

    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path, n_views=3, width=32, height=24)
    from sucre_tpu.io import colmap as cio

    cams, images, _ = cio.read_model(sd.model_dir)
    import dataclasses

    images[1] = dataclasses.replace(images[1], camera_id=99)
    with pytest.raises(ValueError, match="camera_id"):
        Scene.from_model_dicts(cams, images, sd.image_dir, sd.depth_dir)


def test_scene_stack_empty_raises(tmp_path):
    import pytest

    from sucre_tpu.scene import Scene

    with pytest.raises(ValueError, match="zero views"):
        Scene.stack([])
