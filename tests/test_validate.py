"""Dataset pre-flight validator (`python -m sucre_tpu.validate`)."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.validate import main, probe_headers, validate
from tests.synthetic import make_scene


@pytest.fixture()
def sd(tmp_path):
    return make_scene(tmp_path / "s", n_views=4, width=48, height=32)


def _args(sd, extra=()):
    return [
        "--image-dir", str(sd.image_dir),
        "--depth-dir", str(sd.depth_dir),
        "--model-dir", str(sd.model_dir),
        *extra,
    ]


def test_probe_headers_png_and_jpeg(tmp_path):
    import cv2

    depth = (np.arange(48 * 32, dtype=np.uint16)).reshape(32, 48)
    cv2.imwrite(str(tmp_path / "d.png"), depth)
    assert probe_headers(tmp_path / "d.png") == (48, 32, 16, "png", 0)

    rgb = np.zeros((32, 48, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "i.png"), rgb)
    assert probe_headers(tmp_path / "i.png") == (48, 32, 8, "png", 2)
    cv2.imwrite(str(tmp_path / "i.jpg"), rgb)
    assert probe_headers(tmp_path / "i.jpg") == (48, 32, 8, "jpeg", None)

    (tmp_path / "x.bin").write_bytes(b"not an image")
    assert probe_headers(tmp_path / "x.bin") is None

    # truncated headers (interrupted copy) degrade to None, never raise
    (tmp_path / "t.png").write_bytes(b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR\x00\x01")
    assert probe_headers(tmp_path / "t.png") is None
    (tmp_path / "t.jpg").write_bytes(b"\xff\xd8\xff\xc0\x00\x11")
    assert probe_headers(tmp_path / "t.jpg") is None
    (tmp_path / "t2.jpg").write_bytes(b"\xff\xd8\xff\xe0\x00\x00")
    assert probe_headers(tmp_path / "t2.jpg") is None


def test_clean_scene_passes(sd, capsys):
    assert main(_args(sd, ["--deep"])) == 0
    out = capsys.readouterr().out
    assert "0 errors, 0 warnings" in out


def test_findings(sd, tmp_path, capsys):
    import cv2

    # break one depth map: 8-bit (unit-mistake warning)
    bad8 = np.full((32, 48), 100, np.uint8)
    cv2.imwrite(str(sd.depth_dir / "depth_img_001.png"), bad8)
    # delete another depth map entirely
    (sd.depth_dir / "depth_img_002.png").unlink()
    # corrupt an RGB file (decode fails only under --deep)
    (sd.image_dir / "img_003.png").write_bytes(b"\x89PNG\r\n\x1a\nIHDRgarbage")

    findings, summary = validate(sd.model_dir, sd.image_dir, sd.depth_dir,
                                 deep=True)
    codes = {(f.code, f.image) for f in findings}
    assert ("depth-bitdepth", "img_001.png") in codes
    assert ("depth-missing", "img_002.png") in codes
    assert ("rgb-decode", "img_003.png") in codes
    assert summary["n_errors"] >= 2  # missing depth + corrupt rgb

    rc = main(_args(sd, ["--deep", "--json", str(tmp_path / "v.json")]))
    assert rc == 1
    rep = json.loads((tmp_path / "v.json").read_text())
    assert rep["n_errors"] == summary["n_errors"]
    assert any(f["code"] == "depth-missing" for f in rep["findings"])


def test_duplicate_names_flagged(sd):
    from sucre_tpu.io import colmap as cio

    cams, imgs, _ = cio.read_model(sd.model_dir)
    first = min(imgs)
    imgs[first] = dataclasses.replace(imgs[first], name=imgs[max(imgs)].name)
    cio.write_images_bin(imgs, sd.model_dir / "images.bin")
    findings, _ = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    assert any(f.code == "duplicate-name" and f.level == "ERROR"
               for f in findings)


def test_image_scale_suppresses_dim_warnings(sd):
    """At image_scale != 1 every file's dims legitimately differ from the
    scaled camera dims — no warning spam."""
    findings, _ = validate(sd.model_dir, sd.image_dir, sd.depth_dir,
                           image_scale=0.5)
    assert not [f for f in findings if f.code in ("rgb-dims", "depth-dims")]


def test_bad_camera_does_not_abort(sd, monkeypatch):
    """One unsupported camera (or an image referencing a missing one) is
    a reported finding — the REST of the dataset still gets validated
    (the whole point of pre-flight vs the ingest's raise)."""
    import numpy as np

    from sucre_tpu.io import colmap as cio

    # ALL 11 real COLMAP models are supported since round 3, so the
    # unsupported-model branch is only reachable for models COLMAP gains
    # in the future — simulate one by shrinking the supported set.
    import sucre_tpu.ops.distortion as dist_mod
    monkeypatch.setattr(
        dist_mod, "COLMAP_DISTORTED_MODELS",
        tuple(m for m in dist_mod.COLMAP_DISTORTED_MODELS if m != "FOV"))

    cams, imgs, _ = cio.read_model(sd.model_dir)
    cams[99] = cio.ColmapCamera(99, "FOV", 64, 48,
                                np.array([50.0, 50.0, 32.0, 24.0, 0.9]))
    first = min(imgs)
    imgs[first] = dataclasses.replace(imgs[first], camera_id=99)
    second = sorted(imgs)[1]
    imgs[second] = dataclasses.replace(imgs[second], camera_id=7)  # dangling
    cio.write_cameras_bin(cams, sd.model_dir / "cameras.bin")
    cio.write_images_bin(imgs, sd.model_dir / "images.bin")
    # also break a depth map of a GOOD image: still reported
    (sd.depth_dir / "depth_img_003.png").unlink()
    # AND the depth map of the image whose CAMERA was rejected: its
    # RGB/depth files must still be checked (one camera-model error
    # must not hide per-view findings)
    rejected_name = imgs[first].name
    (sd.depth_dir / f"depth_{Path(rejected_name).stem}.png").unlink()

    findings, summary = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    codes = {f.code for f in findings}
    assert {"camera-model", "dangling-camera", "depth-missing"} <= codes
    assert any(f.code == "depth-missing" and f.image == rejected_name
               for f in findings)
    assert summary["n_errors"] >= 4

    # The rejected image's file checks use the SAME depth lookup as the
    # pipeline: a depth map present in an alternative format (.npy) must
    # not produce a spurious depth-missing for it.
    np.save(sd.depth_dir / f"depth_{Path(rejected_name).stem}.npy",
            np.full((48, 64), 2000, np.uint16))
    findings2, _ = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    assert not any(f.code == "depth-missing" and f.image == rejected_name
                   for f in findings2)
    assert any(f.code == "camera-model" for f in findings2)


def test_exif_orientation_warn(sd):
    """EXIF-tagged JPEGs get a WARN (pixels are re-oriented at decode —
    the user must check poses/depths match the displayed frame), and for
    tags 5-8 the dims check runs in the DISPLAYED frame (no false
    rgb-dims warning when the camera matches the rotated image)."""
    from PIL import Image

    from sucre_tpu.validate import exif_orientation

    # Scene views are 48x32; write a 32x48 JPEG that DISPLAYS as 48x32
    # under orientation 6 (file signature is what counts, not the suffix).
    a = (np.arange(48 * 32 * 3) % 250).astype(np.uint8).reshape(48, 32, 3)
    e = Image.Exif()
    e[274] = 6
    Image.fromarray(a).save(sd.image_dir / "img_001.png", format="JPEG", exif=e)
    assert exif_orientation(sd.image_dir / "img_001.png") == 6
    assert exif_orientation(sd.image_dir / "img_002.png") == 0  # plain png

    findings, _ = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    assert any(f.code == "exif-orientation" and f.image == "img_001.png"
               and f.level == "WARN" for f in findings)
    # displayed dims (48x32) match the camera: no rgb-dims warning
    assert not any(f.code == "rgb-dims" and f.image == "img_001.png"
                   for f in findings)


def test_unparseable_model_is_fatal(tmp_path, capsys):
    (tmp_path / "cameras.bin").write_bytes(b"garbage")
    (tmp_path / "images.bin").write_bytes(b"garbage")
    rc = main(["--image-dir", str(tmp_path), "--depth-dir", str(tmp_path),
               "--model-dir", str(tmp_path)])
    assert rc == 2
    assert "FATAL" in capsys.readouterr().out


def test_jpeg_subtype_warn_cmyk(sd, capsys):
    """A CMYK JPEG (4 SOF components) gets a pre-flight WARN: it decodes
    reference-identically via the cv2 fallback but demotes the native
    batch prefill."""
    from PIL import Image

    from sucre_tpu.validate import jpeg_components

    v = sd.names[0]
    img = np.zeros((32, 48, 4), np.uint8)
    p = sd.image_dir / v
    Image.fromarray(img, mode="CMYK").save(p.with_suffix(".jpg"))
    p.with_suffix(".jpg").replace(p)  # keep the model's registered name
    assert jpeg_components(p) == 4

    rc = main(_args(sd))
    out = capsys.readouterr().out
    assert rc == 0  # warnings don't fail the pre-flight
    assert "jpeg-subtype" in out and "4 components" in out


def test_jpeg_subtype_no_warn_gray_and_ycbcr(tmp_path):
    from PIL import Image

    from sucre_tpu.validate import jpeg_components

    g = tmp_path / "g.jpg"
    Image.fromarray(np.zeros((32, 48), np.uint8), mode="L").save(g)
    assert jpeg_components(g) == 1  # gray: native handles, no warn path
    c = tmp_path / "c.jpg"
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(c)
    assert jpeg_components(c) == 3
    assert jpeg_components(tmp_path / "missing.jpg") == 0


def test_distorted_camera_models_accepted_with_info(tmp_path, capsys):
    """Natively-supported distorted COLMAP models pre-flight clean: an
    INFO finding (not ERROR/WARN) notes the native handling."""
    from tests.synthetic import make_scene
    from sucre_tpu.validate import main, validate

    sd = make_scene(tmp_path, n_views=3, width=48, height=32,
                    camera_model="OPENCV_FISHEYE")
    findings, summary = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    info = [f for f in findings if f.level == "INFO" and f.code == "camera-model"]
    assert info and "OPENCV_FISHEYE" in info[0].message
    assert summary["n_errors"] == 0 and summary["n_warnings"] == 0
    rc = main(["--model-dir", str(sd.model_dir),
               "--image-dir", str(sd.image_dir),
               "--depth-dir", str(sd.depth_dir)])
    assert rc == 0


class TestSfmConsistency:
    """--deep depth-vs-reconstruction check: triangulated points3D pin
    the true Z-depth at their keypoints, catching scale/unit mistakes
    and misaligned maps that every per-file check passes."""

    def _scene(self, tmp_path, **kw):
        return make_scene(tmp_path / "s", n_views=4, width=48, height=32,
                          n_points3d=300, **kw)

    def test_consistent_scene_reports_info(self, tmp_path):
        sd = self._scene(tmp_path)
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, deep=True)
        assert summary["n_errors"] == 0 and summary["n_warnings"] == 0
        stats = summary["sfm_consistency"]
        assert stats is not None and stats["n_samples"] > 100
        assert abs(stats["median_depth_ratio"] - 1.0) < 0.02
        # our projection of the map's own points lands on its keypoints:
        # sub-pixel reprojection through the full ingested camera model
        assert stats["median_reproj_px"] < 0.5
        assert any(f.code == "sfm-consistency" and f.level == "INFO"
                   and "agree" in f.message for f in findings)

    def test_distorted_camera_reprojects_through_lens(self, tmp_path):
        """Keypoints in a fisheye reconstruction only reproject cleanly if
        the validator pushes points through the lens model — a pinhole
        shortcut would WARN here."""
        sd = self._scene(tmp_path, camera_model="OPENCV_FISHEYE")
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, deep=True)
        stats = summary["sfm_consistency"]
        assert stats["median_reproj_px"] < 0.5
        assert not any(f.code == "sfm-reproj" for f in findings)

    def test_unit_mistake_is_error(self, tmp_path):
        """Centimeter depth maps (10x off): every per-file check passes,
        only the reconstruction cross-check catches it."""
        import cv2

        sd = self._scene(tmp_path)
        for p in sd.depth_dir.glob("depth_*.png"):
            d = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
            cv2.imwrite(str(p), (d // 10).astype(np.uint16))
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, deep=True)
        err = [f for f in findings if f.code == "depth-scale"
               and f.level == "ERROR"]
        assert err and "unit mistake" in err[0].message

    def test_single_misaligned_map_warns_that_image(self, tmp_path):
        """One mis-exported depth map hides inside a healthy global
        median — the per-image outlier check names it."""
        import cv2

        sd = self._scene(tmp_path)
        p = sd.depth_dir / "depth_img_001.png"
        d = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
        cv2.imwrite(str(p), (d.astype(np.uint32) * 3 // 2).astype(np.uint16))
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, deep=True)
        assert any(f.code == "depth-scale" and f.image == "img_001.png"
                   and f.level == "WARN" for f in findings)

    def test_empty_points3d_skips_with_info(self, sd):
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, deep=True)
        assert summary["sfm_consistency"] is None
        assert any(f.code == "sfm-consistency" and f.level == "INFO"
                   and "cannot be checked" in f.message for f in findings)
        assert summary["n_errors"] == 0

    def test_image_scale_scales_keypoints(self, tmp_path):
        """Keypoints are stored at the original resolution; at
        image_scale 0.5 the check must still line up."""
        sd = self._scene(tmp_path)
        findings, summary = validate(sd.model_dir, sd.image_dir,
                                     sd.depth_dir, image_scale=0.5, deep=True)
        stats = summary["sfm_consistency"]
        assert stats is not None
        assert abs(stats["median_depth_ratio"] - 1.0) < 0.05
        assert not any(f.code == "depth-scale" for f in findings)


def test_multichannel_depth_png_flagged(sd):
    """A 16-bit RGB depth PNG passes the bit-depth check but is almost
    always an exporter mistake; the validator must call it out."""
    import cv2

    d = np.full((32, 48), 1000, np.uint16)
    cv2.imwrite(
        str(sd.depth_dir / "depth_img_001.png"),
        np.repeat(d[..., None], 3, axis=2),
    )
    findings, _ = validate(sd.model_dir, sd.image_dir, sd.depth_dir)
    codes = {(f.code, f.image) for f in findings}
    assert ("depth-channels", "img_001.png") in codes
