"""Kitchen-sink integration test: a survey that combines the messy
real-world traits the suite otherwise tests one at a time — nested
multi-camera names, mixed camera dims, JPEG inputs, an EXIF-rotated
file, a CMYK JPEG (demotes the native batch prefill to cv2 wholesale),
and a zero-depth target — through the full CLI surface (image list with
blank lines, --report). Features interact: e.g. the CMYK fallback must
not break nested-path decode, and tile culling must handle a target
whose every tile AABB is None."""

import dataclasses
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.cli import main
from tests.synthetic import make_scene


@pytest.fixture()
def messy(tmp_path):
    """6-view two-camera JPEG scene, mangled:
    - views 0-2 nested under cam0/ (model names rewritten);
    - view 1 re-encoded rotated with EXIF orientation 6;
    - view 3 re-encoded as CMYK;
    - view 5's depth map zeroed (a doomed target)."""
    import cv2
    from PIL import Image

    from sucre_tpu.io import colmap as cio

    sd = make_scene(
        tmp_path / "s", n_views=6, width=64, height=48,
        jpeg=True, two_cameras=True,
    )

    # nest the first three views under cam0/
    (sd.image_dir / "cam0").mkdir()
    (sd.depth_dir / "cam0").mkdir()
    renames = {}
    for n in sd.names[:3]:
        shutil.move(sd.image_dir / n, sd.image_dir / "cam0" / n)
        dname = f"depth_{Path(n).stem}.png"
        shutil.move(sd.depth_dir / dname, sd.depth_dir / "cam0" / dname)
        renames[n] = f"cam0/{n}"
    cams, imgs, _ = cio.read_model(sd.model_dir)
    imgs = {
        k: dataclasses.replace(im, name=renames.get(im.name, im.name))
        for k, im in imgs.items()
    }
    cio.write_cameras_bin(cams, sd.model_dir / "cameras.bin")
    cio.write_images_bin(imgs, sd.model_dir / "images.bin")
    names = [renames.get(n, n) for n in sd.names]

    # view 1 (nested): store rotated 90° with EXIF orientation 6 so the
    # DISPLAYED image (what decoders must return) matches the original
    p1 = sd.image_dir / names[1]
    rgb = cv2.cvtColor(cv2.imread(str(p1)), cv2.COLOR_BGR2RGB)
    stored = np.rot90(rgb, k=1)  # displayed-under-tag-6 == rgb
    exif = Image.Exif()
    exif[274] = 6
    Image.fromarray(stored).save(p1, format="JPEG", quality=95, exif=exif)

    # view 3 (flat): CMYK JPEG — native decode fails cleanly, cv2 fallback
    p3 = sd.image_dir / names[3]
    rgb3 = cv2.cvtColor(cv2.imread(str(p3)), cv2.COLOR_BGR2RGB)
    Image.fromarray(rgb3).convert("CMYK").save(p3, format="JPEG", quality=95)

    # view 5 (flat): zero depth — a target with no possible observations
    d5 = sd.depth_dir / f"depth_{Path(names[5]).stem}.png"
    z = cv2.imread(str(d5), cv2.IMREAD_UNCHANGED)
    cv2.imwrite(str(d5), np.zeros_like(z))

    return sd, names


def test_messy_survey_cli_end_to_end(messy, tmp_path):
    sd, names = messy
    out = tmp_path / "out"
    lst = tmp_path / "list.txt"
    # blank lines and the doomed target in the list (reference crashes on
    # blanks; we skip them)
    lst.write_text(f"{names[0]}\n\n{names[4]}\n{names[5]}\n\n")
    report = tmp_path / "report.json"

    rc = main([
        "--image-dir", str(sd.image_dir),
        "--depth-dir", str(sd.depth_dir),
        "--model-dir", str(sd.model_dir),
        "--output-dir", str(out),
        "--image-list", str(lst),
        "--num-iter", "3",
        "--store", "memory",
        "--report", str(report),
        "--quiet",
    ])
    assert rc == 1  # the zero-depth target failed; the run survived

    # healthy targets restored, nested artifact under cam0/
    assert (out / "cam0" / f"{Path(names[0]).stem}_rgb.png").exists()
    assert (out / "cam0" / f"{Path(names[0]).stem}.npz").exists()
    assert (out / f"{Path(names[4]).stem}_rgb.png").exists()
    # doomed target produced no artifact
    assert not (out / f"{Path(names[5]).stem}.npz").exists()

    rep = json.loads(report.read_text())
    assert names[5] in rep["failed_targets"]
    done = {r["image"]: r for r in rep["targets"]}
    assert done[names[0]]["n_obs"] > 0
    assert done[names[4]]["n_obs"] > 0


def test_messy_survey_observations_match_plain_decode(messy):
    """The EXIF and CMYK re-encodes change pixels (lossy), never
    geometry: matching is depth-driven, so the messy survey's
    observation COUNTS must equal a restore over the same scene with
    the mangled files decoded by cv2 alone (the reference decoder) —
    i.e. the native fast path and its fallbacks do not alter matches."""
    import cv2

    from sucre_tpu.pipeline import RestoreConfig, ViewCache, restore_image
    from sucre_tpu.scene import Scene

    sd, names = messy
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)

    cache_native = ViewCache()
    out = Path(sd.model_dir).parent / "n"
    cfg = RestoreConfig(num_iter=2, verbose=False, store="memory")
    res = restore_image(scene, names[0], out, cfg, cache=cache_native)

    # cv2-only cache: decode every view exactly as the reference would
    cache_cv2 = ViewCache()
    for v in scene.view_list():
        bgr = cv2.imread(str(v.rgb_path))
        rgb = np.ascontiguousarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        depth = np.ascontiguousarray(
            cv2.imread(str(v.depth_path), cv2.IMREAD_UNCHANGED)
        )
        cache_cv2._data[v.name] = (rgb, depth)
    res2 = restore_image(
        scene, names[0], Path(sd.model_dir).parent / "c", cfg, cache=cache_cv2
    )
    assert res.n_obs == res2.n_obs
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(res.J)),
        np.nan_to_num(np.asarray(res2.J)),
        atol=1e-5,
    )
