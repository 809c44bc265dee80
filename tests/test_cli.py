"""CLI surface tests: the reference's flag set drives the full pipeline."""

from pathlib import Path

import numpy as np
import pytest

from sucre_tpu.cli import build_parser, main
from tests.synthetic import make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("cli_scene"), n_views=4)


def _base_args(scene_dir, out):
    return [
        "--image-dir", str(scene_dir.image_dir),
        "--depth-dir", str(scene_dir.depth_dir),
        "--model-dir", str(scene_dir.model_dir),
        "--output-dir", str(out),
        "--num-iter", "3",
        "--quiet",
    ]


def test_image_name_mode(scene_dir, tmp_path):
    out = tmp_path / "o1"
    rc = main(_base_args(scene_dir, out) + ["--image-name", "img_001.png"])
    assert rc == 0
    assert (out / "img_001_rgb.png").exists()
    assert (out / "img_001.npz").exists()
    assert not (out / "img_001.h5").exists()  # deleted by default


def test_image_list_mode(scene_dir, tmp_path):
    out = tmp_path / "o2"
    lst = tmp_path / "list.txt"
    lst.write_text("img_000.png\nimg_002.png\n")
    main(_base_args(scene_dir, out) + ["--image-list", str(lst)])
    assert (out / "img_000.npz").exists()
    assert (out / "img_002.npz").exists()
    assert not (out / "img_001.npz").exists()


def test_image_ids_mode(scene_dir, tmp_path):
    out = tmp_path / "o3"
    # half-open range [2, 4) -> image ids 2, 3 -> img_001, img_002
    main(_base_args(scene_dir, out) + ["--image-ids", "2", "4"])
    assert (out / "img_001.npz").exists()
    assert (out / "img_002.npz").exists()
    assert not (out / "img_003.npz").exists()


def test_filter_images(scene_dir, tmp_path):
    out = tmp_path / "o4"
    filt = tmp_path / "filter.txt"
    filt.write_text("img_000.png\nimg_003.png\n")
    main(
        _base_args(scene_dir, out)
        + ["--image-name", "img_001.png", "--filter-images-path", str(filt),
           "--keep-matches"]
    )
    import h5py

    with h5py.File(out / "img_001.h5", "r") as f:
        names = set(f)
    assert names <= {"img_001.png", "img_002.png"}


def test_save_interval_snapshots(scene_dir, tmp_path):
    out = tmp_path / "o5"
    main(
        _base_args(scene_dir, out)
        + ["--image-name", "img_001.png", "--save-interval", "2"]
    )
    assert (out / "img_001_rgb_0000.png").exists()
    assert (out / "img_001_rgb_0002.png").exists()
    assert (out / "img_001_rgb.png").exists()


def test_mutually_exclusive_targets(scene_dir, tmp_path):
    with pytest.raises(SystemExit):
        build_parser().parse_args(
            _base_args(scene_dir, tmp_path)
            + ["--image-name", "a", "--image-ids", "0", "2"]
        )
    with pytest.raises(SystemExit):
        build_parser().parse_args(_base_args(scene_dir, tmp_path))  # no target


def test_defaults_parity():
    args = build_parser().parse_args(
        ["--image-dir", "a", "--depth-dir", "b", "--model-dir", "c",
         "--output-dir", "d", "--image-name", "x"]
    )
    assert args.min_cover == 0.000001
    assert args.image_scale == 1.0
    assert args.learning_rate == 0.05
    assert args.num_iter == 200
    # --batch-size is a pure memory knob (the gradient is exact full-batch
    # either way); the TPU default is the whole stack in one pass, while
    # the reference defaults to 5 pair-chunks for GPU memory.
    assert args.batch_size is None
    assert args.num_workers == 0


def test_joint_params_mode(scene_dir, tmp_path):
    out = tmp_path / "oj"
    lst = tmp_path / "jlist.txt"
    lst.write_text("img_000.png\nimg_002.png\n")
    main(_base_args(scene_dir, out) + ["--image-list", str(lst), "--joint-params",
                                       "--use-closed-form"])
    a = np.load(out / "img_000.npz")
    b = np.load(out / "img_002.npz")
    np.testing.assert_array_equal(a["B"], b["B"])  # shared globals
    np.testing.assert_array_equal(a["beta"], b["beta"])


def test_joint_params_rejects_multihost(scene_dir, tmp_path, monkeypatch):
    """Multi-host striding + joint would fit one 'shared' model per
    host slice — refused before jax.distributed even initializes."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    with pytest.raises(SystemExit, match="multi-host"):
        main(_base_args(scene_dir, tmp_path / "o") + [
            "--image-ids", "0", "4", "--joint-params",
        ])


def test_joint_params_rejects_mixed_dims(tmp_path):
    """Joint fitting needs one stacked program; mixed-dimension targets
    must exit with a clean message, not restore_survey's raw ValueError
    traceback."""
    sd = make_scene(tmp_path / "mixed", n_views=4, two_cameras=True)
    with pytest.raises(SystemExit, match="dimensions / lens classes"):
        main(_base_args(sd, tmp_path / "o") + [
            "--image-ids", "0", "4", "--joint-params",
        ])


def test_joint_params_spans_batches(scene_dir, tmp_path):
    """--joint-params fits ONE model across ALL targets even when the
    target list exceeds --batch-targets: the CLI folds the whole list
    into a single batch (per-batch models would silently diverge)."""
    out = tmp_path / "ojb"
    lst = tmp_path / "jb.txt"
    lst.write_text("".join(f"img_{i:03d}.png\n" for i in range(4)))
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst), "--joint-params", "--use-closed-form",
        "--batch-targets", "2",
    ])
    assert rc == 0
    ref = np.load(out / "img_000.npz")
    for i in range(1, 4):
        got = np.load(out / f"img_{i:03d}.npz")
        np.testing.assert_array_equal(ref["B"], got["B"])
        np.testing.assert_array_equal(ref["beta"], got["beta"])


def test_profile_dir_and_compile_cache(scene_dir, tmp_path):
    """--profile-dir captures a jax.profiler trace; --compile-cache sets
    the persistent XLA cache directory (both produce files)."""
    prof = tmp_path / "prof"
    cache = tmp_path / "xla_cache"
    rc = main(_base_args(scene_dir, tmp_path / "o") + [
        "--image-name", "img_001.png",
        "--profile-dir", str(prof),
        "--compile-cache", str(cache),
    ])
    assert rc == 0
    assert prof.exists() and any(prof.rglob("*"))  # trace artifacts written
    import jax

    # the flag reached jax's config (cache entries only appear for
    # compiles above the min-time threshold, so assert the wiring)
    assert jax.config.jax_compilation_cache_dir == str(cache)


def test_bilinear_colors_flag(scene_dir, tmp_path):
    """--bilinear-colors runs end to end and changes the restored output
    relative to nearest sampling."""
    rc = main(_base_args(scene_dir, tmp_path / "a") + [
        "--image-name", "img_001.png", "--bilinear-colors", "--keep-matches",
    ])
    assert rc == 0
    rc = main(_base_args(scene_dir, tmp_path / "b") + ["--image-name", "img_001.png"])
    assert rc == 0
    a = np.load(tmp_path / "a" / "img_001.npz")["J"]
    b = np.load(tmp_path / "b" / "img_001.npz")["J"]
    assert not np.allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-6)


def test_params_format_pt(scene_dir, tmp_path):
    """--params-format pt writes reference-layout torch checkpoints."""
    import torch

    out = tmp_path / "o"
    rc = main(_base_args(scene_dir, out) + [
        "--image-name", "img_001.png", "--params-format", "pt",
    ])
    assert rc == 0
    ckpt = torch.load(out / "img_001.pt", weights_only=True)
    assert ckpt["B"].shape == (3, 1)  # reference state-dict layout
    assert ckpt["J"].shape[-1] == 3


def test_shard_mode_batch_equals_none(tmp_path):
    """--shard-mode batch (one target per device across the 8-device CPU
    mesh) must produce artifacts identical to the unsharded run."""
    sd = make_scene(tmp_path / "scene8", n_views=8, width=48, height=32)
    a_out, b_out = tmp_path / "sharded", tmp_path / "plain"
    rc = main(_base_args(sd, a_out) + ["--image-ids", "1", "9",
                                       "--shard-mode", "batch"])
    assert rc == 0
    rc = main(_base_args(sd, b_out) + ["--image-ids", "1", "9",
                                       "--shard-mode", "none"])
    assert rc == 0
    for i in range(8):
        a = np.load(a_out / f"img_{i:03d}.npz")
        b = np.load(b_out / f"img_{i:03d}.npz")
        np.testing.assert_allclose(a["B"], b["B"], atol=1e-5)
        np.testing.assert_allclose(a["beta"], b["beta"], atol=1e-5)
        np.testing.assert_allclose(
            np.nan_to_num(a["J"]), np.nan_to_num(b["J"]), atol=1e-4
        )


def test_shard_mode_view_row_equals_none(scene_dir, tmp_path):
    """--shard-mode view-row shards a single restore's fit over the
    (view x row) mesh; results equal the unsharded restore."""
    a_out, b_out = tmp_path / "sharded", tmp_path / "plain"
    rc = main(_base_args(scene_dir, a_out) + [
        "--image-name", "img_001.png", "--shard-mode", "view-row",
        "--mesh", "2x4",
    ])
    assert rc == 0
    rc = main(_base_args(scene_dir, b_out) + [
        "--image-name", "img_001.png", "--shard-mode", "none",
    ])
    assert rc == 0
    a = np.load(a_out / "img_001.npz")
    b = np.load(b_out / "img_001.npz")
    np.testing.assert_allclose(a["B"], b["B"], atol=1e-5)
    np.testing.assert_allclose(
        np.nan_to_num(a["J"]), np.nan_to_num(b["J"]), atol=1e-4
    )


def test_multihost_two_processes(tmp_path):
    """Two coordinated CLI processes (JAX_COORDINATOR_ADDRESS) split the
    target list stride-wise and together produce the full artifact set —
    the DCN tier: no cross-host communication during restores."""
    import os
    import subprocess
    import sys

    import socket

    sd = make_scene(tmp_path / "scene", n_views=4, width=48, height=32)
    out = tmp_path / "out"
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"img_{i:03d}.png\n" for i in range(4)))
    with socket.socket() as s:  # a free port, not a hardcoded one
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        # This environment's device-tunnel sitecustomize (AXON_*) breaks
        # multi-node CPU client creation; strip it — real multi-host runs
        # don't have it.
        env = {
            k: v
            for k, v in os.environ.items()
            if not k.startswith(("PALLAS_AXON", "AXON"))
        }
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "sucre_tpu",
                 "--image-dir", str(sd.image_dir), "--depth-dir", str(sd.depth_dir),
                 "--model-dir", str(sd.model_dir), "--output-dir", str(out),
                 "--image-list", str(lst), "--num-iter", "2", "--quiet",
                 "--batch-targets", "1", "--shard-mode", "none",
                 "--platform", "cpu"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    # strided split: process 0 restored 0,2; process 1 restored 1,3
    assert "2 targets" in outs[0] and "2 targets" in outs[1]
    for i in range(4):
        assert (out / f"img_{i:03d}.npz").exists()


def test_demo_module(tmp_path, capsys):
    """python -m sucre_tpu.demo end to end: generates a scene, restores
    a target, reports ground-truth comparison and artifacts."""
    from sucre_tpu.demo import main as demo_main

    rc = demo_main([
        "--output-dir", str(tmp_path / "demo"), "--views", "4",
        "--size", "48x32", "--num-iter", "3", "--platform", "cpu",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PSNR of restored J vs analytic ground truth" in out
    assert (tmp_path / "demo" / "restored").is_dir()
    assert list((tmp_path / "demo" / "restored").glob("*_rgb.png"))


def test_report_flag(scene_dir, tmp_path):
    """--report writes a JSON run summary covering every restored target
    (both the batched-survey and the sequential paths)."""
    import json

    out = tmp_path / "out"
    lst = tmp_path / "list.txt"
    lst.write_text("img_001.png\nimg_002.png\n")
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst), "--num-iter", "2", "--quiet", "--report",
    ])
    assert rc == 0
    rep = json.loads((out / "report.json").read_text())
    assert rep["n_targets"] == 2 and len(rep["targets"]) == 2
    t = rep["targets"][0]
    assert t["image"] == "img_001.png" and t["n_obs"] > 0
    assert len(t["beta"]) == 3 and t["artifacts"]
    assert rep["total_obs"] == sum(x["n_obs"] for x in rep["targets"])
    assert t["obs_rmse"] > 0 and t["recon_psnr"] is not None

    # sequential path + explicit report path
    rc = main(_base_args(scene_dir, tmp_path / "out2") + [
        "--image-name", "img_001.png", "--num-iter", "2", "--quiet",
        "--report", str(tmp_path / "r.json"),
    ])
    assert rc == 0
    rep2 = json.loads((tmp_path / "r.json").read_text())
    assert rep2["n_targets"] == 1


def test_report_path_multihost_suffixing(tmp_path, monkeypatch):
    """Under multihost every process writes its own report: '-' resolves
    to report.pN.json and an EXPLICIT path gets the same .pN suffix
    inserted before its extension (a shared explicit path would be
    silently clobbered by all but one process)."""
    import types

    import jax

    from sucre_tpu.cli import _report_path

    args = types.SimpleNamespace(report="-", output_dir=tmp_path)
    assert _report_path(args, multihost=False) == tmp_path / "report.json"

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert _report_path(args, multihost=True) == tmp_path / "report.p1.json"
    args.report = str(tmp_path / "r.json")
    assert _report_path(args, multihost=True) == tmp_path / "r.p1.json"
    # single-process runs keep explicit paths untouched even when the
    # multihost flags are set
    assert _report_path(args, multihost=False) == tmp_path / "r.json"


def test_multihost_two_processes_with_local_mesh(tmp_path):
    """Two-tier parallelism end to end: two coordinated processes split
    the target list (DCN tier), and EACH process shards its restores
    over a (view x row) mesh of its 2 local virtual devices (ICI tier).
    No collective crosses processes; artifacts land in the shared output
    directory."""
    import os
    import socket
    import subprocess
    import sys

    sd = make_scene(tmp_path / "scene", n_views=4, width=48, height=32)
    out = tmp_path / "out"
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"img_{i:03d}.png\n" for i in range(4)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = {
            k: v
            for k, v in os.environ.items()
            if not k.startswith(("PALLAS_AXON", "AXON"))
        }
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "sucre_tpu",
                 "--image-dir", str(sd.image_dir), "--depth-dir", str(sd.depth_dir),
                 "--model-dir", str(sd.model_dir), "--output-dir", str(out),
                 "--image-list", str(lst), "--num-iter", "2", "--quiet",
                 "--batch-targets", "1", "--shard-mode", "view-row",
                 "--platform", "cpu"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    for o in outs:
        assert "2 targets" in o
        assert "Sharding: (view=1 x row=2) mesh per restore." in o
    for i in range(4):
        assert (out / f"img_{i:03d}.npz").exists()


def test_no_culling_flag(scene_dir, tmp_path):
    """--no-culling disables the surface-overlap prepass (strict
    reference pair-set parity); output matches the culled run on a
    fully-overlapping scene."""
    a, b = tmp_path / "a", tmp_path / "b"
    for out, extra in ((a, []), (b, ["--no-culling"])):
        rc = main(_base_args(scene_dir, out) + [
            "--image-name", "img_001.png", "--num-iter", "2", "--quiet",
        ] + extra)
        assert rc == 0
    ja = np.load(a / "img_001.npz")["J"]
    jb = np.load(b / "img_001.npz")["J"]
    np.testing.assert_allclose(np.nan_to_num(ja), np.nan_to_num(jb), atol=1e-6)


def test_compile_cache_empty_disables(tmp_path):
    """--compile-cache '' must disable the persistent cache, not point it
    at the current directory."""
    args = build_parser().parse_args([
        "--image-dir", "x", "--depth-dir", "x", "--model-dir", "x",
        "--output-dir", "x", "--image-name", "x", "--compile-cache", "",
    ])
    assert not args.compile_cache


def test_top_level_api_exports():
    """The documented `from sucre_tpu import ...` surface resolves."""
    import sucre_tpu

    for name in sucre_tpu.__all__:
        assert getattr(sucre_tpu, name) is not None
    with pytest.raises(AttributeError):
        sucre_tpu.not_a_symbol


def test_skip_existing_resumes_survey(scene_dir, tmp_path, capsys):
    """--skip-existing resumes an interrupted survey at target
    granularity: already-checkpointed targets are not re-restored."""
    out = tmp_path / "o"
    lst2 = tmp_path / "two.txt"
    lst2.write_text("img_000.png\nimg_001.png\n")
    assert main(_base_args(scene_dir, out) + ["--image-list", str(lst2)]) == 0
    mtimes = {n: (out / f"img_{n:03d}.npz").stat().st_mtime_ns for n in (0, 1)}

    lst4 = tmp_path / "four.txt"
    lst4.write_text("".join(f"img_{i:03d}.png\n" for i in range(4)))
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst4), "--skip-existing",
    ])
    assert rc == 0
    assert "Skip 2 already-restored targets" in capsys.readouterr().out
    for n in (0, 1):  # untouched
        assert (out / f"img_{n:03d}.npz").stat().st_mtime_ns == mtimes[n]
    for n in (2, 3):  # newly restored
        assert (out / f"img_{n:03d}.npz").exists()

    # everything done -> clean no-op exit; --report still overwrites any
    # stale report instead of leaving the previous run's file in place
    import json

    (out / "report.json").write_text('{"n_targets": 99}')
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst4), "--skip-existing", "--report",
    ])
    assert rc == 0
    assert "Nothing to do" in capsys.readouterr().out
    rep = json.loads((out / "report.json").read_text())
    assert rep["n_targets"] == 0 and rep["targets"] == []


def test_failed_target_exit_code_and_report(tmp_path, capsys):
    """A zero-observation target doesn't kill the run: the others
    restore, the failure lands in the report + FAILED summary, and the
    CLI exits 1 — on BOTH the batched and sequential paths."""
    import json

    import cv2

    sd = make_scene(tmp_path / "s", n_views=4, width=48, height=32)
    cv2.imwrite(str(sd.depth_dir / "depth_img_001.png"),
                np.zeros((32, 48), np.uint16))
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"img_{i:03d}.png\n" for i in range(4)))

    out = tmp_path / "o"
    rc = main(_base_args(sd, out) + ["--image-list", str(lst), "--report"])
    assert rc == 1
    assert "FAILED (1/4" in capsys.readouterr().out
    rep = json.loads((out / "report.json").read_text())
    assert rep["failed_targets"] == ["img_001.png"]
    assert rep["n_targets"] == 3
    assert (out / "img_002.npz").exists() and not (out / "img_001.npz").exists()

    # sequential path (batch-targets 1): per-target error, run continues
    out2 = tmp_path / "o2"
    rc = main(_base_args(sd, out2) + ["--image-list", str(lst),
                                      "--batch-targets", "1", "--report"])
    assert rc == 1
    assert "No observations" in capsys.readouterr().out
    rep = json.loads((out2 / "report.json").read_text())
    assert rep["failed_targets"] == ["img_001.png"]
    assert (out2 / "img_003.npz").exists()


def test_skip_existing_nested_names(tmp_path, capsys):
    """--skip-existing probes the checkpoint path of NESTED image names
    ('cam0/img.png' -> out/cam0/img.npz), not a flattened basename."""
    import dataclasses
    import shutil

    from sucre_tpu.io import colmap as cio

    sd = make_scene(tmp_path / "s", n_views=3, width=48, height=32)
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

    out = tmp_path / "o"
    lst = tmp_path / "list.txt"
    lst.write_text("cam0/img_001.png\ncam0/img_002.png\n")
    assert main(_base_args(sd, out) + ["--image-list", str(lst)]) == 0
    assert (out / "cam0" / "img_001.npz").exists()

    rc = main(_base_args(sd, out) + ["--image-list", str(lst), "--skip-existing"])
    assert rc == 0
    assert "Nothing to do" in capsys.readouterr().out


def test_artifacts_renders_flag(scene_dir, tmp_path, capsys):
    """--artifacts renders writes only PNGs and --skip-existing uses the
    reconstruction PNG as the completion marker."""
    out = tmp_path / "r"
    lst = tmp_path / "two.txt"
    lst.write_text("img_000.png\nimg_001.png\n")
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst), "--artifacts", "renders",
    ])
    assert rc == 0
    for n in (0, 1):
        assert (out / f"img_{n:03d}_rgb.png").exists()
        assert (out / f"img_{n:03d}_reconstruction.png").exists()
        assert not (out / f"img_{n:03d}.npz").exists()
    capsys.readouterr()
    rc = main(_base_args(scene_dir, out) + [
        "--image-list", str(lst), "--artifacts", "renders",
        "--skip-existing",
    ])
    assert rc == 0
    assert "Nothing to do" in capsys.readouterr().out


def test_validate_pod_script(tmp_path):
    """scripts/validate_pod.py --virtual runs every correctness/HLO
    check green in a subprocess (its own virtual platform)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "XLA_FLAGS", "JAX_PLATFORMS"))
    }
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "validate_pod.py"),
         "--virtual", "4", "--skip-bench"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["ok"] and rep["devices"] == 4
    assert rep["matching_communication_free_hlo"]["ok"]
    assert rep["fit_row_mesh_zero_bytes_hlo"]["ok"]
