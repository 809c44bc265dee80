"""Round-4 chip probes: --stop-tol cost/benefit + device Mpix/s vs
effective view count (the north-star accounting inputs, VERDICT r3
items 1-2).

Phase 1 (stoptol): device-compute wall of the bench-shape survey
(12 x 960x544 targets, 16 views, batches of 4, 200-iter cap) with
stop_tol off vs on (0.05 / check 25), plus the per-target iteration
counts the early stop actually ran. Quality leg: the same comparison on
a small scene with analytic ground truth — PSNR of the restored J vs
the true texture, full-200 vs early-stopped.

Phase 2 (veff): device-compute-only throughput of the same workload at
V = 4 / 8 / 16 all-overlap views — the "device Mpix/s vs effective view
count" curve BASELINE.md's north-star arithmetic composes with the
HLO-verified communication model.

Usage: python scripts/probe_stoptol_r4.py   (detail to stderr, one JSON
line to stdout). Env: PROBE_PHASE=1|2|both, PROBE_REPS (3),
PROBE_PLATFORM to force a backend.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    REPS = int(os.environ.get("PROBE_REPS", 3))
    PHASE = os.environ.get("PROBE_PHASE", "both")

    import jax

    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from bench import Workload, run_phase

    out: dict = {}

    if PHASE == "quality":
        print(json.dumps({"stoptol_quality": _quality_leg()}), flush=True)
        return

    if PHASE in ("1", "both"):
        wl = Workload("stoptol", 16, 960, 544, 12, 4, 200)
        best_off, _ = run_phase(
            "stop_off", lambda rep: wl.run_device_only(wl.tmp / "a"),
            wl.perturb, reps=REPS + 1, min_meas=REPS, budget_s=1e9, pbase=0,
        )
        cfg_on = dc.replace(wl.cfg, stop_tol=0.05, stop_check=25)
        best_on, _ = run_phase(
            "stop_on", lambda rep: wl.run_device_only(wl.tmp / "b", cfg_on),
            wl.perturb, reps=REPS + 1, min_meas=REPS, budget_s=1e9, pbase=64,
        )
        # iterations the early stop actually ran (one representative batch)
        import numpy as np

        from sucre_tpu.pipeline import dispatch_survey_batch

        cfg_dev = dc.replace(
            cfg_on, rgb_plot_on_device=False, reconstruction_on_device=False
        )
        bf = dispatch_survey_batch(
            wl.scene, list(wl.targets[:4]), wl.tmp / "c", cfg_dev,
            wl.scene.view_list(), wl.cache, wl.device_views,
        )
        iters = int(np.asarray(bf.tel_dev.cost).shape[0])
        out["stoptol_device"] = {
            "shape": "12x16x544x960@200cap b4",
            "off_s": round(best_off, 3),
            "on_s": round(best_on, 3),
            "speedup": round(best_off / best_on, 3),
            "iters_at_stop": iters,
            "mpix_s_off": round(wl.mpix / best_off, 3),
            "mpix_s_on": round(wl.mpix / best_on, 3),
        }
        print(json.dumps({"partial": out}), flush=True)

        # quality leg: analytic ground truth on a small scene
        out["stoptol_quality"] = _quality_leg()
        print(json.dumps({"partial": out}), flush=True)

    if PHASE in ("2", "both"):
        veff = {}
        for V in (4, 8, 16):
            wl = Workload(f"v{V}", V, 960, 544, 4, 4, 200)
            best, _ = run_phase(
                f"veff{V}", lambda rep: wl.run_device_only(wl.tmp / "d"),
                wl.perturb, reps=REPS + 1, min_meas=REPS, budget_s=1e9,
                pbase=0,
            )
            veff[str(V)] = {
                "device_s": round(best, 3),
                "mpix_s": round(wl.mpix / best, 3),
            }
            log(f"V={V}: {best:.3f}s = {wl.mpix / best:.3f} Mpix/s")
        out["veff"] = veff

    print(json.dumps(out), flush=True)


def _quality_leg() -> dict:
    """PSNR vs analytic ground truth, full-200 vs early-stopped, at a
    shape where the stop actually fires (the bench scene's view count /
    dims by default — the small-scene fit never stalls within 200)."""
    import numpy as np

    from sucre_tpu.pipeline import RestoreConfig, restore_survey
    from sucre_tpu.scene import Scene
    from sucre_tpu.synth import make_scene
    from sucre_tpu.utils.metrics import psnr

    tmp = Path(tempfile.mkdtemp(prefix="probe_stq_"))
    qv = int(os.environ.get("PROBE_QUALITY_VIEWS", 16))
    qw = int(os.environ.get("PROBE_QUALITY_W", 960))
    qh = int(os.environ.get("PROBE_QUALITY_H", 544))
    sd = make_scene(tmp, n_views=qv, width=qw, height=qh)
    if os.environ.get("PROBE_QUALITY_NOISE") == "1":
        # +-1 LSB sensor-noise floor on the rendered images: noiseless
        # analytic renders keep improving >tol forever (the fit polishes
        # the exact model indefinitely), so the early stop never fires on
        # them; real images carry quantization/sensor noise that stalls
        # the cost — this reproduces that regime while keeping the
        # analytic ground truth valid.
        import cv2

        rngn = np.random.default_rng(7)
        for name in sd.names:
            p = sd.image_dir / name
            im = cv2.imread(str(p), cv2.IMREAD_UNCHANGED).astype(np.int16)
            im += rngn.integers(-1, 2, size=im.shape, dtype=np.int16)
            cv2.imwrite(str(p), np.clip(im, 0, 255).astype(np.uint8))
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = sd.names[:4]
    base = RestoreConfig(num_iter=200, store="memory", verbose=False)
    tols = [
        float(t) for t in
        os.environ.get("PROBE_QUALITY_TOLS", "0.05").split(",")
    ]
    variants = {"full200": base}
    for t in tols:
        variants[f"stop{t}"] = dc.replace(base, stop_tol=t, stop_check=25)
    q: dict = {}
    for label, cfg in variants.items():
        res = restore_survey(scene, names, tmp / label, cfg, batch_targets=4)
        psnrs, iters = [], []
        for r in res:
            ji = sd.names.index(r.image_name)
            truth = sd.J_views[ji].astype(np.float32)
            J = np.nan_to_num(np.asarray(r.J, np.float32))
            psnrs.append(psnr(J, truth, mask=r.valid))
            iters.append(int(np.asarray(r.telemetry.cost).shape[0]))
        q[label] = {
            "psnr_mean_db": round(float(np.mean(psnrs)), 3),
            "iters": iters,
        }
    for t in tols:
        q[f"stop{t}"]["psnr_delta_db"] = round(
            q[f"stop{t}"]["psnr_mean_db"] - q["full200"]["psnr_mean_db"], 3
        )
    return q


if __name__ == "__main__":
    main()
