"""Distorted-matching cost probe on the real chip (BASELINE.md input).

Design claim to verify: the inline iterative undistortion (rational
fixed-point x30 / fisheye Newton x15, pure elementwise VPU work) hides
behind the gather-engine-bound matching stage, so distorted matching
costs ~nothing over pinhole at the same shapes (ops/distortion.py,
ARCHITECTURE.md "Native lens distortion").

Method: three synthetic scenes at the bench shape (4 targets x V views x
H x W, all-overlap), identical except the camera model (PINHOLE /
OPENCV / OPENCV_FISHEYE). Device wall of the survey batch program at
num_iter=1 (matching dominates), best of REPS perturbed reps (the
tunnel caches identical-input executions).

Usage: python scripts/probe_distortion_r3.py   (detail to stderr, one
JSON line to stdout). Env: PROBE_W/H/VIEWS/REPS, PROBE_PLATFORM.
"""

from __future__ import annotations

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
    W = int(os.environ.get("PROBE_W", 960))
    H = int(os.environ.get("PROBE_H", 544))
    V = int(os.environ.get("PROBE_VIEWS", 16))
    REPS = int(os.environ.get("PROBE_REPS", 3))

    import jax

    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    import jax.numpy as jnp
    import numpy as np

    from sucre_tpu.pipeline import (
        DeviceViews,
        RestoreConfig,
        ViewCache,
        dispatch_survey_batch,
    )
    from sucre_tpu.scene import Scene
    from sucre_tpu.synth import make_scene

    cfg = RestoreConfig(
        num_iter=1, store="memory", verbose=False, match_chunk=8,
        rgb_plot_on_device=False, reconstruction_on_device=False,
    )

    models = os.environ.get("PROBE_MODELS", "PINHOLE,OPENCV,OPENCV_FISHEYE").split(",")
    out = {}
    for model in models:
        tmp = Path(tempfile.mkdtemp(prefix=f"probe_dist_{model}_"))
        t0 = time.perf_counter()
        sd = make_scene(tmp, n_views=V, width=W, height=H, camera_model=model)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        log(f"{model}: scene {V}x{H}x{W} in {time.perf_counter() - t0:.1f}s")
        cache = ViewCache()
        cache.prefill(scene.view_list(), num_workers=4)
        dv = DeviceViews(scene.view_list(), cache, cfg.match_chunk)
        base = [dict(b) for b in dv.buckets]

        def perturb(rep):
            for b, bb in zip(dv.buckets, base):
                if rep == 0:
                    b["depths"], b["rgbs"] = bb["depths"], bb["rgbs"]
                else:
                    d = bb["depths"]
                    b["depths"] = jnp.where(d > 0, d + jnp.uint16(rep), d)
                    b["rgbs"] = jnp.bitwise_xor(bb["rgbs"], jnp.uint8(rep & 0xFF))

        names = sd.names[:4]
        walls, n_obs = [], 0
        for rep in range(REPS):
            perturb(rep)
            t0 = time.perf_counter()
            bf = dispatch_survey_batch(
                scene, list(names), Path(tempfile.mkdtemp()), cfg,
                scene.view_list(), cache, dv,
            )
            float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
            walls.append(time.perf_counter() - t0)
            n_obs = int(np.sum(np.asarray(jax.device_get(bf.n_obs_dev))))
            log(f"  {model} rep {rep}: {walls[-1]:.2f}s (n_obs {n_obs})")
        best = min(walls[1:]) if len(walls) > 1 else walls[0]
        out[model] = {"best_s": round(best, 3), "n_obs": n_obs}
        log(f"{model}: best {best:.2f}s")

    out["shape"] = f"4x{V}x{H}x{W}@1it"
    if "PINHOLE" in out:
        for m in models:
            if m != "PINHOLE" and m in out:
                out[f"{m.lower()}_vs_pinhole"] = round(
                    out[m]["best_s"] / out["PINHOLE"]["best_s"], 3
                )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
