"""Config-5 scale probe on the real chip: 4K survey, direct + joint.

BASELINE.json's stretch config: "4K multi-dive survey with joint global
beta_D/beta_B/B_inf estimation". This measures the device-compute wall
(dispatch -> scalar sync, inputs perturbed per rep — the tunnel caches
identical-input executions) of the full survey batch program at
3840x2160, per-image fits vs one shared water model (--joint-params),
and records peak workload facts (pixel-pairs, observations).

Usage: python scripts/probe_4k_r3.py   (detail to stderr, one JSON line
to stdout). Env: PROBE_W/H (3840x2160), PROBE_VIEWS (8), PROBE_TARGETS
(2), PROBE_ITERS (50), PROBE_REPS (3), PROBE_PLATFORM.
"""

from __future__ import annotations

import dataclasses
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
    W = int(os.environ.get("PROBE_W", 3840))
    H = int(os.environ.get("PROBE_H", 2160))
    V = int(os.environ.get("PROBE_VIEWS", 8))
    T = int(os.environ.get("PROBE_TARGETS", 2))
    ITERS = int(os.environ.get("PROBE_ITERS", 50))
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

    tmp = Path(tempfile.mkdtemp(prefix="probe_4k_"))
    t0 = time.perf_counter()
    sd = make_scene(tmp, n_views=V, width=W, height=H)
    log(f"scene gen: {V} views {W}x{H} in {time.perf_counter() - t0:.1f}s")
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    cache = ViewCache()
    t0 = time.perf_counter()
    cache.prefill(scene.view_list(), num_workers=4)
    log(f"decode: {time.perf_counter() - t0:.1f}s")

    cfg = RestoreConfig(
        num_iter=ITERS, store="memory", verbose=False, match_chunk=4,
        rgb_plot_on_device=False, reconstruction_on_device=False,
    )
    t0 = time.perf_counter()
    dv = DeviceViews(scene.view_list(), cache, cfg.match_chunk)
    log(f"device upload: {time.perf_counter() - t0:.1f}s "
        f"({V} x {W}x{H} x 5 B = {V * W * H * 5 / 1e9:.2f} GB)")
    base = [dict(b) for b in dv.buckets]

    def perturb(rep):
        for b, bb in zip(dv.buckets, base):
            if rep == 0:
                b["depths"], b["rgbs"] = bb["depths"], bb["rgbs"]
            else:
                d = bb["depths"]
                b["depths"] = jnp.where(d > 0, d + jnp.uint16(rep), d)
                b["rgbs"] = jnp.bitwise_xor(bb["rgbs"], jnp.uint8(rep & 0xFF))

    names = sd.names[:T]
    out = {
        "shape": f"{T}x{V}x{H}x{W}@{ITERS}it",
        "pixel_pairs_m": round(T * V * W * H / 1e6, 1),
    }

    def timed(label, c):
        walls, n_obs = [], None
        for rep in range(REPS):
            perturb(rep)
            t0 = time.perf_counter()
            bf = dispatch_survey_batch(
                scene, list(names), Path(tempfile.mkdtemp()), c,
                scene.view_list(), cache, dv,
            )
            float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
            walls.append(time.perf_counter() - t0)
            log(f"  {label} rep {rep}: {walls[-1]:.2f}s")
        best = min(walls[1:]) if len(walls) > 1 else walls[0]
        log(f"{label}: best {best:.2f}s")
        return best

    w_direct = timed("direct", cfg)
    out["direct_s"] = round(w_direct, 2)
    out["direct_mpix_s"] = round(T * W * H / w_direct / 1e6, 2)

    w_joint = timed("joint", dataclasses.replace(cfg, joint_params=True))
    out["joint_s"] = round(w_joint, 2)
    out["joint_vs_direct"] = round(w_joint / w_direct, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
