"""Config-5 partial-overlap probe (VERDICT r4 #7): 4K TRANSECT on the chip.

Round 3 measured config 5 only at 8-view all-overlap (5.2 Mpix/s). This
runs the 4K shape on the same honest spread-transect geometry as the
544x960 bench (terrain-following cameras, targets keep a local
neighborhood) so the north-star table's 4K row rests on culled
partial-overlap routing like the small-shape rows: scene of
PROBE_VIEWS (12) 3840x2160 views at spread=PROBE_SPREAD (20),
PROBE_TARGETS (2) targets mid-transect, PROBE_ITERS (50) Adam
iterations, device wall (dispatch -> scalar sync), inputs perturbed per
rep. Usage: python scripts/probe_4k_transect_r5.py
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
    W = int(os.environ.get("PROBE_W", 3840))
    H = int(os.environ.get("PROBE_H", 2160))
    V = int(os.environ.get("PROBE_VIEWS", 12))
    T = int(os.environ.get("PROBE_TARGETS", 2))
    ITERS = int(os.environ.get("PROBE_ITERS", 50))
    REPS = int(os.environ.get("PROBE_REPS", 3))
    SPREAD = float(os.environ.get("PROBE_SPREAD", 20.0))

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

    tmp = Path(tempfile.mkdtemp(prefix="probe_4kt_"))
    t0 = time.perf_counter()
    sd = make_scene(tmp, n_views=V, width=W, height=H, spread=SPREAD)
    log(f"scene gen: {V} views {W}x{H} spread={SPREAD} "
        f"in {time.perf_counter() - t0:.1f}s")
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

    # mid-transect targets (full local neighborhoods)
    idx = [int((i + 0.5) * V / T) for i in range(T)]
    names = [sd.names[min(i, V - 1)] for i in idx]
    routing = []
    bf = dispatch_survey_batch(
        scene, list(names), Path(tempfile.mkdtemp()), cfg,
        scene.view_list(), cache, dv, log=lambda s: routing.append(s),
    )
    float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
    for s in routing:
        log(f"  route: {s}")

    walls = []
    for rep in range(REPS):
        perturb(rep + 1)
        t0 = time.perf_counter()
        bf = dispatch_survey_batch(
            scene, list(names), Path(tempfile.mkdtemp()), cfg,
            scene.view_list(), cache, dv,
        )
        float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
        walls.append(time.perf_counter() - t0)
        log(f"rep {rep}: {walls[-1]:.2f}s")
    best = min(walls[1:]) if len(walls) > 1 else walls[0]
    out = {
        "shape": f"{T}x{V}x{H}x{W}@{ITERS}it spread={SPREAD}",
        "routing": "; ".join(routing),
        "best_s": round(best, 2),
        "mpix_s": round(T * W * H / best / 1e6, 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
