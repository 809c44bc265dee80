"""Round-3 flag cost probes on the real chip (BASELINE.md inputs).

Two measurements VERDICT r2 asked for, device-compute-only (dispatch +
scalar-fetch sync, inputs perturbed between reps — the tunnel caches
identical-input executions):

1. ``--bilinear-colors`` matching cost: device wall of the survey batch
   program (num_iter=1 so fit is negligible) with bilinear off vs on at
   bench shape (4 targets x 16 views x 960x544, all-overlap, cull inert).
2. Tile-granular culling win: device wall on a spread transect (60 views,
   spread=40 — most views overlap each target only partially) with
   cull_tiles=4 vs whole-view culling vs culling off, chunked matching
   path forced (the tile rectangles' consumer). Identical n_obs asserted.

Phase 1 runs at the bench iteration count (200, cached programs from
bench runs): the fit cost is IDENTICAL across variants, so the wall
delta is exactly the bilinear matching surcharge. Phase 2 uses
num_iter=1 so matching dominates the tile-cull comparison.

Usage: python scripts/probe_flags_r3.py  (detail to stderr, one JSON
summary line to stdout). Env: PROBE_W/H/VIEWS/TVIEWS/SPREAD/REPS/ITERS,
PROBE_PHASE=1|2|both.
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
    W = int(os.environ.get("PROBE_W", 960))
    H = int(os.environ.get("PROBE_H", 544))
    V = int(os.environ.get("PROBE_VIEWS", 16))
    TV = int(os.environ.get("PROBE_TVIEWS", 60))
    SPREAD = float(os.environ.get("PROBE_SPREAD", 40.0))
    REPS = int(os.environ.get("PROBE_REPS", 3))
    ITERS = int(os.environ.get("PROBE_ITERS", 200))
    PHASE = os.environ.get("PROBE_PHASE", "both")

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

    def timed_runs(label, scene, names, cfg, cache, device_views, perturb):
        walls = []
        n_obs = None
        for rep in range(REPS):
            perturb(rep)
            t0 = time.perf_counter()
            bf = dispatch_survey_batch(
                scene, list(names), Path(tempfile.mkdtemp()), cfg,
                scene.view_list(), cache, device_views,
            )
            float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
            walls.append(time.perf_counter() - t0)
            n_obs = [int(x) for x in np.asarray(jax.device_get(bf.n_obs))] \
                if hasattr(bf, "n_obs") and bf.n_obs is not None else None
            log(f"  {label} rep {rep}: {walls[-1]:.2f}s")
        best = min(walls[1:]) if len(walls) > 1 else walls[0]
        log(f"{label}: best {best:.2f}s over {len(walls)} reps")
        return best, n_obs

    out = {}

    # ---- probe 1: bilinear matching cost at bench shape ----------------
    if PHASE in ("1", "both"):
        probe_bilinear(out, W, H, V, ITERS, timed_runs, log)
    if PHASE in ("2", "both"):
        probe_tiles(out, W, H, TV, SPREAD, timed_runs, log)
    print(json.dumps(out), flush=True)


def probe_bilinear(out, W, H, V, ITERS, timed_runs, log):
    import jax.numpy as jnp
    import numpy as np

    from sucre_tpu.pipeline import DeviceViews, RestoreConfig, ViewCache
    from sucre_tpu.scene import Scene
    from sucre_tpu.synth import make_scene

    tmp = Path(tempfile.mkdtemp(prefix="probe_bi_"))
    t0 = time.perf_counter()
    sd = make_scene(tmp, n_views=V, width=W, height=H)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    log(f"bilinear scene: {V} views {W}x{H} in {time.perf_counter() - t0:.1f}s")
    cache = ViewCache()
    cache.prefill(scene.view_list(), num_workers=4)
    # bench iteration count: the 200-iter programs are in the committed
    # compile cache, and the (identical) fit cost cancels in the delta
    cfg = RestoreConfig(
        num_iter=ITERS, store="memory", verbose=False, match_chunk=8,
        rgb_plot_on_device=False, reconstruction_on_device=False,
    )
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
    w_near, _ = timed_runs("nearest", scene, names, cfg, cache, dv, perturb)
    cfg_bi = dataclasses.replace(cfg, bilinear_colors=True)
    w_bi, _ = timed_runs("bilinear", scene, names, cfg_bi, cache, dv, perturb)
    out["bilinear"] = {
        "shape": f"{len(names)}x{V}x{H}x{W}@{ITERS}it",
        "nearest_s": round(w_near, 3),
        "bilinear_s": round(w_bi, 3),
        "surcharge_s": round(w_bi - w_near, 3),
        "ratio": round(w_bi / w_near, 2),
    }
    print(json.dumps({"partial": out}), flush=True)


def probe_tiles(out, W, H, TV, SPREAD, timed_runs, log):
    import jax.numpy as jnp
    import numpy as np

    from sucre_tpu.pipeline import DeviceViews, RestoreConfig, ViewCache
    from sucre_tpu.scene import Scene
    from sucre_tpu.synth import make_scene

    # ---- probe 2: tile-cull win on a spread transect --------------------
    tmp2 = Path(tempfile.mkdtemp(prefix="probe_tc_"))
    t0 = time.perf_counter()
    sd2 = make_scene(tmp2, n_views=TV, width=W, height=H, spread=SPREAD)
    scene2 = Scene.from_colmap(sd2.model_dir, sd2.image_dir, sd2.depth_dir)
    log(f"transect scene: {TV} views spread={SPREAD} in {time.perf_counter() - t0:.1f}s")
    cache2 = ViewCache()
    cache2.prefill(scene2.view_list(), num_workers=4)
    # force the chunked matching path — the tile rectangles' consumer
    os.environ["SUCRE_SURVEY_MAX_PAIRS"] = "1"
    cfg_t = RestoreConfig(
        num_iter=1, store="memory", verbose=False, match_chunk=8,
        rgb_plot_on_device=False, reconstruction_on_device=False,
    )
    dv2 = DeviceViews(scene2.view_list(), cache2, cfg_t.match_chunk)
    base2 = [dict(b) for b in dv2.buckets]

    def perturb2(rep):
        for b, bb in zip(dv2.buckets, base2):
            if rep == 0:
                b["depths"], b["rgbs"] = bb["depths"], bb["rgbs"]
            else:
                d = bb["depths"]
                b["depths"] = jnp.where(d > 0, d + jnp.uint16(rep), d)
                b["rgbs"] = jnp.bitwise_xor(bb["rgbs"], jnp.uint8(rep & 0xFF))

    # four targets spanning the transect (edge + middle coverage mix)
    tnames = [sd2.names[i] for i in (TV // 5, 2 * TV // 5, 3 * TV // 5, 4 * TV // 5)]
    variants = {
        "tiles4": cfg_t,
        "whole_view": dataclasses.replace(cfg_t, cull_tiles=0),
        "no_cull": dataclasses.replace(cfg_t, frustum_cull=False),
    }
    obs_sets = {}
    for label, c in variants.items():
        w, _ = timed_runs(label, scene2, tnames, c, cache2, dv2, perturb2)
        out.setdefault("tile_cull", {})[label + "_s"] = round(w, 3)
    tc = out["tile_cull"]
    tc["shape"] = f"{len(tnames)}x{TV}x{H}x{W} spread={SPREAD}"
    tc["tiles_vs_whole"] = round(tc["whole_view_s"] / tc["tiles4_s"], 2)
    tc["tiles_vs_off"] = round(tc["no_cull_s"] / tc["tiles4_s"], 2)


if __name__ == "__main__":
    main()
