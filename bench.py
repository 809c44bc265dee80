"""End-to-end restoration benchmark.

Measures steady-state end-to-end throughput (decode + match + fit +
export) restoring a synthetic survey via the pipelined restore_survey
driver (BENCH_TARGETS targets in batches of BENCH_BATCH), on whatever
platform JAX selects (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "restore_throughput", "value": <Mpix/s>, "unit": "Mpix/s",
   "vs_baseline": <value / 50.0>, "device_mpix_s": <Mpix/s>,
   "value_f16": <Mpix/s>}

``value_f16`` is the same end-to-end run with export_dtype="f16" (the
documented transfer trade: half the J fetch bytes on link-bound hosts,
~5e-4 relative rounding in the npz checkpoint).

The baseline denominator is the driver-set north star from BASELINE.json
(>= 50 Mpix/s on a v5e-8 slice); this harness runs on a single chip, so
vs_baseline ~ 0.125 equals the per-chip north-star share.
``device_mpix_s`` is the device-compute-only throughput (dispatch ->
device-sync, no bulk device->host transfer, no artifact export): the
number that transfers-free hosts approach, and the one to regress
against when the link quality varies run to run.

Validity: the device tunnel in this environment caches executions with
identical input buffers, so every rep perturbs the view stack (depth
+1 mm * rep, RGB LSB xor) — same workload shape, different buffer
contents — to force real executions.

Detail goes to stderr (the per-stage marks are the FIRST batch's:
*_dispatch are host async-dispatch times; fetch_render/export are that
batch's blocking transfer and artifact-write walls). Configuration via
env: BENCH_VIEWS (default 16), BENCH_W (960), BENCH_H (544),
  BENCH_TARGETS (12), BENCH_BATCH (4), BENCH_ITERS (200),
  BENCH_REPS (6), BENCH_DEV_REPS (3), BENCH_BUDGET_S (480).
The scene is generated with max(BENCH_VIEWS, BENCH_TARGETS) views
(targets are themselves survey views).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    V = int(os.environ.get("BENCH_VIEWS", 16))
    W = int(os.environ.get("BENCH_W", 960))
    H = int(os.environ.get("BENCH_H", 544))
    T = int(os.environ.get("BENCH_TARGETS", 12))
    B = int(os.environ.get("BENCH_BATCH", 4))
    ITERS = int(os.environ.get("BENCH_ITERS", 200))

    import jax

    # JAX_PLATFORMS is preset (and jax pre-imported) in this environment;
    # BENCH_PLATFORM=cpu forces the CPU backend for harness smoke tests.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # Persistent compile cache: first-ever compile of the big programs can
    # take minutes (remote-compile environments); cached binaries make
    # subsequent benchmark runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log(f"devices: {jax.devices()}")

    from sucre_tpu.pipeline import DeviceViews, RestoreConfig, ViewCache, restore_survey
    from sucre_tpu.scene import Scene
    from sucre_tpu.synth import make_scene

    tmp = Path(tempfile.mkdtemp(prefix="sucre_bench_"))
    t0 = time.perf_counter()
    sd = make_scene(tmp, n_views=max(V, T), width=W, height=H)
    log(f"scene gen: {time.perf_counter() - t0:.2f}s ({max(V, T)} views {W}x{H})")

    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    targets = sd.names[:T]
    cfg = RestoreConfig(
        num_iter=ITERS, store="memory", verbose=False, num_workers=4, match_chunk=8
    )

    t0 = time.perf_counter()
    cache = ViewCache()
    cache.prefill(scene.view_list(), num_workers=4)
    log(f"decode (cached once): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    device_views = DeviceViews(scene.view_list(), cache, cfg.match_chunk)
    log(f"device view stack upload (once): {time.perf_counter() - t0:.2f}s")

    import jax.numpy as jnp
    import numpy as np

    base_buckets = [dict(b) for b in device_views.buckets]

    def perturb(rep: int) -> None:
        """Give every rep distinct input buffer CONTENTS (the tunnel
        caches executions of identical inputs): shift valid depths by
        rep millimeters and flip RGB low bits — same workload, real
        executions. rep 0 = the pristine stack."""
        for b, bb in zip(device_views.buckets, base_buckets):
            if rep == 0:
                b["depths"], b["rgbs"] = bb["depths"], bb["rgbs"]
            else:
                d = bb["depths"]
                b["depths"] = jnp.where(d > 0, d + jnp.uint16(rep), d)
                b["rgbs"] = jnp.bitwise_xor(bb["rgbs"], jnp.uint8(rep & 0xFF))

    # Timed steady-state runs: full end-to-end (matching + fit + export)
    # with the decode cache warm (surveys decode each view once). Rep 0
    # doubles as compile/first-execution warmup; the reported value is the
    # best rep (this environment's device link stalls nondeterministically
    # on first executions, and run-to-run variance is high). Reps continue
    # until the count or the time budget is exhausted — at least 2 so one
    # post-warmup measurement always exists.
    reps = int(os.environ.get("BENCH_REPS", 6))
    budget = float(os.environ.get("BENCH_BUDGET_S", 480))
    bench_start = time.perf_counter()
    walls = []
    for rep in range(reps):
        perturb(rep)
        t0 = time.perf_counter()
        results = restore_survey(
            scene, targets, tmp / f"out{rep}", cfg, batch_targets=B,
            cache=cache, device_views=device_views,
        )
        walls.append(time.perf_counter() - t0)
        stages = " ".join(f"{k}={v:.2f}s" for k, v in results[0].timings.items())
        log(
            f"rep {rep}: restored {T} x {W}x{H} (batches of {B}, pipelined) "
            f"in {walls[-1]:.2f}s ({stages}), n_obs[0]={results[0].n_obs}"
        )
        if rep >= 1 and time.perf_counter() - bench_start > budget:
            break
    wall = min(walls[1:]) if len(walls) > 1 else walls[0]

    import dataclasses as _dc

    # f16-export phase: the documented J-fetch trade, measured (same
    # device work; the fetch dtype halves — the win shows on
    # transfer-bound links). 2 reps: warmup (one new compiled export
    # cast) + one measurement.
    f16_reps = int(os.environ.get("BENCH_F16_REPS", 2))
    cfg_f16 = _dc.replace(cfg, export_dtype="f16")
    fwalls = []
    for rep in range(f16_reps):
        # perturb indices the e2e phase (0..reps-1) and the device phase
        # (reps+1..) never touch: reusing an already-seen index recreates
        # byte-identical device inputs and the tunnel serves the
        # matching/fit executions from its cache, overstating value_f16.
        perturb(64 + rep)
        t0 = time.perf_counter()
        restore_survey(
            scene, targets, tmp / f"f16out{rep}", cfg_f16, batch_targets=B,
            cache=cache, device_views=device_views,
        )
        fwalls.append(time.perf_counter() - t0)
        log(f"f16 rep {rep}: {fwalls[-1]:.2f}s")
        if time.perf_counter() - bench_start > budget + 60:
            break
    fwall = min(fwalls[1:]) if len(fwalls) > 1 else fwalls[0]

    # Device-compute-only phase: dispatch the full match+fit pipeline per
    # batch and sync with a tiny scalar fetch (the bulk J / render
    # transfer and artifact export never happen). Both on-device render
    # flags are forced off exactly as restore_survey forces them, so this
    # phase reuses the e2e phase's already-compiled programs and measures
    # the same device work the e2e number contains.
    from sucre_tpu.pipeline import dispatch_survey_batch

    dev_reps = int(os.environ.get("BENCH_DEV_REPS", 3))
    cfg_dev = _dc.replace(
        cfg, rgb_plot_on_device=False, reconstruction_on_device=False
    )
    batches = [targets[i : i + B] for i in range(0, T, B)]
    dwalls = []
    for rep in range(dev_reps):
        perturb(reps + 1 + rep)
        t0 = time.perf_counter()
        for names in batches:
            bf = dispatch_survey_batch(
                scene, list(names), tmp / "devout", cfg_dev, scene.view_list(),
                cache, device_views,
            )
            # device sync: a scalar fetch completes only after the whole
            # batch program ran (block_until_ready is unreliable on the
            # tunnel)
            float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
        dwalls.append(time.perf_counter() - t0)
        log(f"device-only rep {rep}: {dwalls[-1]:.2f}s")
        if rep >= 1 and time.perf_counter() - bench_start > budget + 120:
            break
    dwall = min(dwalls[1:]) if len(dwalls) > 1 else dwalls[0]

    mpix = T * W * H / 1e6
    value = mpix / wall
    print(
        json.dumps(
            {
                "metric": "restore_throughput",
                "value": round(value, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(value / 50.0, 4),
                "device_mpix_s": round(mpix / dwall, 3),
                "value_f16": round(mpix / fwall, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
