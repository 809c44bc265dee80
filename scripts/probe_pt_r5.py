"""Round-5 probe: per-target survey-table PAD GRANULARITY on the chip.

VERDICT r4 #1: the bench transect (honest terrain-following geometry,
targets keep 8-10 views) measures ~3.0 Mpix/s/chip while the t(V) model
(BASELINE.md) puts V_eff 10-12 at 4.2-4.9 — because per-target tables
pad every target's kept list to _pt_pad_gran(match_chunk)=8 granularity
(10 kept -> tables of 16). The r4 A/B that kept gran 8 compared V=20 vs
V=24 on the PRE-FIX inflated transect and never probed the shapes the
honest geometry actually produces. This probe measures, device-only on
the chip, the full match+fit transect workload at:

  gran 8  -> tables of 16  (current default)
  gran 4  -> tables of 12  (fit kernel's VB=4 view-block multiple)
  gran 2  -> tables of 10

and the same sweep at num_iter=1 (matching-dominated) to attribute any
delta between the matching program shape and the fit stage (whose
occupancy tile-skip already skips all-invalid pad view blocks).

Best of N perturbed steady-state reps (the tunnel caches identical-input
executions). Run: python scripts/probe_pt_r5.py
"""

import dataclasses as dc
import os
import sys
import time
import unittest.mock as mock
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = int(os.environ.get("PROBE_REPS", 4))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from bench import Workload, log

    twl = Workload("transect", 48, 960, 544, 8, 4, 200, spread=40.0)
    cfg_match = dc.replace(twl.cfg, num_iter=1)

    base = [0]

    def phase(label, gran, cfg=None, reps=REPS):
        walls = []
        pb, base[0] = base[0], base[0] + reps
        env = {"SUCRE_CHUNKED_ROUTE_FACTOR": "0"}  # pin the pt route
        if gran is not None:
            env["SUCRE_PT_PAD_GRAN"] = str(gran)
        with mock.patch.dict(os.environ, env):
            for rep in range(reps):
                twl.perturb(pb + rep)
                t0 = time.perf_counter()
                twl.run_device_only(twl.tmp / f"dev_{label}", cfg)
                w = time.perf_counter() - t0
                walls.append(w)
                log(f"[{label}] rep {rep}: {w:.2f}s")
        best = min(walls[1:]) if len(walls) > 1 else walls[0]
        log(f"[{label}] best steady: {best:.3f}s = "
            f"{twl.mpix / best:.3f} Mpix/s device")
        return best

    out = {}
    for gran, v in ((8, 16), (4, 12), (2, 10)):
        out[f"full_g{gran}_v{v}"] = phase(f"full g{gran} (tables {v})", gran)
    for gran, v in ((8, 16), (4, 12), (2, 10)):
        out[f"match_g{gran}_v{v}"] = phase(
            f"match-only g{gran} (tables {v})", gran, cfg_match
        )
    import json

    print(json.dumps(
        {k: round(v, 3) for k, v in out.items()}
        | {f"mpix_{k}": round(twl.mpix / v, 3)
           for k, v in out.items() if k.startswith("full")}
    ))


if __name__ == "__main__":
    main()
