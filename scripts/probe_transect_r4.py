"""Round-4 probe: transect survey device time, single-program vs chunked.

The bench's partial-overlap transect (48 views spread=40, 8 targets,
batches of 4) currently routes through the one-program survey matcher,
which matches every target against the whole culled-UNION view stack and
feeds the fit the un-compacted (T, V_union, H, W) stack — per-target
tile culling (measured 2x on this geometry in round 3) never applies.
This probe measures, on the chip, the same device-only workload:

  phase A: default routing (single survey program), and
  phase B: SUCRE_SURVEY_MAX_PAIRS=1 — forces the chunked path, where
           per-(target, chunk) tile rectangles slice the gather volume
           and kept chunks are per-target compacted before the fit.

Best of N perturbed steady-state reps each (the tunnel caches
identical-input executions). Run: python scripts/probe_transect_r4.py
"""

import os
import sys
import time
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

    base = [0]

    def phase(label, reps=REPS):
        walls = []
        pb, base[0] = base[0], base[0] + reps
        for rep in range(reps):
            twl.perturb(pb + rep)
            t0 = time.perf_counter()
            twl.run_device_only(twl.tmp / f"dev_{label}")
            w = time.perf_counter() - t0
            walls.append(w)
            log(f"[{label}] rep {rep}: {w:.2f}s")
        best = min(walls[1:]) if len(walls) > 1 else walls[0]
        log(f"[{label}] best steady: {best:.3f}s = "
            f"{twl.mpix / best:.3f} Mpix/s device")
        return best

    import unittest.mock as mock

    d = phase("default")  # per-target tables (or mixed, per routing)
    with mock.patch.dict(os.environ, {
        "SUCRE_PER_TARGET_SURVEY": "0", "SUCRE_CHUNKED_ROUTE_FACTOR": "0",
    }):
        a = phase("survey")  # forced shared-table survey program
    with mock.patch.dict(os.environ, {"SUCRE_SURVEY_MAX_PAIRS": "1"}):
        b = phase("chunked")
    print(
        f'{{"default_s": {d:.3f}, "survey_s": {a:.3f}, "chunked_s": {b:.3f}, '
        f'"default_mpix_s": {twl.mpix / d:.3f}, '
        f'"survey_mpix_s": {twl.mpix / a:.3f}, '
        f'"chunked_mpix_s": {twl.mpix / b:.3f}}}'
    )


if __name__ == "__main__":
    main()
