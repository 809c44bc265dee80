"""End-to-end restoration benchmark.

Measures steady-state end-to-end throughput (decode + match + fit +
export) restoring synthetic surveys via the pipelined restore_survey
driver, on whatever platform JAX selects (the real TPU chip under the
driver). Two workload geometries:

  - **all-overlap** (the headline `value`): BENCH_TARGETS targets,
    BENCH_VIEWS views, every view overlaps every target — culling is
    inert by construction, the matching worst case.
  - **transect** (`value_transect`): BENCH_TRANSECT_VIEWS views spread
    along a long survey line (spread=BENCH_SPREAD) with
    BENCH_TRANSECT_TARGETS targets across it — the partial-overlap
    geometry real surveys (BASELINE.json config 4) actually have, where
    surface culling cuts the effective view count per batch.

Prints ONE JSON line:
  {"metric": "restore_throughput", "value": <Mpix/s>, "unit": "Mpix/s",
   "vs_baseline": <value / 50.0>, "device_mpix_s": ..., "value_f16": ...,
   "value_renders": ..., "value_transect": ..., "device_mpix_s_transect": ...,
   "link": {"rtt_ms": ..., "h2d_mbs": ..., "d2h_mbs": ...},
   "link_end": {...},
   "reps": {<metric>: <n steady-state samples>, ...}}

``link`` / ``link_end`` record THIS session's host<->device link quality
(measured before and after the bulk phases): e2e numbers on this tunnel
are link-bound, so a cross-round `value` regression with an equal
`device_mpix_s` and a worse `link.d2h_mbs` is a tunnel session, not a
code change.

``value_f16`` is the all-overlap end-to-end run with export_dtype="f16"
(half the J fetch bytes on link-bound hosts, ~5e-4 relative rounding in
the npz checkpoint). ``device_mpix_s*`` are device-compute-only
(dispatch -> scalar sync, no bulk transfer/export): the numbers
transfer-free hosts approach, and the ones to regress against when the
link quality varies run to run.

Stall immunity (VERDICT r3): every phase has its own rep floor — at
least BENCH_MIN_MEAS (3) post-warmup measurements — that a time budget
cannot starve; the per-phase budget only trims EXTRA reps. One
multi-minute tunnel stall (r03: 1280 s in rep 0) can no longer reduce
any metric to n=1.

Validity: the device tunnel in this environment caches executions with
identical input buffers, so every rep perturbs the view stack (depth
+1 mm * rep, RGB LSB xor) — same workload shape, different buffer
contents — to force real executions.

Detail goes to stderr. Configuration via env: BENCH_VIEWS (default 16),
BENCH_W (960), BENCH_H (544), BENCH_TARGETS (12), BENCH_BATCH (4),
BENCH_ITERS (200), BENCH_REPS (6), BENCH_DEV_REPS (4), BENCH_F16_REPS
(4), BENCH_MIN_MEAS (3), BENCH_PHASE_BUDGET_S (240),
BENCH_TRANSECT_VIEWS (48), BENCH_TRANSECT_TARGETS (8), BENCH_SPREAD
(40), BENCH_SKIP_TRANSECT=1 to drop the transect phases, BENCH_PLATFORM
(e.g. cpu) to force a JAX backend for off-TPU smoke runs.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import tempfile
import time
from pathlib import Path


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Workload:
    """One synthetic survey: scene on disk, decoded cache, device-resident
    view stacks, and a perturbation knob giving every rep distinct input
    buffer contents (the tunnel caches identical-input executions)."""

    def __init__(self, label, n_views, width, height, targets, batch, iters,
                 spread=None):
        import jax.numpy as jnp

        from sucre_tpu.pipeline import DeviceViews, RestoreConfig, ViewCache
        from sucre_tpu.scene import Scene
        from sucre_tpu.synth import make_scene

        self.label = label
        self.jnp = jnp
        tmp = Path(tempfile.mkdtemp(prefix=f"sucre_bench_{label}_"))
        self.tmp = tmp
        t0 = time.perf_counter()
        kw = {} if spread is None else {"spread": spread}
        sd = make_scene(tmp, n_views=max(n_views, targets), width=width,
                        height=height, **kw)
        log(f"[{label}] scene gen: {time.perf_counter() - t0:.2f}s "
            f"({max(n_views, targets)} views {width}x{height}"
            f"{f', spread={spread}' if spread else ''})")
        self.scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        if spread is None:
            self.targets = sd.names[:targets]
        else:
            # targets spread across the transect (edge + middle
            # coverage); int() floor keeps the indices DISTINCT when
            # targets approaches n (banker's round() collides: n ==
            # targets == 8 gives [0,2,2,4,4,6,6,7])
            n = max(n_views, targets)
            idx = [int((i + 0.5) * n / targets) for i in range(targets)]
            self.targets = [sd.names[min(i, n - 1)] for i in idx]
        self.batch = batch
        self.mpix = targets * width * height / 1e6
        self.cfg = RestoreConfig(
            num_iter=iters, store="memory", verbose=False, num_workers=4,
            match_chunk=8,
        )
        t0 = time.perf_counter()
        self.cache = ViewCache()
        self.cache.prefill(self.scene.view_list(), num_workers=4)
        log(f"[{label}] decode (cached once): {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
        self.device_views = DeviceViews(
            self.scene.view_list(), self.cache, self.cfg.match_chunk
        )
        log(f"[{label}] device view stack upload (once): "
            f"{time.perf_counter() - t0:.2f}s")
        self.base_buckets = [dict(b) for b in self.device_views.buckets]

    def perturb(self, rep: int) -> None:
        """Distinct buffer CONTENTS per rep: shift valid depths by rep
        millimeters, flip RGB low bits. rep 0 = the pristine stack."""
        jnp = self.jnp
        for b, bb in zip(self.device_views.buckets, self.base_buckets):
            if rep == 0:
                b["depths"], b["rgbs"] = bb["depths"], bb["rgbs"]
            else:
                d = bb["depths"]
                b["depths"] = jnp.where(d > 0, d + jnp.uint16(rep), d)
                b["rgbs"] = jnp.bitwise_xor(bb["rgbs"], jnp.uint8(rep & 0xFF))

    def run_e2e(self, out: Path, cfg=None) -> float:
        from sucre_tpu.pipeline import restore_survey

        t0 = time.perf_counter()
        self._last_results = restore_survey(
            self.scene, self.targets, out, cfg or self.cfg,
            batch_targets=self.batch, cache=self.cache,
            device_views=self.device_views,
        )
        return time.perf_counter() - t0

    def run_device_only(self, out: Path, cfg=None) -> float:
        """Dispatch the full match+fit pipeline per batch, sync with a
        tiny scalar fetch (no bulk device->host transfer, no export).
        Both on-device render flags forced off exactly as restore_survey
        forces them, so this reuses the e2e phase's compiled programs."""
        import jax
        import numpy as np

        from sucre_tpu.pipeline import dispatch_survey_batch

        cfg = dc.replace(
            cfg or self.cfg,
            rgb_plot_on_device=False, reconstruction_on_device=False,
        )
        batches = [
            self.targets[i: i + self.batch]
            for i in range(0, len(self.targets), self.batch)
        ]
        t0 = time.perf_counter()
        for names in batches:
            bf = dispatch_survey_batch(
                self.scene, list(names), out, cfg, self.scene.view_list(),
                self.cache, self.device_views,
            )
            # scalar fetch completes only after the whole batch program
            # ran (block_until_ready is unreliable on the tunnel)
            float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
        return time.perf_counter() - t0


# Every probe buffer's contents are salted with per-process entropy and
# a process-wide sequence: the tunnel serves identical-input transfers
# from a cache (CLAUDE.md), which would record falsely healthy links —
# both across probes within a run (start vs end, per phase) and across
# runs in one tunnel session.
_PROBE_SALT = int.from_bytes(os.urandom(2), "little")
_PROBE_SEQ = [0]


def _probe_buf(nbytes: int) -> "object":
    import numpy as np

    _PROBE_SEQ[0] += 1
    v = _PROBE_SALT + _PROBE_SEQ[0]
    return (
        np.arange(nbytes, dtype=np.uint8) + np.uint8(v & 0xFF)
    ) ^ np.uint8((v >> 8) & 0xFF)


def measure_link(tag: str) -> dict:
    """Host<->device link probe (~2 s): dispatch round-trip latency and
    H2D/D2H bandwidth from three ~8 MB transfers each way, every buffer
    unique (see _probe_buf — the tunnel caches identical-input
    executions, within AND across runs). Emitted in the bench JSON so
    cross-round e2e comparisons can separate code regressions from
    link-quality sessions (r4's 0.945-vs-1.177 question was
    unanswerable without this)."""
    import jax
    import numpy as np

    dev = jax.devices()[0]
    # warm the path (first transfers can stall on the tunnel); salted
    # like every probe payload — a repeat of the start-probe's warmup
    # bytes would be cache-served and not actually warm anything
    _PROBE_SEQ[0] += 1
    jax.device_get(
        jax.device_put(np.float32(_PROBE_SALT + _PROBE_SEQ[0]), dev)
    )

    rtts = []
    for i in range(5):
        _PROBE_SEQ[0] += 1
        x = jax.device_put(np.float32(_PROBE_SALT + _PROBE_SEQ[0]), dev)
        t0 = time.perf_counter()
        jax.device_get(x)
        rtts.append(time.perf_counter() - t0)
    rtt_s = min(rtts)

    nbytes = 8 << 20
    h2d, d2h = [], []
    for rep in range(3):
        buf = _probe_buf(nbytes)
        t0 = time.perf_counter()
        x = jax.device_put(buf, dev)
        # a 1-element fetch completes only after the upload materialized
        # (block_until_ready is unreliable on the tunnel)
        jax.device_get(x[:1])
        h2d.append(time.perf_counter() - t0 - rtt_s)
        t0 = time.perf_counter()
        jax.device_get(x)
        d2h.append(time.perf_counter() - t0)
    mb = nbytes / 1e6
    link = {
        "rtt_ms": round(rtt_s * 1e3, 2),
        "h2d_mbs": round(mb / max(min(h2d), 1e-9), 1),
        "d2h_mbs": round(mb / max(min(d2h), 1e-9), 1),
    }
    log(f"[link {tag}] rtt {link['rtt_ms']} ms, "
        f"h2d {link['h2d_mbs']} MB/s, d2h {link['d2h_mbs']} MB/s")
    return link


def quick_d2h(tag: str) -> float:
    """One ~8 MB D2H sample (MB/s) — cheap enough to take after every
    phase, so the artifact shows WHEN the tunnel degraded within a run
    (observed: e2e phases halving while device metrics stay put).
    Buffer contents unique within and across runs (_probe_buf)."""
    import jax
    import numpy as np

    buf = _probe_buf(8 << 20)
    x = jax.device_put(buf, jax.devices()[0])
    jax.device_get(x[:1])
    t0 = time.perf_counter()
    jax.device_get(x)
    mbs = (8 << 20) / 1e6 / max(time.perf_counter() - t0, 1e-9)
    log(f"[link@{tag}] d2h {mbs:.1f} MB/s")
    return round(mbs, 1)


def run_phase(label, fn, perturb, *, reps, min_meas, budget_s, pbase):
    """Run one metric's reps with stall immunity: rep 0 is warmup, then
    at least ``min_meas`` measured reps ALWAYS run; the budget only trims
    reps beyond the floor. Returns (best_wall, n_measured, n_run).
    ``n_measured`` counts post-warmup reps only — 0 when a single rep ran
    (a warmup number, honestly labeled)."""
    walls = []
    t0 = time.perf_counter()
    for rep in range(reps):
        perturb(pbase + rep)
        w = fn(rep)
        walls.append(w)
        log(f"[{label}] rep {rep}: {w:.2f}s")
        measured = len(walls) - 1
        if measured >= min_meas and time.perf_counter() - t0 > budget_s:
            log(f"[{label}] budget reached after {measured} measured reps")
            break
    steady = walls[1:] if len(walls) > 1 else walls
    return min(steady), len(walls) - 1, len(walls)


def main() -> None:
    V = int(os.environ.get("BENCH_VIEWS", 16))
    W = int(os.environ.get("BENCH_W", 960))
    H = int(os.environ.get("BENCH_H", 544))
    T = int(os.environ.get("BENCH_TARGETS", 12))
    B = int(os.environ.get("BENCH_BATCH", 4))
    ITERS = int(os.environ.get("BENCH_ITERS", 200))
    REPS = int(os.environ.get("BENCH_REPS", 6))
    DEV_REPS = int(os.environ.get("BENCH_DEV_REPS", 4))
    F16_REPS = int(os.environ.get("BENCH_F16_REPS", 4))
    MIN_MEAS = int(os.environ.get("BENCH_MIN_MEAS", 3))
    PHASE_BUDGET = float(os.environ.get("BENCH_PHASE_BUDGET_S", 240))
    TV = int(os.environ.get("BENCH_TRANSECT_VIEWS", 48))
    TT = int(os.environ.get("BENCH_TRANSECT_TARGETS", 8))
    SPREAD = float(os.environ.get("BENCH_SPREAD", 40.0))
    SKIP_TRANSECT = os.environ.get("BENCH_SKIP_TRANSECT") == "1"

    import jax

    # JAX_PLATFORMS is preset (and jax pre-imported) in this environment;
    # BENCH_PLATFORM=cpu forces the CPU backend for harness smoke tests.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # Persistent compile cache: first-ever compile of the big programs can
    # take minutes (remote-compile environments); cached binaries make
    # subsequent benchmark runs start in seconds.
    # BENCH_CACHE_DIR diverts compile-cache writes (tests point it at a
    # tmp dir so CPU-shape entries never pollute the committed cache)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BENCH_CACHE_DIR",
                       str(Path(__file__).parent / ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log(f"devices: {jax.devices()}")

    out: dict = {"metric": "restore_throughput", "unit": "Mpix/s"}
    nreps: dict = {}
    link_phase: dict = {}  # one D2H sample after each phase

    # Link quality of THIS session, before any bulk work touches the
    # tunnel — the context every link-bound e2e number needs.
    out["link"] = measure_link("start")

    # ---- all-overlap workload: value / value_f16 / device_mpix_s -------
    # Perturbation indices are allocated strictly increasing per workload:
    # two phases of the SAME workload must never reuse an index, or the
    # tunnel's identical-input execution cache serves the repeat (CLAUDE.md:
    # it overstated round-1 numbers ~20%).
    wl = Workload("overlap", V, W, H, T, B, ITERS)
    pbase = 0

    best, n, used = run_phase(
        "e2e", lambda rep: wl.run_e2e(wl.tmp / f"out{rep}"), wl.perturb,
        reps=REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=pbase,
    )
    pbase += used
    out["value"] = round(wl.mpix / best, 3)
    out["vs_baseline"] = round(out["value"] / 50.0, 4)
    nreps["value"] = n
    link_phase["value"] = quick_d2h("value")

    # renders-only artifacts: the J payload (most of the per-target
    # export bytes) never leaves the device — the e2e number for users
    # whose deliverable is the PNGs (--artifacts renders). Runs SECOND
    # (before f16) so the tunnel's progressive post-bulk degradation —
    # observed halving later e2e phases within one run — doesn't
    # systematically handicap the least-link-bound e2e metric.
    cfg_rend = dc.replace(wl.cfg, artifacts="renders")
    best, n, used = run_phase(
        "renders", lambda rep: wl.run_e2e(wl.tmp / f"rendout{rep}", cfg_rend),
        wl.perturb,
        reps=F16_REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=pbase,
    )
    pbase += used
    out["value_renders"] = round(wl.mpix / best, 3)
    nreps["value_renders"] = n
    link_phase["value_renders"] = quick_d2h("value_renders")

    cfg_f16 = dc.replace(wl.cfg, export_dtype="f16")
    best, n, used = run_phase(
        "f16", lambda rep: wl.run_e2e(wl.tmp / f"f16out{rep}", cfg_f16),
        wl.perturb,
        reps=F16_REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=pbase,
    )
    pbase += used
    out["value_f16"] = round(wl.mpix / best, 3)
    nreps["value_f16"] = n
    link_phase["value_f16"] = quick_d2h("value_f16")

    best, n, used = run_phase(
        "device", lambda rep: wl.run_device_only(wl.tmp / "devout"),
        wl.perturb,
        reps=DEV_REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=pbase,
    )
    out["device_mpix_s"] = round(wl.mpix / best, 3)
    nreps["device_mpix_s"] = n
    link_phase["device_mpix_s"] = quick_d2h("device_mpix_s")

    # ---- transect workload: the partial-overlap survey geometry --------
    # Device-only runs FIRST: measured repeatedly, running it after the
    # e2e phase's sustained bulk transfers left the tunnel in a state
    # where the same compiled batch program executed ~2.5x slower for
    # the rest of the process (5.4 s vs 2.0 s steady across sessions;
    # fresh-process probes at the same shape never reproduce it) — the
    # device metric is the regression anchor, so it gets the clean
    # tunnel.
    if not SKIP_TRANSECT:
        twl = Workload("transect", TV, W, H, TT, B, ITERS, spread=SPREAD)
        tbase = 0
        best, n, used = run_phase(
            "device_transect",
            lambda rep: twl.run_device_only(twl.tmp / "devout"),
            twl.perturb,
            reps=DEV_REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=tbase,
        )
        tbase += used
        out["device_mpix_s_transect"] = round(twl.mpix / best, 3)
        nreps["device_mpix_s_transect"] = n
        link_phase["device_mpix_s_transect"] = quick_d2h("device_mpix_s_transect")

        best, n, used = run_phase(
            "e2e_transect", lambda rep: twl.run_e2e(twl.tmp / f"out{rep}"),
            twl.perturb,
            reps=REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET, pbase=tbase,
        )
        tbase += used
        out["value_transect"] = round(twl.mpix / best, 3)
        nreps["value_transect"] = n
        link_phase["value_transect"] = quick_d2h("value_transect")

        # the most production-representative row: partial-overlap
        # geometry + PNG-deliverable export (no J fetch)
        cfg_tr = dc.replace(twl.cfg, artifacts="renders")
        best, n, used = run_phase(
            "renders_transect",
            lambda rep: twl.run_e2e(twl.tmp / f"rout{rep}", cfg_tr),
            twl.perturb,
            reps=F16_REPS, min_meas=MIN_MEAS, budget_s=PHASE_BUDGET,
            pbase=tbase,
        )
        out["value_transect_renders"] = round(twl.mpix / best, 3)
        nreps["value_transect_renders"] = n
        link_phase["value_transect_renders"] = quick_d2h("value_transect_renders")

    # Re-probe after the sustained bulk transfers: the tunnel has been
    # observed to degrade for the rest of the process after the e2e
    # phases (see the transect ordering note above) — the delta between
    # the two probes records that state for the artifact.
    out["link_end"] = measure_link("end")

    out["link_phase"] = link_phase
    out["reps"] = nreps
    print(json.dumps(out))


if __name__ == "__main__":
    main()
