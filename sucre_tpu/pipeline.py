"""End-to-end restoration pipeline: match -> store -> fit -> export.

The per-image orchestrator (parity: ``restore_image``, sucre.py:160-219)
with the reference's cache lifecycle:

  - ``<output>/<image>.h5`` exists and not forced => skip matching
    (idempotent resume at file granularity);
  - ``--force-compute-matches`` invalidates; integrity check rejects
    half-written files; the cache is deleted after a successful restore
    unless ``keep_matches``.

TPU structure: the matching stage streams other views through a
host-side threaded decode (io.images.prefetch_views), batches them into
fixed-size view chunks (padded => one XLA compilation per camera-dims
bucket), and runs the fused match+gather kernel on device. The resulting
dense observation stack feeds the on-device Adam loop directly — the
HDF5 cache is written for resume parity but not re-read in the common
path.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sucre_tpu.io.images import (
    batched,
    depth_to_f32,
    load_depth_map,
    load_rgb,
    load_view_arrays,
    prefetch_views,
    rgb_to_f32,
)
from sucre_tpu.models.sucre import SucreParams, init_params
from sucre_tpu.ops.matching import DenseObs, PairMatch, match_and_observe_chunk_jit
from sucre_tpu.scene import Scene, View
from sucre_tpu.solve import FitConfig, FitTelemetry, fit, print_telemetry
from sucre_tpu.store import MatchesFile
from sucre_tpu.utils import checkpoint as ckpt
from sucre_tpu.utils import viz
from sucre_tpu.utils.log import get_logger


@dataclasses.dataclass
class RestoreConfig:
    light_model: bool = False
    use_closed_form: bool = False
    min_cover: float = 0.000001  # sucre.py:282
    lr: float = 0.05  # sucre.py:289
    num_iter: int = 200  # sucre.py:291
    # Fit view-chunk: the --batch-size grad-accum memory knob
    # (sucre.py:292). None = whole observation stack in one gradient pass
    # (identical result — the reference's pair-batching is pure
    # accumulation); an int bounds activation memory to ~chunk/V of the
    # stack on every fit path (sequential and batched).
    batch_size: int | None = None
    save_interval: int | None = None
    params_path: Path | None = None
    force_compute_matches: bool = False
    keep_matches: bool = False
    num_workers: int = 0
    # Decode-worker pool type. Threads (default) suit the C++/cv2 decode
    # stack (GIL released); True = spawn-context worker PROCESSES — the
    # reference's DataLoader model (loader.py:173-180) — for decode paths
    # that hold the GIL (pure-Python alt-format readers).
    decode_processes: bool = False
    match_chunk: int = 8  # views per device matching batch
    # Chunked-matching flush window: how many dispatched chunks' min-cover
    # counts are fetched per host round trip (see compute_matches /
    # match_targets_shared). Transient HBM peak scales ~window *
    # match_chunk unfiltered views; larger windows amortize the ~30 ms
    # device round trip on high-latency links at the cost of that peak.
    match_window: int = 4
    store: str = "hdf5"  # "hdf5" (reference cache lifecycle) | "memory"
    joint_params: bool = False  # share B/beta/gamma across the whole batch
    bilinear_colors: bool = False  # bilinear (vs reference nearest) color sampling
    frustum_cull: bool = True  # skip pairs whose surface AABBs cannot overlap
    # Tile-granular culling (chunked matching paths): the target splits
    # into cull_tiles x cull_tiles pixel tiles with their own surface
    # AABBs, and each view chunk matches only the union RECTANGLE of
    # tiles its views' surfaces can reach — gather volume (matching's
    # hardware bound) drops with the overlap fraction on partial-overlap
    # geometry. <= 1 disables (whole-view culling only). Only active when
    # frustum_cull is on.
    cull_tiles: int = 4
    # J device->host transfer dtype on the batched path ("f32" | "f16").
    # f32 (default) keeps the parameter checkpoint (.npz/.pt J — the
    # full-precision restoration artifact, warm-start input and
    # reference-interop payload) exact, matching the single-image path.
    # "f16" halves the J fetch for slow links but rounds the CHECKPOINT
    # too (~5e-4 relative) — opt in only when the link dominates and the
    # npz J is not the deliverable. PNG renders are u8 either way.
    export_dtype: str = "f32"
    # Artifact selection: "full" (default — reference parity: PNG renders
    # AND the .npz/.pt parameter checkpoint with the f32 J,
    # sucre.py:212-215) | "renders" — PNG renders only. "renders" skips
    # the J device->host fetch AND the npz encode+write entirely: at
    # 544x960 the f32 J npz is ~6.3 MB of the ~8 MB/target export
    # payload, the dominant link+disk cost when the PNGs are the
    # deliverable. No checkpoint artifact means no later --params-path
    # warm start from this run.
    artifacts: str = "full"
    checkpoint_interval: int | None = None  # mid-fit solver snapshots
    # Measured-convergence early stop (solve.FitConfig.stop_tol): OFF by
    # default — the reference runs exactly num_iter iterations
    # (sucre.py:291). When set, every fit path (sequential, batched,
    # joint, sharded-kernel) stops once the relative cost improvement per
    # stop_check-iteration window falls below stop_tol for every target.
    # Segmented checking adds ~1 small host round trip per window, so on
    # high-latency links the win appears when whole windows are skipped.
    stop_tol: float | None = None
    stop_check: int = 25
    # Where the _rgb artifact's percentile-normalize runs. Device keeps
    # host work off the critical path of a single blocking restore;
    # host (from the already-fetched J, inside the exporter thread) saves
    # the extra u8 image transfer when batches are software-pipelined.
    # None = auto: device in restore_many, host in restore_survey.
    rgb_plot_on_device: bool | None = None
    # Compute the report's recon_ssim (structure-sensitive quality
    # metric). Off by default: the 5-convolution SSIM costs ~0.2 s of
    # host CPU per target at production shapes — real money on the
    # pipelined exporter — while recon_psnr is ~free. The CLI enables
    # it when --report is requested (the metric's only consumer).
    ssim_metric: bool = False
    # Where the reconstruction render runs on the batched path. Device
    # renders while J is resident (one fused fetch); host renders from
    # the already-fetched J inside the exporter thread, saving the u8
    # render's device->host transfer — the winner when the link is the
    # bottleneck. None = auto: device in restore_many, host in
    # restore_survey (no-light model only — the light render stays on
    # device).
    reconstruction_on_device: bool | None = None
    # parameter-checkpoint artifact format: native .npz or the
    # reference's torch .pt state-dict layout (readable by the reference)
    params_format: str = "npz"
    # Distorted targets: also export <stem>_rgb_undistorted.png — the
    # restored image resampled onto the ideal pinhole camera (same
    # intrinsics/dims) via the closed-form forward distortion map
    # (utils/undistort.py). The reference-style deliverable without
    # COLMAP's image undistorter; no-op for pinhole targets.
    undistort_output: bool = False
    verbose: bool = True


class NoObservationsError(RuntimeError):
    """A target has no observations (empty/invalid depth map, or
    min_cover filtered every pair). RuntimeError subclass so existing
    callers' handlers keep working; the CLI catches THIS type per target
    (a broader catch would swallow device/compile errors, e.g. jaxlib's
    XlaRuntimeError, which also subclasses RuntimeError)."""


class RestoreResult(NamedTuple):
    image_name: str
    params: SucreParams
    # (H, W, 3) with NaN at invalid/unobserved pixels; None under
    # artifacts="renders" (J never leaves the device)
    J: np.ndarray | None
    valid: np.ndarray  # (H, W) export validity mask
    telemetry: FitTelemetry
    n_obs: int
    artifacts: list[Path]
    timings: dict[str, float]
    # fit-quality summary (final_cost, obs_rmse, recon_psnr) — see
    # _fit_metrics. None only for externally constructed results (a
    # mutable {} default would be shared across instances).
    metrics: dict | None = None


class ViewCache:
    """Host-side decoded-array cache shared across targets.

    The reference re-decodes every paired image for every target
    (DataLoader per call, sfm.py:130-131). For multi-target batches each
    view is decoded once here and reused — the host decode cost
    amortizes across the whole batch (BASELINE config 3's shared cache).

    Arrays are kept *raw* (uint8 RGB, uint16 millimeter depth) when
    exact (no resize): 4x/2x less host->device traffic; the matching
    kernel converts on device.
    """

    def __init__(self):
        self._data: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._aabbs: dict[str, object] = {}

    def aabb(self, view: View, stride: int = 8, margin: float = 0.05):
        """Memoized world-space AABB of the view's observed surface."""
        hit = self._aabbs.get(view.name, "miss")
        if hit == "miss":
            from sucre_tpu.ops.culling import surface_aabb

            hit = surface_aabb(
                self.get(view)[1], view.intrinsics, view.R, view.t,
                stride=stride, margin=margin,
                dist=view.dist, dist_model=view.dist_model,
            )
            self._aabbs[view.name] = hit
        return hit

    def get(self, view: View) -> tuple[np.ndarray, np.ndarray]:
        hit = self._data.get(view.name)
        if hit is None:
            hit = load_view_arrays(view, raw=True)
            self._data[view.name] = hit
        return hit

    def prefill(
        self, views: list[View], num_workers: int = 0, processes: bool = False
    ) -> None:
        views = [v for v in views if v.name not in self._data]
        if not views:
            return
        # Native thread-pooled batch decode (csrc/image_codec.cpp) when the
        # library is built and no resizing is needed; else threaded cv2.
        try:
            from sucre_tpu.io import native

            if native.available():
                jobs, idx = [], []
                for v in views:
                    rw, rh, _ = native.probe(v.rgb_path)
                    dw, dh, dk = native.probe(v.depth_path)
                    if (rw, rh) == (v.width, v.height) and (dw, dh) == (
                        v.width,
                        v.height,
                    ) and dk == "png":
                        jobs.append((v.rgb_path, "rgb8", v.width, v.height))
                        jobs.append((v.depth_path, "depth16", v.width, v.height))
                        idx.append(v)
                if len(idx) == len(views):
                    outs = native.decode_batch(jobs, n_threads=max(num_workers, 1))
                    for k, v in enumerate(idx):
                        self._data[v.name] = (outs[2 * k], outs[2 * k + 1])
                    return
        except Exception:
            pass
        for i, rgb, depth in prefetch_views(
            views, num_workers=num_workers, raw=True, processes=processes
        ):
            self._data[views[i].name] = (rgb, depth)


class DeviceViews:
    """Device-resident raw view stacks, uploaded once per session.

    Holds, per (width, height) bucket, stacked device arrays (u16 depth,
    u8 RGB, intrinsics, poses) for the whole survey. Raw dtypes keep HBM
    cost at ~5 bytes/pixel/view (200 views of 1080p ~ 2 GB), so surveys
    stay resident and matching any number of target batches costs ZERO
    host->device image traffic. ``iter_chunks`` serves the chunked
    matching path as padded device-side slices; ``match_survey`` consumes
    a bucket's stack whole.
    """

    def __init__(self, image_list: list[View], cache: ViewCache, match_chunk: int = 8):
        self.match_chunk = match_chunk
        from sucre_tpu.ops.distortion import resolve_dist_model, stack_class

        # Buckets split by dims AND stack class: fisheye cameras cannot
        # share a stacked program with pinhole/rational ones (the zero-
        # parameter fisheye map is not the identity), so a mixed rig
        # yields separate stacks that each match every target via
        # per-camera tags (ops.distortion.pair_tag).
        by_dims: dict[tuple, list[View]] = {}
        for v in image_list:
            key = (v.width, v.height, stack_class(v.dist_model))
            by_dims.setdefault(key, []).append(v)

        self.buckets: list[dict] = []
        for (w2, h2, _cls), views in by_dims.items():
            arrays = [cache.get(v) for v in views]
            dist_model = resolve_dist_model(v.dist_model for v in views)
            self.buckets.append(
                dict(
                    views=views,
                    depths=jnp.asarray(_stack_depths([a[1] for a in arrays])),
                    rgbs=jnp.asarray(np.stack([a[0] for a in arrays])),
                    intrs=jnp.asarray(
                        np.stack([v.intrinsics for v in views]).astype(np.float32)
                    ),
                    Rs=jnp.asarray(np.stack([v.R for v in views]).astype(np.float32)),
                    ts=jnp.asarray(np.stack([v.t for v in views]).astype(np.float32)),
                    # distortion vectors ride along only when some camera
                    # is distorted (None keeps the pinhole traces intact)
                    dists=(
                        None if dist_model == "none"
                        else jnp.asarray(
                            np.stack([v.dist for v in views]).astype(np.float32)
                        )
                    ),
                    dist_model=dist_model,
                )
            )

    @property
    def chunks(self):
        return list(self.iter_chunks())

    def subset(self, kept: list) -> "DeviceViews":
        """Compact the resident stacks to ``kept`` views ON DEVICE (one
        jnp.take per array per bucket, HBM-speed) and return a new
        DeviceViews over them. This keeps steady-state image H2D at ZERO
        when culling drops views — re-uploading the kept subset from the
        host cache costs seconds per batch on slow links (measured 0.7 s
        extra on a 60-view 960x544 transect over this tunnel), which
        inverted the culling win. No-op (self) when nothing was culled."""
        kept_names = {v.name for v in kept}
        if all(v.name in kept_names for b in self.buckets for v in b["views"]):
            return self
        out = object.__new__(DeviceViews)
        out.match_chunk = self.match_chunk
        out.buckets = []
        for b in self.buckets:
            idx = [i for i, v in enumerate(b["views"]) if v.name in kept_names]
            if not idx:
                continue
            if len(idx) == len(b["views"]):
                out.buckets.append(b)
                continue
            jidx = jnp.asarray(np.asarray(idx, np.int32))
            nb = dict(b)
            nb["views"] = [b["views"][i] for i in idx]
            for k in ("depths", "rgbs", "intrs", "Rs", "ts", "dists"):
                if nb.get(k) is not None:
                    nb[k] = jnp.take(b[k], jidx, axis=0)
            out.buckets.append(nb)
        return out

    def iter_chunks(self):
        """Yield (views, (depths, rgbs, intrs, Rs, ts), dists, dist_model)
        in match_chunk slices, zero-padded on device to the chunk size
        (``dists`` is None for pure-pinhole buckets)."""
        C = self.match_chunk
        for b in self.buckets:
            views = b["views"]
            V = len(views)
            for i in range(0, V, C):
                sub = views[i : i + C]
                pad = C - len(sub)

                def cut(x):
                    sl = x[i : i + C]
                    if pad:
                        sl = jnp.pad(sl, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
                    return sl

                yield sub, (
                    cut(b["depths"]), cut(b["rgbs"]), cut(b["intrs"]),
                    cut(b["Rs"]), cut(b["ts"]),
                ), (
                    None if b.get("dists") is None else cut(b["dists"])
                ), b.get("dist_model", "none")


def _chunk_rect(sub, view_rects, Hp: int, Wp: int):
    """Union rectangle of a chunk's per-view target rectangles (tile-
    aligned; see ops.culling.tile_view_rects). None = every view in the
    chunk is fully culled (no tile of the target reachable)."""
    rects = [view_rects.get(v.name, (0, Hp, 0, Wp)) for v in sub]
    rects = [r for r in rects if r[1] > r[0]]
    if not rects:
        return None
    return (
        min(r[0] for r in rects), max(r[1] for r in rects),
        min(r[2] for r in rects), max(r[3] for r in rects),
    )


def _pt_pad_views(vmax: int, match_chunk: int) -> int:
    """Padded per-target view-list size for a batch whose largest kept
    list is ``vmax``.

    A round-5 interleaved on-chip sweep of FORCED table sizes on the
    honest transect measured matching time monotone and ~uniform per
    view (V=10/12/16/20/24 -> 1.03/1.22/1.71/2.07/2.58 s), refuting the
    round-4 V=20-vs-24 A/B (a cross-session artifact on the pre-fix
    inflated transect) — pad rows are pure cost. But every distinct
    padded size is a fresh multi-minute first compile of the survey
    program, and a 200-target transect whose kept counts drift along
    the line presented a NEW shape almost every batch at granularity 2
    (the first full-survey run spent ~2x its device time in compiles).
    So the padding is PIECEWISE: multiples of 2 up to 12 views (where
    each pad row is a large relative cost), 4 up to 16, 8 up to 32, 16
    beyond — the distinct-shape set stays ~9 per (T, H, W) family. Measured cost of the compromise at the bench
    transect (kept 8-10): tables of 12 run 2.62 Mpix/s vs 2.89 at exact
    10 and 1.97 at the old flat-16 default. SUCRE_PT_PAD_GRAN forces a
    flat granularity for probing; read at call time so it applies
    without a reimport."""
    del match_chunk  # no longer tied to the matching chunk size
    g = os.environ.get("SUCRE_PT_PAD_GRAN")
    if g is not None:
        gi = max(int(g), 1)  # 0/negative would divide by zero
        return -(-max(vmax, 1) // gi) * gi
    v = max(vmax, 1)
    if v <= 12:  # fine where each pad row is a large relative cost
        return -(-v // 2) * 2
    if v <= 16:
        return -(-v // 4) * 4
    if v <= 32:
        return -(-v // 8) * 8
    return -(-v // 16) * 16


def _est_chunked_pairs(
    tile_rects: list[dict], culled_list: list[View], match_chunk: int,
    H: int, W: int,
) -> int:
    """Predicted matching gather rows if the batch routed through the
    chunked path: per (target, chunk), the union tile rectangle's area
    times the chunk's view count (the rows the sliced program actually
    gathers). Mirrors match_targets_shared's chunk grouping."""
    chunks = [
        culled_list[i: i + match_chunk]
        for i in range(0, len(culled_list), match_chunk)
    ]
    total = 0
    for rl in tile_rects:
        if not rl:
            continue
        for sub in chunks:
            rect = _chunk_rect(sub, rl, H, W)
            if rect is None:
                continue
            r0, r1, c0, c1 = rect
            # the dispatched chunk is padded to match_chunk views and the
            # zero-depth pads still execute gather rows — charge them
            total += (r1 - r0) * (c1 - c0) * match_chunk
    return total


def _restore_rect(tree, rect, H: int, W: int):
    """Pad a rect-sliced matching output back onto the full (H, W) target
    grid (padded entries are invalid: zeros, NO_MATCH for pixel coords).
    The slice may extend past H/W into the tile-alignment padding — those
    rows/cols are cropped (they hold no valid matches by construction)."""
    from sucre_tpu.ops.matching import NO_MATCH

    r0, r1, c0, c1 = rect
    rows = min(r1, H) - r0
    cols = min(c1, W) - c0

    def one(x, fill=0):
        y = x[:, :rows, :cols]
        pads = [(0, 0), (r0, H - r0 - rows), (c0, W - c0 - cols)]
        pads += [(0, 0)] * (x.ndim - 3)
        return jnp.pad(y, pads, constant_values=fill)

    if isinstance(tree, PairMatch):
        return PairMatch(
            u2=one(tree.u2, NO_MATCH), v2=one(tree.v2, NO_MATCH),
            d2=one(tree.d2), valid=one(tree.valid),
        )
    return jax.tree.map(one, tree)


def compute_matches(
    target: View,
    image_list: list[View],
    matches_file: MatchesFile | None,
    *,
    min_cover: float = 0.000001,
    match_chunk: int = 8,
    num_workers: int = 0,
    decode_processes: bool = False,
    target_depth: np.ndarray | None = None,
    collect_dense: bool = True,
    cache: ViewCache | None = None,
    compact: bool = False,
    bilinear: bool = False,
    primed_depths: dict[str, np.ndarray] | None = None,
    window: int = 4,
    view_rects: dict[str, tuple] | None = None,
    log: Callable[[str], None] = lambda s: None,
) -> tuple[DenseObs | None, list[str]]:
    """Stage A+B fused: match the target against every view in
    ``image_list`` and gather matched colors, saving pairs that cover
    more than ``min_cover`` of the target (parity: sfm.py:127-138).

    ``view_rects`` (from ops.culling.tile_view_rects) restricts each
    chunk to the union RECTANGLE of target pixels its views' surfaces can
    reach: the matching program runs on a target slice in GLOBAL pixel
    coordinates (a traced grid origin — bit-identical results on the
    covered pixels) and outputs are padded back onto the full grid. The
    gather volume — matching's hardware bound — drops from H*W to the
    rectangle area per chunk; tile-aligned rectangles keep the compiled-
    shape set small (<= n_tiles distinct sizes per axis).

    Returns the dense observation stack over kept views (if
    ``collect_dense``) and the kept view names.
    """
    if target_depth is None:
        target_depth = load_depth_map(target.depth_path, target.width, target.height)
    d1 = jnp.asarray(target_depth)
    intr1 = jnp.asarray(target.intrinsics)
    R1 = jnp.asarray(target.R)
    t1 = jnp.asarray(target.t)

    H1, W1 = d1.shape
    d1p = None
    Hp = Wp = 0
    if view_rects:
        # pad ONCE to the tile-aligned envelope so every slice below is a
        # whole-tile multiple (bounded compile-shape set); padded rows
        # and cols have zero depth => no valid pixels
        Hp = max(H1, max(r[1] for r in view_rects.values()))
        Wp = max(W1, max(r[3] for r in view_rects.values()))
        d1p = jnp.pad(d1, [(0, Hp - H1), (0, Wp - W1)])

    # Bucket by camera dims (uniform static shapes per stack) and stack
    # class (fisheye views cannot stack with pinhole/rational ones; mixed
    # rigs match via per-camera tags, see ops.distortion.pair_tag).
    from sucre_tpu.ops.distortion import stack_class

    buckets: dict[tuple, list[View]] = {}
    for v in image_list:
        buckets.setdefault((v.width, v.height, stack_class(v.dist_model)), []).append(v)

    kept_names: list[str] = []
    kept_chunks: list[DenseObs] = []  # device-resident, already min-cover-filtered
    area = float(target.width * target.height)

    # Chunks dispatch asynchronously and their tiny min-cover count
    # vectors are fetched in batched WINDOWS of several chunks (a
    # per-chunk fetch costs one ~30 ms round trip each on high-latency
    # links; an unbounded window would keep every chunk's dense outputs
    # alive on device at once). The window is a FIXED chunk count
    # (RestoreConfig.match_window) so the transient-HBM peak stays
    # ~window * match_chunk views and --match-chunk remains an effective
    # memory knob (lowering it lowers the peak). Filtering a window frees
    # its buffers: only the kept (jnp.take-copied) slices survive.
    pending = []  # (sub_views, n, obs, match, counts_dev)

    def flush_pending():
        all_counts = jax.device_get([p[4] for p in pending])
        keeps = [
            [j for j in range(n) if counts[j] / area > min_cover]
            for (_, n, *_), counts in zip(pending, all_counts)
        ]
        # ONE batched device->host fetch for every kept pair's packed-
        # save arrays (h5 path): per-pair np.asarray would pay ~6
        # serialized dispatch round trips per pair on high-latency links
        saved = iter(())
        if matches_file is not None:
            saved = iter(jax.device_get([
                (match.u2[j], match.v2[j], match.d2[j], match.valid[j],
                 obs.I[j])
                for (_, _, obs, match, _), keep in zip(pending, keeps)
                for j in keep
            ]))
        for (sub, n, obs, match, _), keep in zip(pending, keeps):
            for j in keep:
                view2 = sub[j]
                if matches_file is not None:
                    u2, v2, d2, valid, I = next(saved)
                    matches_file.save_pair_from_dense(
                        view2.name,
                        PairMatch(u2=u2, v2=v2, d2=d2, valid=valid),
                        I,
                    )
                kept_names.append(view2.name)
            if collect_dense and keep:
                idx = jnp.asarray(np.asarray(keep, np.int32))
                kept_chunks.append(
                    jax.tree.map(lambda x: jnp.take(x, idx, axis=0), obs)
                )
            log(f"matched {len(kept_names)} kept / {n} in chunk")
        pending.clear()

    from sucre_tpu.ops.distortion import pair_tag, resolve_dist_model

    for (w2, h2, _cls), views in buckets.items():
        # one static distortion tag per (target, bucket) program; a
        # (target_tag, view_tag) tuple when the sides' lens models differ
        v_tag = resolve_dist_model(v.dist_model for v in views)
        dist_model = pair_tag(target.dist_model, v_tag)
        t_dist = None if target.dist_model == "none" else jnp.asarray(target.dist)
        if cache is not None:
            stream = ((i, *cache.get(v)) for i, v in enumerate(views))
        elif primed_depths:
            # depths already decoded by the caller (the cull prepass) —
            # decode only the RGBs, popping each primed depth as consumed
            def _primed_stream(views=views):
                from sucre_tpu.io.images import load_depth_raw

                it = prefetch_views(
                    views, rgb=True, depth=False, num_workers=num_workers,
                    raw=True, processes=decode_processes,
                )
                for (i, r, _), v in zip(it, views):
                    d = primed_depths.pop(v.name, None)
                    if d is None:
                        d = load_depth_raw(v.depth_path, v.width, v.height)
                    yield i, r, d

            stream = _primed_stream()
        else:
            # raw dtypes: packed single-gather matching + 4x cheaper H2D
            # (u8-domain downscale under image_scale, see load_rgb_raw)
            stream = prefetch_views(
                views, rgb=True, depth=True, num_workers=num_workers,
                raw=True, processes=decode_processes,
            )
        for chunk in batched(stream, match_chunk):
            idxs = [i for i, _, _ in chunk]
            sub = [views[i] for i in idxs]
            n = len(chunk)
            rect = None
            if view_rects:
                rect = _chunk_rect(sub, view_rects, Hp, Wp)
                if rect is None:
                    continue  # every view in the chunk is fully culled
                if rect == (0, H1, 0, W1):
                    rect = None  # full grid: the plain path, no pad/slice
            dev, v_dists = _upload_view_chunk(
                [c[2] for c in chunk], [c[1] for c in chunk], sub, match_chunk,
                dist_model=v_tag,
            )
            if rect is not None:
                r0, r1, c0, c1 = rect
                obs, match = match_and_observe_chunk_jit(
                    jax.lax.slice(d1p, (r0, c0), (r1, c1)),
                    intr1, R1, t1, *dev, compact=compact, bilinear=bilinear,
                    origin=jnp.asarray([r0, c0], jnp.int32),
                    t_dist=t_dist, v_dists=v_dists, dist_model=dist_model,
                )
                obs = _restore_rect(obs, rect, H1, W1)
                match = _restore_rect(match, rect, H1, W1)
            else:
                obs, match = match_and_observe_chunk_jit(
                    d1, intr1, R1, t1, *dev, compact=compact, bilinear=bilinear,
                    t_dist=t_dist, v_dists=v_dists, dist_model=dist_model,
                )
            # PairMatch buffers are only read by the h5 save; drop them
            # at dispatch otherwise (halves the window's transient HBM,
            # same as match_targets_shared)
            pending.append((
                sub, n, obs, match if matches_file is not None else None,
                obs.valid[:n].sum(axis=(1, 2)),
            ))
            if len(pending) >= window:
                flush_pending()
    flush_pending()

    if matches_file is not None and matches_file.exists():
        if bilinear:
            matches_file.set_color_sampling("bilinear")
        matches_file.finalize()
    dense = None
    if collect_dense and kept_chunks:
        if len(kept_chunks) == 1:
            dense = kept_chunks[0]
        else:
            dense = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *kept_chunks
            )
    return dense, kept_names


def _stack_depths(depths: list[np.ndarray]) -> np.ndarray:
    """Stack per-view depth maps whose dtypes may disagree (alt-format
    sources beyond 65.535 m decode to float32 METERS while the rest stay
    uint16 MILLIMETERS — io/depth_formats.py). A bare np.stack would
    promote the u16 maps to float32 unconverted, and the device-side
    dtype dispatch (to_f32_depth) would then read millimeters as meters
    — a silent 1000x depth error. Convert everything to meters first
    when units are mixed."""
    if len({a.dtype for a in depths}) > 1:
        depths = [depth_to_f32(a) for a in depths]
    return np.stack(depths)


def _upload_view_chunk(depths, rgbs, sub: list[View], match_chunk: int,
                       dist_model: str = "none"):
    """Stack+pad one chunk of decoded views (keeping raw dtypes) and put it
    on device — a single H2D transfer reused by every target matched
    against this chunk. ``dist_model`` is the VIEW-side tag; returns
    (arrays5, dists) with dists None for pinhole view stacks."""
    n = len(sub)
    pad = match_chunk - n
    d0, r0 = depths[0], rgbs[0]
    depths = _stack_depths(depths + [np.zeros_like(d0)] * pad)
    rgbs = np.stack(rgbs + [np.zeros_like(r0)] * pad)
    intrs = np.stack([v.intrinsics for v in sub] + [sub[-1].intrinsics] * pad)
    Rs = np.stack([v.R for v in sub] + [sub[-1].R] * pad)
    ts = np.stack([v.t for v in sub] + [sub[-1].t] * pad)
    dists = None
    if dist_model != "none":
        dists = jnp.asarray(
            np.stack([v.dist for v in sub] + [sub[-1].dist] * pad).astype(np.float32)
        )
    return (
        jnp.asarray(depths),
        jnp.asarray(rgbs),
        jnp.asarray(intrs.astype(np.float32)),
        jnp.asarray(Rs.astype(np.float32)),
        jnp.asarray(ts.astype(np.float32)),
    ), dists


def match_targets_shared(
    targets: list[View],
    image_list: list[View],
    cache: ViewCache,
    *,
    min_cover: float = 0.000001,
    match_chunk: int = 8,
    matches_files: list[MatchesFile | None] | None = None,
    compact: bool = False,
    bilinear: bool = False,
    device_views: DeviceViews | None = None,
    window: int = 4,
    view_rects: list[dict] | None = None,
    log: Callable[[str], None] = lambda s: None,
) -> tuple[list[DenseObs | None], list[list[str]]]:
    """Match T targets against the view list with each view chunk uploaded
    to the device ONCE (the shared reprojection stack) — H2D traffic is
    O(V), not O(V*T). With a prebuilt ``device_views`` stack (uploaded once
    per session) image H2D traffic is ZERO.

    ``view_rects`` (one dict per target, aligned with ``targets``; see
    compute_matches) restricts each (target, chunk) pairing to the union
    rectangle of target pixels the chunk's views can reach — and SKIPS
    pairings whose every view is fully culled for that target (per-target
    pair culling the whole-survey keep-mask cannot express)."""
    from sucre_tpu.ops.distortion import pair_tag, resolve_dist_model

    tdev = []
    tdists = []
    tpads = []
    tdims = []
    for ti, t in enumerate(targets):
        rgb, depth = cache.get(t)
        d1 = jnp.asarray(depth)
        tdev.append(
            (
                d1,
                jnp.asarray(t.intrinsics),
                jnp.asarray(t.R),
                jnp.asarray(t.t),
            )
        )
        # always an array; consumed only when this target's own camera is
        # distorted (per-camera tags keep pinhole targets on the exact
        # pinhole path even over distorted view stacks)
        tdists.append(jnp.asarray(np.asarray(t.dist, np.float32)))
        H1, W1 = depth.shape
        tdims.append((H1, W1))
        if view_rects is not None and view_rects[ti]:
            Hp = max(H1, max(r[1] for r in view_rects[ti].values()))
            Wp = max(W1, max(r[3] for r in view_rects[ti].values()))
            tpads.append(jnp.pad(d1, [(0, Hp - H1), (0, Wp - W1)]))
        else:
            tpads.append(None)
    areas = [float(t.width * t.height) for t in targets]

    from sucre_tpu.ops.distortion import stack_class

    buckets: dict[tuple, list[View]] = {}
    for v in image_list:
        buckets.setdefault((v.width, v.height, stack_class(v.dist_model)), []).append(v)

    T = len(targets)
    kept_names: list[list[str]] = [[] for _ in range(T)]
    kept_chunks: list[list[DenseObs]] = [[] for _ in range(T)]

    # Chunks dispatch asynchronously and their tiny min-cover count
    # vectors are fetched in batched WINDOWS (one host round trip per
    # window instead of per chunk). The window is a FIXED chunk count
    # (RestoreConfig.match_window) so transient HBM stays ~window *
    # match_chunk unfiltered views per target on top of the kept
    # (take-copied) stacks — the bound this path exists to provide for
    # surveys past the single-program budget. PairMatch buffers are
    # dropped at dispatch when there is no h5 file to save them to
    # (--store memory).
    pending = []  # (ti, sub_views, n, obs, match_or_None, counts_dev)

    def flush_pending():
        all_counts = jax.device_get([p[5] for p in pending])
        keeps = [
            [j for j in range(n) if counts[j] / areas[ti] > min_cover]
            for (ti, _, n, *_), counts in zip(pending, all_counts)
        ]
        # ONE batched device->host fetch for every kept pair's packed-
        # save arrays (h5 targets only): per-pair np.asarray costs ~6
        # serialized dispatch round trips per pair on high-latency links
        saved = iter(jax.device_get([
            (match.u2[j], match.v2[j], match.d2[j], match.valid[j],
             obs.I[j])
            for (ti, _, _, obs, match, _), keep in zip(pending, keeps)
            if match is not None
            for j in keep
        ]))
        for (ti, sub, n, obs, match, _), keep in zip(pending, keeps):
            # match is non-None iff this target saves to h5 (set at
            # dispatch) — the same predicate the fetch above used, so
            # the iterator stays in lockstep
            mf = matches_files[ti] if matches_files else None
            for j in keep:
                if match is not None:
                    u2, v2, d2, valid, I = next(saved)
                    if mf is not None:
                        mf.save_pair_from_dense(
                            sub[j].name,
                            PairMatch(u2=u2, v2=v2, d2=d2, valid=valid),
                            I,
                        )
                kept_names[ti].append(sub[j].name)
            if keep:
                idx = jnp.asarray(np.asarray(keep, np.int32))
                kept_chunks[ti].append(
                    jax.tree.map(lambda x: jnp.take(x, idx, axis=0), obs)
                )
        pending.clear()

    if device_views is not None:
        chunk_iter = device_views.chunks
    else:
        def _iter_chunks():
            for (w2, h2, _cls), views in buckets.items():
                vtag = resolve_dist_model(v.dist_model for v in views)
                stream = ((i, *cache.get(v)) for i, v in enumerate(views))
                for chunk in batched(stream, match_chunk):
                    sub = [views[i] for i, _, _ in chunk]
                    dev, dists = _upload_view_chunk(
                        [c[2] for c in chunk], [c[1] for c in chunk], sub,
                        match_chunk, dist_model=vtag,
                    )
                    yield sub, dev, dists, vtag

        chunk_iter = _iter_chunks()
    for sub, dev, v_dists, vtag in chunk_iter:
        n = len(sub)
        for ti in range(T):
            # one static tag per (target, chunk) program; per-camera
            # (target_tag, view_tag) tuple when the sides' models differ
            # (mixed rigs — e.g. a fisheye target over pinhole views)
            t_tag_i = targets[ti].dist_model
            tag = pair_tag(t_tag_i, vtag)
            dist_kw = dict(
                t_dist=tdists[ti] if t_tag_i != "none" else None,
                v_dists=v_dists, dist_model=tag,
            )
            rect = None
            if view_rects is not None:
                H1, W1 = tdims[ti]
                if not view_rects[ti]:
                    continue  # every view is fully culled for this target
                rect = _chunk_rect(sub, view_rects[ti], H1, W1)
                if rect is None:
                    continue  # this chunk's views are all culled for ti
                if rect == (0, H1, 0, W1):
                    rect = None
            if rect is not None:
                r0, r1, c0, c1 = rect
                d1, intr1, R1, t1 = tdev[ti]
                obs, match = match_and_observe_chunk_jit(
                    jax.lax.slice(tpads[ti], (r0, c0), (r1, c1)),
                    intr1, R1, t1, *dev, compact=compact, bilinear=bilinear,
                    origin=jnp.asarray([r0, c0], jnp.int32), **dist_kw,
                )
                obs = _restore_rect(obs, rect, H1, W1)
                match = _restore_rect(match, rect, H1, W1)
            else:
                obs, match = match_and_observe_chunk_jit(
                    *tdev[ti], *dev, compact=compact, bilinear=bilinear,
                    **dist_kw,
                )
            counts = obs.valid[:n].sum(axis=(1, 2))
            mf = matches_files[ti] if matches_files else None
            pending.append(
                (ti, sub, n, obs, match if mf is not None else None, counts)
            )
        if len(pending) >= window * T:
            flush_pending()
    flush_pending()
    log(f"matched {T} targets")

    if matches_files:
        for mf in matches_files:
            if mf is not None and mf.exists():
                if bilinear:
                    mf.set_color_sampling("bilinear")
                mf.finalize()
    dense: list[DenseObs | None] = []
    for parts in kept_chunks:
        if not parts:
            dense.append(None)
        elif len(parts) == 1:
            dense.append(parts[0])
        else:
            dense.append(jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts))
    return dense, kept_names


def restore_image(
    scene: Scene,
    image_name: str,
    output_dir: Path | str,
    cfg: RestoreConfig | None = None,
    image_list: list[View] | None = None,
    mesh=None,
    cache: "ViewCache | None" = None,
) -> RestoreResult:
    """Restore one image end to end (parity: sucre.py:160-219).

    With a ('view', 'row') ``mesh``, the fit runs sharded across the
    mesh's devices — views data-parallel, pixel rows spatially parallel
    (``parallel.fit_sharded``); results equal the unsharded fit.

    A shared ``cache`` (ViewCache) makes sequential multi-target runs
    decode each view and compute each surface AABB once instead of once
    per target (the reference re-decodes per target, sfm.py:130-131)."""
    cfg = cfg or RestoreConfig()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    target = scene[image_name]
    logger = get_logger()
    log = logger.info if cfg.verbose else (lambda *a, **k: None)
    timings: dict[str, float] = {}

    log(f"Restore {target.name}.")
    use_h5 = cfg.store == "hdf5"
    matches_path = (output_dir / target.name).with_suffix(".h5")
    matches_file = (
        MatchesFile(matches_path, overwrite=cfg.force_compute_matches) if use_h5 else None
    )

    if image_list is None:
        image_list = scene.view_list()

    if cache is not None:
        target_depth = depth_to_f32(cache.get(target)[1])
    else:
        target_depth = load_depth_map(target.depth_path, target.width, target.height)

    t0 = time.perf_counter()
    obs = None
    primed_depths: dict[str, np.ndarray] = {}
    view_rects = None
    # pairs are appended incrementally during matching — a partial file
    # from a killed run would silently restore from a subset
    if use_h5 and matches_file.discard_if_incomplete():
        logger.warning(
            "Discarding incomplete matches cache %s (interrupted run).",
            matches_path,
        )
    if not use_h5 or cfg.force_compute_matches or not matches_path.exists():
        if cfg.frustum_cull:
            # depth-only pre-pass: drop views whose observed surface cannot
            # overlap the target's (skips their RGB decode and matching)
            from sucre_tpu.io.images import load_depth_raw
            from sucre_tpu.ops.culling import cull_views, surface_aabb

            t_aabb = surface_aabb(target_depth, target.intrinsics, target.R,
                                  target.t, dist=target.dist,
                                  dist_model=target.dist_model)
            if cache is not None:
                v_aabbs = [cache.aabb(v) for v in image_list]
            else:
                # keep the decoded depths for the matching stage below —
                # the prepass and the matcher otherwise decode every
                # depth map twice (consumed/popped as matching streams).
                # Retention is CAPPED: on huge surveys, views past the
                # budget just re-decode (host memory stays bounded).
                budget = 1 << 30  # ~1 GiB of u16 depth maps
                held = 0
                v_aabbs = []
                for v in image_list:
                    d = load_depth_raw(v.depth_path, v.width, v.height)
                    if held + d.nbytes <= budget:
                        primed_depths[v.name] = d
                        held += d.nbytes
                    v_aabbs.append(surface_aabb(
                        d, v.intrinsics, v.R, v.t,
                        dist=v.dist, dist_model=v.dist_model,
                    ))
            if cfg.cull_tiles > 1:
                # tile-granular: per-view target RECTANGLES (an empty one
                # = fully culled, subsuming the whole-view test)
                from sucre_tpu.ops.culling import surface_tile_aabbs, tile_view_rects

                tiles = surface_tile_aabbs(
                    target_depth, target.intrinsics, target.R, target.t,
                    n_tiles=cfg.cull_tiles,
                    dist=target.dist, dist_model=target.dist_model,
                )
                rects = tile_view_rects(
                    tiles, v_aabbs, target.height, target.width,
                    n_tiles=cfg.cull_tiles,
                )
                keep_mask = np.asarray([r[1] > r[0] for r in rects])
                view_rects = {
                    v.name: r
                    for v, r, k in zip(image_list, rects, keep_mask) if k
                }
            else:
                keep_mask = cull_views([t_aabb], v_aabbs)
            if not all(keep_mask):
                log(
                    f"Surface cull: {int(keep_mask.sum())}/{len(image_list)} "
                    f"views kept."
                )
                if primed_depths:
                    for v, k in zip(image_list, keep_mask):
                        if not k:
                            primed_depths.pop(v.name, None)
                image_list = [v for v, k in zip(image_list, keep_mask) if k]
        log(f"Compute {target.name} matches.")
        obs, _ = compute_matches(
            target,
            image_list,
            matches_file,
            min_cover=cfg.min_cover,
            match_chunk=cfg.match_chunk,
            num_workers=cfg.num_workers,
            decode_processes=cfg.decode_processes,
            target_depth=target_depth,
            collect_dense=True,
            cache=cache,
            compact=not cfg.light_model,
            bilinear=cfg.bilinear_colors,
            primed_depths=primed_depths or None,
            window=cfg.match_window,
            view_rects=view_rects,
        )
    timings["match"] = time.perf_counter() - t0

    if use_h5:
        if not matches_file.exists():
            raise NoObservationsError(
                f"No observations for {target.name}: no view pair exceeded "
                f"min_cover={cfg.min_cover}; cannot restore."
            )
        log("Check matches integrity.")
        matches_file.check_integrity()

    t0 = time.perf_counter()
    if obs is None and use_h5:
        log("Load matches.")
        matches_file.check_color_sampling(cfg.bilinear_colors)
        matches_file.check_grid(target.height, target.width)
        # no-light: host-side compact z layout (fused kernel eligibility,
        # ~3x smaller stack AND upload — resume must not silently degrade
        # or out-transfer the fresh-matching path)
        obs, _ = matches_file.load_dense(
            scene, target.height, target.width, compact=not cfg.light_model
        )
    if obs is None:
        n_obs = 0
    elif isinstance(obs.valid, np.ndarray):
        n_obs = int(obs.valid.sum())
    else:
        # device-resident mask: reduce on device, fetch ONE scalar (the
        # full bool mask is ~V*H*W bytes over a slow link)
        n_obs = int(jax.device_get(obs.valid.sum()))
    log(f"Total of {n_obs} observations.")
    if obs is None or n_obs == 0:
        raise NoObservationsError(
            f"No observations for {target.name}; cannot restore."
        )
    timings["load"] = time.perf_counter() - t0

    image = None
    if not cfg.use_closed_form:
        # raw decode + convert == load_rgb exactly when unresized; under
        # image_scale it keeps the same u8-domain resample the survey
        # path's device stacks use, so both paths share one J init
        if cache is not None:
            image = rgb_to_f32(cache.get(target)[0])
        else:
            from sucre_tpu.io.images import load_rgb_raw

            image = rgb_to_f32(
                load_rgb_raw(target.rgb_path, target.width, target.height)
            )
    params = init_params(
        image=image, light_model=cfg.light_model, use_closed_form=cfg.use_closed_form
    )
    if cfg.params_path is not None:
        params = ckpt.load_params(cfg.params_path, params)

    log(f"Solve least squares with Adam optimizer ({cfg.num_iter} iterations).")
    snapshot_fn = None
    if cfg.save_interval:
        def snapshot_fn(iteration, p, J_snap, observed_snap):
            valid_snap = _export_mask(cfg, target_depth, np.asarray(observed_snap))
            viz.save_plots(
                output_dir, target.name, p, np.asarray(J_snap), valid_snap,
                target.intrinsics, target_depth, iteration=iteration,
                dist=target.dist, dist_model=target.dist_model,
                undistort=cfg.undistort_output,
            )

    ckpt_dir = None
    if cfg.checkpoint_interval:
        # preserve subdirectories of nested image names (no collisions)
        base = output_dir / target.name
        ckpt_dir = base.parent / f"{base.stem}_fit_ckpt"
    t0 = time.perf_counter()
    fit_cfg = FitConfig(
        lr=cfg.lr,
        num_iter=cfg.num_iter,
        use_closed_form=cfg.use_closed_form,
        view_chunk=cfg.batch_size,
        save_interval=cfg.save_interval,
        checkpoint_dir=ckpt_dir,
        checkpoint_interval=cfg.checkpoint_interval,
        stop_tol=cfg.stop_tol,
        stop_check=cfg.stop_check,
    )
    # drop None callbacks: fit_sharded treats "no kwargs" as eligibility
    # for the fused-kernel route
    fit_kwargs = {
        k: v
        for k, v in dict(
            telemetry_fn=print_telemetry if cfg.verbose else None,
            snapshot_fn=snapshot_fn,
        ).items()
        if v is not None
    }
    if mesh is not None:
        from sucre_tpu.parallel import fit_sharded

        res = fit_sharded(params, obs, fit_cfg, mesh, **fit_kwargs)
    else:
        res = fit(params, obs, fit_cfg, **fit_kwargs)
    timings["fit"] = time.perf_counter() - t0
    if ckpt_dir is not None and ckpt_dir.exists():
        # successful completion: drop the mid-run solver snapshots
        import shutil

        shutil.rmtree(ckpt_dir, ignore_errors=True)

    # Device-side export renders while J is resident, then ONE batched
    # device->host fetch (same structure as the batched path; J stays
    # f32 here — the single-image path keeps full precision).
    intr_dev = jnp.asarray(np.asarray(target.intrinsics, np.float32))
    d_dev = jnp.asarray(np.asarray(target_depth, np.float32))
    t_dist_dev = (
        None if target.dist_model == "none"
        else jnp.asarray(np.asarray(target.dist, np.float32))[None]
    )
    rec_dev = viz.render_reconstruction_batch_device(
        jax.tree.map(lambda x: x[None], res.params._replace(J=None)),
        res.J[None], intr_dev[None], d_dev[None],
        dists_dev=t_dist_dev, dist_model=target.dist_model,
    )[0]
    valid_dev = (
        res.observed.astype(bool) if cfg.use_closed_form else d_dev > 0
    )
    # export-invalid pixels render black (the reference's NaN-carrying J
    # NaN-propagates through its reconstruction; ours is zero-filled at
    # unobserved pixels, which would render as pure backscatter)
    rec_dev = jnp.where(valid_dev[..., None], rec_dev, 0)
    rgb_dev = viz.plot_J_batch_device(res.J[None], valid_dev[None])[0]
    observed_fetch = res.observed if cfg.use_closed_form else None
    renders_only = cfg.artifacts == "renders"
    # undistorted export is computed host-side from J, but only for
    # DISTORTED targets (save_plots' branch is a no-op on pinhole) —
    # don't forfeit the renders-mode link win fetching J for nothing
    need_undist = cfg.undistort_output and target.dist_model != "none"
    J_fetch = None if renders_only and not need_undist else res.J
    params_noJ, J, observed, rec_u8, rgb_u8, tel = jax.device_get(
        (res.params._replace(J=None), J_fetch, observed_fetch, rec_dev, rgb_dev,
         res.telemetry)
    )
    res = res._replace(
        params=params_noJ._replace(
            J=J if J is not None and res.params.J is not None else None
        ),
        telemetry=tel,
    )
    valid = _export_mask(
        cfg, target_depth, None if observed is None else np.asarray(observed)
    )
    if J is not None:
        J = np.asarray(J, np.float32).copy()
        J[~valid] = np.nan

    artifacts = viz.save_plots(
        output_dir, target.name, res.params, J, valid, target.intrinsics,
        target_depth, reconstruction=np.asarray(rec_u8), rgb_plot=np.asarray(rgb_u8),
        dist=target.dist, dist_model=target.dist_model,
        undistort=cfg.undistort_output,
    )
    if not renders_only:
        params_out = (output_dir / target.name).with_suffix(
            "." + cfg.params_format
        )
        ckpt.save_params(params_out, res.params, J=J, valid=valid)
        artifacts.append(params_out)

    if use_h5 and not cfg.keep_matches:
        log(f"Erase {matches_path}.")
        matches_path.unlink(missing_ok=True)

    raw_rgb = image  # f32, already decoded for the J init in direct mode
    # closed-form mode skips the J init decode; the one extra decode here
    # (~ms) is noise against the fit it summarizes
    if raw_rgb is None:
        if cache is not None:
            raw_rgb = cache.get(target)[0]
        else:
            from sucre_tpu.io.images import load_rgb_raw

            raw_rgb = load_rgb_raw(target.rgb_path, target.width, target.height)

    return RestoreResult(
        image_name=target.name,
        params=res.params,
        J=J,
        valid=valid,
        telemetry=res.telemetry,
        n_obs=n_obs,
        artifacts=artifacts,
        timings=timings,
        metrics=_fit_metrics(res.telemetry, n_obs, rec_u8, raw_rgb, valid,
                             want_ssim=cfg.ssim_metric),
    )


class BatchInFlight(NamedTuple):
    """A dispatched (but not yet fetched) restore batch: all device work —
    matching, fit, reconstruction render, _rgb normalize, observation
    counts — is queued asynchronously; ``_fetch_batch`` blocks on the one
    batched device->host transfer and ``_export_batch`` writes artifacts.
    Splitting these phases lets ``restore_survey`` overlap batch k's
    transfer+export with batch k+1's device compute."""

    targets: list
    output_dir: Path
    cfg: RestoreConfig
    use_h5: bool
    depths: list  # host f32 target depth maps (export masks/artifacts)
    params_dev: SucreParams  # stacked device params (J leaf present in direct mode)
    J_fetch: jnp.ndarray  # device J in the export transfer dtype
    J_dev: jnp.ndarray  # device J, f32 (kept for block_until_ready)
    observed_fetch: jnp.ndarray | None  # only fetched in closed-form mode
    tel_dev: FitTelemetry
    recs_dev: jnp.ndarray  # (T, H, W, 3) u8 reconstruction renders
    rgbs_dev: jnp.ndarray  # (T, H, W, 3) u8 normalized restored images
    n_obs_dev: jnp.ndarray  # (T,) per-target observation counts
    target_rgbs: list  # host raw target RGBs (cache refs; recon_psnr)
    timings: dict


def _spatial_order(scene: Scene, names: list[str]) -> list[str]:
    """Order targets along the principal axis of their camera centers so
    consecutive batches hold spatially adjacent targets: per-batch
    surface culling then keeps only the views near THAT stretch of the
    survey — a transect given in alphabetical/arbitrary order culls as
    well as one given in traversal order. Purely a batching order:
    results are re-ordered to the input list by the callers, and each
    target's observation set is independent of its batch-mates (a
    kept-but-non-overlapping view produces no matches for it).
    """
    if len(names) <= 2:
        return names
    C = np.stack([scene[n].t for n in names]).astype(np.float64)
    C -= C.mean(axis=0)
    _, _, vt = np.linalg.svd(C, full_matrices=False)
    key = C @ vt[0]
    # SVD's sign is arbitrary: orient along the input's own direction so
    # an already-ordered list keeps its order
    if key[0] > key[-1]:
        key = -key
    order = np.argsort(key, kind="stable")
    return [names[i] for i in order]


def _empty_obs(height: int, width: int, light: bool) -> DenseObs:
    """An all-invalid single-view observation stack in the batch's layout
    (compact z without the light model, full cP with it) — the uniform
    placeholder for targets the matcher found nothing for."""
    valid = jnp.zeros((1, height, width), bool)
    I = jnp.zeros((1, height, width, 3), jnp.uint8)
    if light:
        return DenseObs(
            valid=valid, cP=jnp.zeros((1, height, width, 3), jnp.float32), I=I
        )
    return DenseObs(
        valid=valid, cP=None, I=I, z=jnp.zeros((1, height, width), jnp.float32)
    )


def _device_target_arrays(device_views, targets):
    """Slice the targets' raw depth/RGB stacks from the device-resident
    survey stack (targets are themselves survey views): zero host->device
    traffic for the matching inputs, the render depths and the J init
    images. Returns (depths_u16 (T,H,W), rgbs_u8 (T,H,W,3)) device
    arrays, or None when any target is not resident (e.g. excluded from
    pairing by --filter-images-path, or multi-bucket stacks)."""
    if device_views is None or len(device_views.buckets) != 1:
        return None
    b = device_views.buckets[0]
    name_to_idx = {v.name: i for i, v in enumerate(b["views"])}
    if any(t.name not in name_to_idx for t in targets):
        return None
    jidx = jnp.asarray(np.asarray([name_to_idx[t.name] for t in targets], np.int32))
    return (
        jnp.take(b["depths"], jidx, axis=0),
        jnp.take(b["rgbs"], jidx, axis=0),
    )


_LINK_RTT_S: float | None = None
_LINK_RTT_PROBES: int = 0


def _link_rtt() -> float:
    """Device round-trip latency (seconds): min of 3 tiny device_gets,
    self-correcting across routing decisions. Distinguishes directly-
    attached devices (~0.1 ms) from tunneled/remote ones (~30 ms+): the
    chunked matching route's host-driven dispatch chain is cheap on the
    former and ruinous on the latter, so the routing margin adapts.

    A measurement taken while device work is queued can only OVERSTATE
    the RTT (the gets flush the queue) — which routes conservatively
    (survey program over chunked), never dangerously. To recover from a
    GROSSLY contaminated first sample (>= 200 ms: a real tunnel RTT is
    ~30 ms, so a reading that high means multi-second queued work was
    flushed), re-probe on up to two later routing decisions and keep
    the process-wide MIN. Plausible high-RTT readings (5-200 ms) are
    trusted WITHOUT re-probing: a mid-survey probe must drain the
    in-flight batch before sampling — exactly the pipelining stall the
    slow links this matters on cannot afford — and on a genuinely slow
    link it learns nothing. Low-RTT classifications are already correct
    (queued work can't make a slow link look fast). Set
    SUCRE_CHUNKED_ROUTE_FACTOR explicitly to bypass the measurement
    entirely."""
    global _LINK_RTT_S, _LINK_RTT_PROBES
    if _LINK_RTT_S is None or (_LINK_RTT_S >= 0.2 and _LINK_RTT_PROBES < 3):
        import time as _time

        x = jnp.zeros(())
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            jax.device_get(x)
            best = min(best, _time.perf_counter() - t0)
        _LINK_RTT_S = best if _LINK_RTT_S is None else min(_LINK_RTT_S, best)
        _LINK_RTT_PROBES += 1
    return _LINK_RTT_S


def dispatch_survey_batch(
    scene: Scene,
    image_names: list[str],
    output_dir: Path,
    cfg: RestoreConfig,
    image_list: list[View],
    cache: ViewCache,
    device_views: "DeviceViews | None" = None,
    mesh=None,
    log=lambda s: None,
) -> BatchInFlight:
    """Queue one batch's full device pipeline (match -> fit -> export
    arrays) without any host synchronization.

    Public API: the device-compute half of ``restore_survey``'s pipelined
    loop, exposed so callers (and ``bench.py``'s device-only phase) can
    measure or overlap pure device work. Sync by fetching any scalar from
    the returned ``BatchInFlight`` (e.g. ``J_dev[0, 0, 0, 0]``);
    ``block_until_ready`` is unreliable on high-latency tunnels."""
    from sucre_tpu.parallel.batch import fit_many, stack_obs, stack_params

    timings: dict[str, float] = {}
    t_stage = time.perf_counter()

    def mark(name: str) -> None:
        nonlocal t_stage
        now = time.perf_counter()
        timings[name] = now - t_stage
        t_stage = now

    targets = [scene[name] for name in image_names]
    dims = {(t.width, t.height) for t in targets}
    if len(dims) != 1:
        raise ValueError(f"restore_many requires same-dimension targets, got {dims}")
    if (
        mesh is not None
        and "view" not in mesh.axis_names
        and len(targets) % mesh.devices.shape[0] != 0
    ):
        # the batch axis must divide evenly across its mesh shards; a
        # ragged (usually final) batch runs unsharded rather than failing
        # ((view x row) meshes don't shard the target axis — exempt)
        log(
            f"Batch of {len(targets)} not divisible by the "
            f"{mesh.devices.shape[0]}-way batch mesh; running unsharded."
        )
        mesh = None

    use_h5 = cfg.store == "hdf5"
    matches_files: list[MatchesFile | None] = []
    to_match: list[int] = []
    obs_list: list[DenseObs | None] = [None] * len(targets)
    for ti, target in enumerate(targets):
        mf = None
        if use_h5:
            matches_path = (output_dir / target.name).with_suffix(".h5")
            mf = MatchesFile(matches_path, overwrite=cfg.force_compute_matches)
            if mf.discard_if_incomplete():
                get_logger().warning(
                    "Discarding incomplete matches cache %s "
                    "(interrupted run).", matches_path,
                )
            if mf.exists():
                log(f"Load {target.name} matches from cache.")
                mf.check_integrity()
                mf.check_color_sampling(cfg.bilinear_colors)
                mf.check_grid(target.height, target.width)
                obs_cached, _ = mf.load_dense(
                    scene, target.height, target.width,
                    compact=not cfg.light_model,
                )
                obs_list[ti] = obs_cached
                mf = None  # already populated; don't re-save
            else:
                to_match.append(ti)
        else:
            to_match.append(ti)
        matches_files.append(mf)

    # Surface-overlap culling: drop views whose observed-surface AABB
    # cannot intersect any target's (zero possible matches; see
    # ops/culling.py). Big win on long survey transects.
    culled_list = image_list
    tile_rects = None  # per-to_match-target {view name: target rect}
    if cfg.frustum_cull and to_match:
        from sucre_tpu.ops.culling import cull_views

        t_aabbs = [cache.aabb(targets[ti]) for ti in to_match]
        v_aabbs = [cache.aabb(v) for v in image_list]
        if cfg.cull_tiles > 1:
            # tile-granular: per-(target, view) rectangles; a view is
            # kept when ANY target can reach it (the chunked matcher then
            # skips per-target pairings with empty rects — finer than the
            # whole-survey keep mask)
            from sucre_tpu.ops.culling import surface_tile_aabbs, tile_view_rects

            rect_lists = []
            for ti in to_match:
                t = targets[ti]
                tiles = surface_tile_aabbs(
                    cache.get(t)[1], t.intrinsics, t.R, t.t,
                    n_tiles=cfg.cull_tiles,
                    dist=t.dist, dist_model=t.dist_model,
                )
                rect_lists.append(tile_view_rects(
                    tiles, v_aabbs, t.height, t.width, n_tiles=cfg.cull_tiles
                ))
            keep_mask = np.asarray([
                any(rl[i][1] > rl[i][0] for rl in rect_lists)
                for i in range(len(image_list))
            ])
            tile_rects = [
                {
                    v.name: rl[i]
                    for i, (v, k) in enumerate(zip(image_list, keep_mask)) if k
                }
                for rl in rect_lists
            ]
        else:
            keep_mask = cull_views(t_aabbs, v_aabbs)
        culled_list = [v for v, k in zip(image_list, keep_mask) if k]
        if not culled_list:
            # every target has an empty observed surface (e.g. all-zero
            # depth maps): keep one view so the matching machinery runs
            # with valid shapes — it produces zero observations and the
            # targets are skipped at export with a logged error
            culled_list = image_list[:1]
            tile_rects = None
        if len(culled_list) < len(image_list):
            log(f"Surface cull: {len(culled_list)}/{len(image_list)} views kept.")

    dev_t = _device_target_arrays(device_views, targets)
    # target depth stack + intrinsics, shared by matching and the render
    # (uploaded/stacked at most once per batch)
    t_depth_stack = dev_t[0] if dev_t is not None else None
    t_intrs_np = np.stack([t.intrinsics for t in targets]).astype(np.float32)
    from sucre_tpu.ops.distortion import resolve_dist_model

    # target-camera distortion (the batched render + survey program tags)
    t_tag = resolve_dist_model(t.dist_model for t in targets)
    t_dists_dev = (
        None if t_tag == "none"
        else jnp.asarray(np.stack([t.dist for t in targets]).astype(np.float32))
    )

    def target_depth_stack():
        nonlocal t_depth_stack
        if t_depth_stack is None:
            t_depth_stack = jnp.asarray(
                _stack_depths([cache.get(t)[1] for t in targets])
            )
        return t_depth_stack

    stacked_obs = None
    if to_match:
        # Fast path: the whole matching stage as ONE device program over
        # the resident survey stack — no chunk dispatch chain, no host
        # round-trips, output already in the (T, V, H, W) batched layout.
        # Needs: a resident single-bucket stack, no per-pair h5 saving,
        # and every target freshly matched.
        # Transient HBM of the single program scales with T*V*H*W
        # (~45 B/pixel-pair measured); past the cap, fall back to the
        # chunked path, whose unfiltered-output transient is bounded at
        # ~window(4) * T*match_chunk*H*W on top of the kept stacks.
        # V is the post-cull view count padded to the match_chunk
        # granularity — what the program actually runs with (a culled
        # transect fits the single program even when the full survey
        # wouldn't).
        max_pairs = int(os.environ.get("SUCRE_SURVEY_MAX_PAIRS", 250_000_000))
        # A (view x row) mesh shards the survey program — view tables
        # V/vs per chip, the observation stack (T, V, H, W) over both
        # axes — so the pair budget scales with the mesh size: surveys
        # whose stacks exceed ONE chip's HBM run as one multi-chip
        # program instead of the host-driven chunk-dispatch fallback
        # (the SURVEY §5 views-axis scaling story; GSPMD materializes
        # the cross-chip view-block movement as ICI collectives — the
        # compiler-scheduled form of ring rotation).
        vr_mesh = (
            mesh if mesh is not None and "view" in mesh.axis_names else None
        )
        pair_budget = max_pairs * (vr_mesh.size if vr_mesh is not None else 1)
        t0_ = targets[0]
        n_views_eff = -(-len(culled_list) // cfg.match_chunk) * cfg.match_chunk
        n_pairs = len(targets) * n_views_eff * t0_.width * t0_.height
        use_survey = (
            device_views is not None
            and len(device_views.buckets) == 1
            and len(to_match) == len(targets)
            and all(matches_files[ti] is None for ti in to_match)
            and {v.name for v in device_views.buckets[0]["views"]}
            == {v.name for v in image_list}
            and n_pairs <= pair_budget
        )
        # Partial-overlap routing. The shared-table program matches every
        # target against the culled-UNION view stack, so per-target
        # culling never applies there. Two better routes exist:
        #   1. PER-TARGET VIEW LISTS (match_survey_indexed): each target
        #      matches only its own surviving views via flat-index
        #      gathers over the shared stack — pairs drop from
        #      T x V_union to T x max_t(V_t) with still exactly ONE
        #      device program (no host dispatch chain; immune to link
        #      round-trip latency).
        #   2. CHUNKED with per-(target, chunk) tile RECTANGLES: cuts
        #      gather rows below whole-view granularity, but pays a
        #      host-driven dispatch chain per batch — measured 0.91
        #      s/batch on a low-latency session and 2.5 s/batch on a
        #      high-RTT one at the same shape (probe_transect_r4) — so
        #      it must predict a LARGE cut to be worth the risk.
        pt_keep: list[list[str]] | None = None
        if use_survey and vr_mesh is None and tile_rects is not None:
            kept_lists = []
            for rl in tile_rects:
                kept_lists.append([
                    v.name for v in culled_list
                    if (r := rl.get(v.name)) is not None and r[1] > r[0]
                ])
            vmax = max((len(k) for k in kept_lists), default=0)
            vmax_p = _pt_pad_views(vmax, cfg.match_chunk)
            # Per-pair-distinct-table gathers run at ~45M rows/s where
            # the uniform shared program reaches ~81M (measured r5 on
            # coherent transect content: the shared T x V structure
            # re-reads each view's table with T index planes — reuse the
            # per-target pair list can't express). The per-target route
            # must therefore cut PAIRS by more than the rate ratio to
            # win wall-clock, not merely run fewer of them.
            _pt_rate = float(os.environ.get("SUCRE_PT_RATE_FACTOR", "1.8"))
            use_pt = (
                os.environ.get("SUCRE_PER_TARGET_SURVEY", "1") != "0"
                and vmax_p * _pt_rate < n_views_eff
                and len(targets) * vmax_p * t0_.width * t0_.height
                <= pair_budget
                # flat-index gather addressing (see match_survey_indexed)
                # needs the (culled, padded) union stack in int32 range
                and n_views_eff * t0_.width * t0_.height < 2**31
            )
            baseline_views = vmax_p if use_pt else n_views_eff
            baseline_pairs = (
                len(targets) * baseline_views * t0_.width * t0_.height
            )
            est = _est_chunked_pairs(
                tile_rects, culled_list, cfg.match_chunk,
                t0_.height, t0_.width,
            )
            # Link-adaptive margin: on a directly-attached device the
            # chunked route's dispatch chain costs ~nothing, so a modest
            # predicted cut already wins (0.9); over a high-latency link
            # (tunneled/remote device) each batch pays ~24 dispatches +
            # count-fetch round trips whose cost swamps borderline cuts
            # (measured: a 0.53-ratio batch at 1.3 s via the shared
            # program vs ~4 s chunked on a bad-RTT session), so demand a
            # 2.5x predicted cut (0.4). Env override wins.
            env_factor = os.environ.get("SUCRE_CHUNKED_ROUTE_FACTOR")
            if env_factor is not None:
                factor = float(env_factor)
            else:
                factor = 0.9 if _link_rtt() < 0.005 else 0.4
            if est < factor * baseline_pairs:
                log(
                    f"Tile-cull routing: rectangles predict "
                    f"{est / 1e6:.0f}M of the survey program's "
                    f"{baseline_pairs / 1e6:.0f}M gather rows "
                    f"({est / max(baseline_pairs, 1):.2f}x) — chunked path."
                )
                use_survey = False
            elif use_pt:
                pt_keep = kept_lists
                log(
                    f"Per-target view lists: {vmax_p} of "
                    f"{n_views_eff} union views per target."
                )
        if use_survey:
            from sucre_tpu.ops.matching import match_survey

            b = device_views.buckets[0]
            # one static tag for the whole survey program; a per-camera
            # (target_tag, view_tag) tuple when the sides' models differ
            # (each side's vector stack rides only when that side is
            # distorted — match_survey gates the extras per side)
            from sucre_tpu.ops.distortion import pair_tag

            survey_tag = pair_tag(t_tag, b["dist_model"])
            v_dists = b["dists"]
            arrays = (b["depths"], b["rgbs"], b["intrs"], b["Rs"], b["ts"])
            if v_dists is not None:
                arrays = arrays + (v_dists,)
            sel_names = [v.name for v in b["views"]]
            if len(culled_list) < len(image_list):
                # device-side selection of surviving views, padded to the
                # match_chunk granularity (bounds recompiles); padded rows
                # have zero depth => no matches. The per-target flat-
                # index route also addresses this CULLED union (not the
                # full resident stack): its in-program packed-record
                # table — u32x2 per pixel, plus an f32 RGB copy under
                # bilinear — is a per-batch HBM transient that must stay
                # bounded by the union, or surveys near the resident
                # budget would OOM on the repack of views no batch
                # target can reach.
                kept_names_set = {v.name for v in culled_list}
                idx = [
                    i for i, v in enumerate(b["views"]) if v.name in kept_names_set
                ]
                sel_names = [b["views"][i].name for i in idx]
                pad = (-len(idx)) % cfg.match_chunk
                jidx = jnp.asarray(np.asarray(idx, np.int32))
                arrays = tuple(
                    jnp.pad(
                        jnp.take(a, jidx, axis=0),
                        [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                    )
                    for a in arrays
                )
            v_dists = arrays[5] if len(arrays) > 5 else None
            arrays = arrays[:5]
            pt_idx_dev = None
            if pt_keep is not None:
                # Per-target view-id array into the CULLED union stack:
                # slot (t, s) holds the stack index of target t's s-th
                # kept view, sentinel V for pad slots (no matches). The
                # matching program gathers records at flat index
                # vid*H2*W2 + pixel — no (T, vmax) table copies (the old
                # materialized-tables route measured 1.40x slower at
                # identical shapes; see match_survey_indexed).
                pos = {n: i for i, n in enumerate(sel_names)}
                V_arr = arrays[0].shape[0]
                # vmax_p is in scope from the routing block above
                # (pt_keep non-None implies it ran on these kept lists)
                idx_np = np.full((len(targets), vmax_p), V_arr, np.int32)
                for ti, names in enumerate(pt_keep):
                    for j, n in enumerate(names):
                        idx_np[ti, j] = pos[n]
                pt_idx_dev = jnp.asarray(idx_np)
            dist_kw = dict(
                t_dists=t_dists_dev, v_dists=v_dists, dist_model=survey_tag,
            )
            t_Rs_dev = jnp.asarray(np.stack([t.R for t in targets]).astype(np.float32))
            t_ts_dev = jnp.asarray(np.stack([t.t for t in targets]).astype(np.float32))
            if vr_mesh is not None:
                from sucre_tpu.parallel import match_survey_sharded

                log(
                    f"Compute matches for {len(targets)} targets "
                    f"(sharded survey program over {arrays[0].shape[0]} views "
                    f"on the {dict(vr_mesh.shape)} mesh)."
                )
                stacked_obs = match_survey_sharded(
                    vr_mesh,
                    target_depth_stack(), jnp.asarray(t_intrs_np),
                    t_Rs_dev, t_ts_dev, *arrays,
                    min_cover=cfg.min_cover,
                    compact=not cfg.light_model,
                    bilinear=cfg.bilinear_colors,
                    **dist_kw,
                )
                # crop row padding back to the target grid (padded views
                # stay: they are invalid and contribute nothing)
                H0 = t0_.height
                if stacked_obs.valid.shape[2] != H0:
                    stacked_obs = jax.tree.map(
                        lambda x: x[:, :, :H0], stacked_obs
                    )
            elif pt_keep is not None:
                from sucre_tpu.ops.matching import match_survey_indexed

                log(
                    f"Compute matches for {len(targets)} targets "
                    f"(one survey program, per-target view lists of "
                    f"{pt_idx_dev.shape[1]} over the "
                    f"{arrays[0].shape[0]}-view stack)."
                )
                stacked_obs = match_survey_indexed(
                    target_depth_stack(),
                    jnp.asarray(t_intrs_np),
                    t_Rs_dev,
                    t_ts_dev,
                    *arrays,
                    pt_idx_dev,
                    jnp.float32(cfg.min_cover),
                    compact=not cfg.light_model,
                    bilinear=cfg.bilinear_colors,
                    **dist_kw,
                )
            else:
                log(
                    f"Compute matches for {len(targets)} targets "
                    f"(one survey program over {arrays[0].shape[0]} views)."
                )
                stacked_obs = match_survey(
                    target_depth_stack(),
                    jnp.asarray(t_intrs_np),
                    t_Rs_dev,
                    t_ts_dev,
                    *arrays,
                    jnp.float32(cfg.min_cover),
                    compact=not cfg.light_model,
                    bilinear=cfg.bilinear_colors,
                    **dist_kw,
                )
        else:
            log(f"Compute matches for {len(to_match)} targets (shared view stack).")
            dense, _ = match_targets_shared(
                [targets[ti] for ti in to_match],
                culled_list,
                cache,
                min_cover=cfg.min_cover,
                match_chunk=cfg.match_chunk,
                matches_files=[matches_files[ti] for ti in to_match],
                compact=not cfg.light_model,
                bilinear=cfg.bilinear_colors,
                # culling removed views: compact the resident stacks on
                # device (zero image H2D) instead of streaming the kept
                # subset from the host cache
                device_views=(
                    device_views.subset(culled_list)
                    if device_views is not None else None
                ),
                window=cfg.match_window,
                view_rects=tile_rects,
                log=log,
            )
            for k, ti in enumerate(to_match):
                obs_list[ti] = dense[k]

    # J init images: slice+convert from the device-resident stack when
    # possible (skips ~6 MB/target of f32 host->device upload per batch)
    images_dev = None
    if dev_t is not None and not cfg.use_closed_form:
        from sucre_tpu.ops.matching import to_f32_rgb

        images_dev = to_f32_rgb(dev_t[1])
    depths, params_list = [], []
    for ti, target in enumerate(targets):
        if stacked_obs is None and obs_list[ti] is None:
            # the chunked matcher returns None for observationless /
            # below-min-cover targets: keep the batch uniform with an
            # empty stack — the zero count skips (and logs) the target
            # at export without killing the rest of the survey
            obs_list[ti] = _empty_obs(
                target.height, target.width, cfg.light_model
            )
        depths.append(depth_to_f32(cache.get(target)[1]))
        image = None
        if not cfg.use_closed_form:
            image = (
                images_dev[ti]
                if images_dev is not None
                else rgb_to_f32(cache.get(target)[0])
            )
        p = init_params(
            image=image, light_model=cfg.light_model, use_closed_form=cfg.use_closed_form
        )
        if cfg.params_path is not None:
            p = ckpt.load_params(cfg.params_path, p)
        params_list.append(p)

    log(f"Batched fit of {len(targets)} targets ({cfg.num_iter} iterations"
        f"{', joint globals' if cfg.joint_params else ''}).")
    mark("match_dispatch")  # async dispatch; device matching time folds into fit_batch
    so = stacked_obs if stacked_obs is not None else stack_obs(obs_list)
    fit_cfg = FitConfig(
        lr=cfg.lr, num_iter=cfg.num_iter, use_closed_form=cfg.use_closed_form,
        view_chunk=cfg.batch_size,
        stop_tol=cfg.stop_tol, stop_check=cfg.stop_check,
    )
    if cfg.joint_params:
        from sucre_tpu.parallel.joint import JointParams, fit_joint

        p0 = params_list[0]
        jp = JointParams(
            B=p0.B, beta=p0.beta, gamma=p0.gamma,
            J=None if p0.J is None else jnp.stack([p.J for p in params_list]),
            cam2light=p0.cam2light, sigma=p0.sigma,
        )
        jparams, J, observed, tel = fit_joint(jp, so, fit_cfg, mesh=mesh)
        # broadcast the shared globals into per-target param stacks so the
        # export path below is uniform
        T = len(targets)
        params = SucreParams(
            B=jnp.tile(jparams.B, (T, 1)), beta=jnp.tile(jparams.beta, (T, 1)),
            gamma=jnp.tile(jparams.gamma, (T, 1)), J=jparams.J,
            cam2light=None if jparams.cam2light is None else jnp.tile(jparams.cam2light, (T, 1)),
            sigma=None if jparams.sigma is None else jnp.tile(jparams.sigma, (T, 1, 1)),
        )
    else:
        params, J, observed, tel = fit_many(
            stack_params(params_list),
            so,
            fit_cfg,
            mesh=mesh,
        )
    # Dispatch the batched reconstruction renders while J is still
    # device-resident (re-uploading the fetched J would double the link
    # traffic); everything below stays asynchronous — one batched
    # device->host transfer in _fetch_batch moves params, J (f16),
    # telemetry, u8 renders and observation counts together.
    from sucre_tpu.ops.matching import to_f32_depth

    t_depths_dev = to_f32_depth(target_depth_stack())
    valid_dev = (
        observed.astype(bool) if cfg.use_closed_form else t_depths_dev > 0
    )
    renders_only = cfg.artifacts == "renders"
    recon_on_device = cfg.reconstruction_on_device
    if recon_on_device is None:
        recon_on_device = True
    recon_on_device = recon_on_device or cfg.light_model  # host render is no-light only
    # renders-only export never fetches J, so host renders (which read
    # the fetched J) are impossible — force both u8 renders on device
    recon_on_device = recon_on_device or renders_only
    recs_dev = None
    if recon_on_device:
        recs_dev = viz.render_reconstruction_batch_device(
            params._replace(J=None),
            J,
            jnp.asarray(t_intrs_np),
            t_depths_dev,
            dists_dev=t_dists_dev, dist_model=t_tag,
        )
        # Export validity on device (parity: _export_mask); export-invalid
        # pixels of the reconstruction render black (the reference's
        # NaN-carrying J NaN-propagates; our J is zero-filled at unobserved
        # pixels, which would otherwise render pure backscatter).
        recs_dev = jnp.where(valid_dev[..., None], recs_dev, 0)
    rgbs_dev = None
    if cfg.rgb_plot_on_device is None or cfg.rgb_plot_on_device or renders_only:
        rgbs_dev = viz.plot_J_batch_device(J, valid_dev)
    if stacked_obs is not None:
        n_obs_dev = stacked_obs.valid.sum(
            axis=tuple(range(1, stacked_obs.valid.ndim))
        )
    else:
        n_obs_dev = jnp.stack([o.valid.sum() for o in obs_list])
    if renders_only and not (cfg.undistort_output and t_tag != "none"):
        # the PNGs are already u8 device arrays; J never crosses the
        # link. The one J consumer left is the host-side undistorted
        # export, which only exists for DISTORTED targets (t_tag) —
        # --undistort-output on a pinhole batch must not forfeit the
        # renders-mode link win.
        J_fetch = None
    else:
        J_fetch = J.astype(jnp.float16) if cfg.export_dtype == "f16" else J
    mark("fit_dispatch")
    return BatchInFlight(
        targets=targets,
        output_dir=output_dir,
        cfg=cfg,
        use_h5=use_h5,
        depths=depths,
        params_dev=params,
        J_fetch=J_fetch,
        J_dev=J,
        # the observed mask is only consumed in closed-form mode — skip
        # its transfer otherwise
        observed_fetch=observed if cfg.use_closed_form else None,
        tel_dev=tel,
        recs_dev=recs_dev,
        rgbs_dev=rgbs_dev,
        n_obs_dev=n_obs_dev,
        target_rgbs=[cache.get(t)[0] for t in targets],
        timings=timings,
    )


# Deprecated round-2 private names; remove after round 3.
_BatchInFlight = BatchInFlight
_dispatch_batch = dispatch_survey_batch


def _fetch_batch(b: BatchInFlight):
    """The one blocking device->host transfer for a dispatched batch."""
    params_noJ, J, observed, tel, recs, rgb_plots, n_obs_arr = jax.device_get(
        (
            b.params_dev._replace(J=None), b.J_fetch, b.observed_fetch,
            b.tel_dev, b.recs_dev, b.rgbs_dev, b.n_obs_dev,
        )
    )
    n_obs_list = [int(x) for x in np.asarray(n_obs_arr)]
    if J is not None:
        J = np.asarray(J, np.float32)
    params = params_noJ._replace(
        J=J if J is not None and b.params_dev.J is not None else None
    )
    if recs is not None:
        recs = np.asarray(recs)  # (T, H, W, 3) uint8, written to PNG as-is
    return params, J, observed, tel, recs, rgb_plots, n_obs_list


def _export_batch(b: BatchInFlight, fetched) -> list[RestoreResult]:
    """Write one batch's artifact set (host-only; threads over targets).

    Zero-observation targets (empty/bad depth map, or min_cover filtered
    everything) are SKIPPED with a logged error instead of killing the
    whole survey — the result list simply lacks them (the single-target
    ``restore_image`` path still raises, reference parity). Their .h5
    caches, if any, are left in place for inspection.
    """
    params, J, observed, tel, recs, rgb_plots, n_obs_list = fetched
    cfg, targets, output_dir = b.cfg, b.targets, b.output_dir

    keep = [t for t in range(len(targets)) if n_obs_list[t] > 0]
    if len(keep) < len(targets):
        logger = get_logger()
        for t in range(len(targets)):
            if n_obs_list[t] == 0:
                logger.error(
                    "No observations for %s; target skipped (not restored).",
                    targets[t].name,
                )

    def export_one(t: int) -> RestoreResult:
        target = targets[t]
        p_t = jax.tree.map(lambda x: x[t], params)
        valid = _export_mask(
            cfg, b.depths[t], None if observed is None else np.asarray(observed[t])
        )
        if J is None:  # renders-only export: J never left the device
            J_t = None
        else:
            J_t = np.asarray(J[t], np.float32).copy()
            J_t[~valid] = np.nan
        if recs is None:
            # host render from the already-fetched J (its u8 device
            # transfer skipped; runs inside the overlapped exporter)
            rec_t = viz.render_reconstruction_host(
                p_t, J[t], target.intrinsics, b.depths[t],
                dist=target.dist, dist_model=target.dist_model,
            )
            rec_t[~valid] = 0
        else:
            rec_t = recs[t]
        artifacts = viz.save_plots(
            output_dir, target.name, p_t, J_t, valid, target.intrinsics, b.depths[t],
            reconstruction=rec_t,
            rgb_plot=None if rgb_plots is None else rgb_plots[t],
            dist=target.dist, dist_model=target.dist_model,
            undistort=cfg.undistort_output,
        )
        if cfg.artifacts != "renders":
            params_out = (output_dir / target.name).with_suffix(
                "." + cfg.params_format
            )
            ckpt.save_params(params_out, p_t, J=J_t, valid=valid)
            artifacts.append(params_out)
        if b.use_h5 and not cfg.keep_matches:
            (output_dir / target.name).with_suffix(".h5").unlink(missing_ok=True)
        tel_t = FitTelemetry(
            cost=np.asarray(tel.cost[:, t]), B=np.asarray(tel.B[:, t]),
            beta=np.asarray(tel.beta[:, t]), gamma=np.asarray(tel.gamma[:, t]),
        )
        return RestoreResult(
            image_name=target.name, params=p_t, J=J_t, valid=valid,
            telemetry=tel_t, n_obs=n_obs_list[t],
            artifacts=artifacts, timings=dict(b.timings),
            metrics=_fit_metrics(tel_t, n_obs_list[t], rec_t,
                                 b.target_rgbs[t], valid,
                                 want_ssim=cfg.ssim_metric),
        )

    # Export targets concurrently: PNG/npz encode is host-bound.
    import concurrent.futures as cf

    if len(keep) > 1:
        with cf.ThreadPoolExecutor(max_workers=min(4, len(keep))) as pool:
            return list(pool.map(export_one, keep))
    return [export_one(t) for t in keep]


def _warn_dropped_batched_config(cfg: RestoreConfig) -> None:
    """The batched fit runs all iterations inside one device program, so
    the per-iteration host callbacks behind ``save_interval`` (artifact
    snapshots, sucre.py:153-154) and ``checkpoint_interval`` (mid-fit
    solver resume) have no hook on this path. The CLI guards itself by
    falling back to the sequential path (cli.py); library callers get an
    explicit warning instead of a silent config drop — use
    ``restore_image`` when those features matter."""
    dropped = [
        n for n in ("save_interval", "checkpoint_interval") if getattr(cfg, n)
    ]
    if dropped:
        import warnings

        warnings.warn(
            f"restore_many/restore_survey ignore {' and '.join(dropped)}: "
            f"the batched fit has no per-iteration host callbacks. Use "
            f"restore_image (sequential) for snapshots or mid-fit "
            f"checkpoints.",
            UserWarning,
            stacklevel=3,
        )


def restore_many(
    scene: Scene,
    image_names: list[str],
    output_dir: Path | str,
    cfg: RestoreConfig | None = None,
    image_list: list[View] | None = None,
    mesh=None,
    cache: ViewCache | None = None,
    device_views: "DeviceViews | None" = None,
) -> list[RestoreResult]:
    """Restore a batch of same-dimension targets in one device program.

    Replaces the reference's sequential per-target loop (sucre.py:243-261)
    for ``--image-list``-style jobs: views are decoded once into a shared
    cache, each target's observation stack is built on device, and the T
    fits run batched (optionally sharded over a device mesh — one image
    per chip). Per-target artifacts and cache lifecycle match
    ``restore_image``. For many batches prefer ``restore_survey``, which
    overlaps the host transfer/export of one batch with the device
    compute of the next.
    """
    cfg = cfg or RestoreConfig()
    _warn_dropped_batched_config(cfg)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = get_logger()
    log = logger.info if cfg.verbose else (lambda *a, **k: None)

    if image_list is None:
        image_list = scene.view_list()
    if cache is None:
        cache = ViewCache()
        cache.prefill(
            image_list, num_workers=cfg.num_workers,
            processes=cfg.decode_processes,
        )

    # Order-preserving dedup (same rule as restore_survey): duplicates in
    # one batch would collide on the shared .h5 cache. The returned list
    # still mirrors the input (duplicates share one result).
    requested = list(image_names)
    seen: set[str] = set()
    image_names = []
    for name in requested:
        v = scene[name]
        if v.name in seen:
            continue
        seen.add(v.name)
        image_names.append(name)

    b = dispatch_survey_batch(
        scene, image_names, output_dir, cfg, image_list, cache, device_views,
        mesh, log,
    )
    t0 = time.perf_counter()
    # tiny scalar fetch: block_until_ready does not reliably block on
    # tunneled devices (CLAUDE.md), which would misattribute the device
    # time to fetch_render
    np.asarray(jax.device_get(b.J_dev[0, 0, 0, 0]))
    b.timings["fit_batch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetched = _fetch_batch(b)
    b.timings["fetch_render"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = _export_batch(b, fetched)
    b.timings["export"] = time.perf_counter() - t0
    by_name = {r.image_name: r._replace(timings=dict(b.timings)) for r in results}
    # zero-observation targets were skipped with a logged error — the
    # result list simply lacks them (same contract as restore_survey)
    return [by_name[scene[n].name] for n in requested if scene[n].name in by_name]


def restore_survey(
    scene: Scene,
    image_names: list[str],
    output_dir: Path | str,
    cfg: RestoreConfig | None = None,
    image_list: list[View] | None = None,
    batch_targets: int = 4,
    mesh=None,
    cache: ViewCache | None = None,
    device_views: "DeviceViews | None" = None,
) -> list[RestoreResult]:
    """Restore a whole survey: targets grouped by camera dimensions,
    batched ``batch_targets`` at a time, with software pipelining — while
    batch k's results cross the (slow) device->host link and its PNGs
    encode, batch k+1's matching and fit already run on device. Steady
    state is max(device, host) per batch instead of their sum."""
    import concurrent.futures as cf

    cfg = cfg or RestoreConfig()
    _warn_dropped_batched_config(cfg)
    if cfg.rgb_plot_on_device is None:
        # pipelined: host normalize in the exporter thread beats paying
        # for the extra u8 image transfer on the serialized device link
        cfg = dataclasses.replace(cfg, rgb_plot_on_device=False)
    if cfg.reconstruction_on_device is None:
        # same trade: render from the fetched J in the exporter thread
        cfg = dataclasses.replace(cfg, reconstruction_on_device=False)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = get_logger()
    log = logger.info if cfg.verbose else (lambda *a, **k: None)

    if image_list is None:
        image_list = scene.view_list()
    if cache is None:
        cache = ViewCache()
        cache.prefill(
            image_list, num_workers=cfg.num_workers,
            processes=cfg.decode_processes,
        )
    if device_views is None:
        resident = sum(5 * v.width * v.height for v in image_list)
        budget = int(os.environ.get(
            "SUCRE_RESIDENT_BYTES", 12 * 1024 ** 3  # ~16 GB v5e minus
            # headroom for the matching/fit transients
        ))
        if resident <= budget:
            device_views = DeviceViews(image_list, cache, cfg.match_chunk)
        else:
            # surveys past device HBM stream chunks from the host cache
            # (match_targets_shared's cacheless path) instead of crashing
            # in the upload; raise SUCRE_RESIDENT_BYTES on larger chips
            logger.warning(
                f"Survey stack (~{resident / 1e9:.1f} GB raw) exceeds the "
                f"device-residency budget ({budget / 1e9:.1f} GB, "
                f"SUCRE_RESIDENT_BYTES); matching will stream view chunks "
                f"from the host cache."
            )

    from sucre_tpu.ops.distortion import stack_class

    # Target batches group by camera dimensions AND stack class: a batch's
    # targets share one stacked program, and fisheye targets cannot stack
    # with pinhole/rational ones (mixed rigs restore as separate batches
    # over the same resident view stacks).
    groups: dict[tuple, list[str]] = {}
    # Order-preserving dedup: a name listed twice restores once (identical
    # artifacts either way; duplicates in one batch would collide on the
    # shared .h5 cache) — the result list below still mirrors the input.
    seen: set[str] = set()
    for name in image_names:
        v = scene[name]
        if v.name in seen:
            continue
        seen.add(v.name)
        groups.setdefault((v.width, v.height, stack_class(v.dist_model)), []).append(name)
    batches: list[list[str]] = []
    for names in groups.values():
        batches.extend(batched(_spatial_order(scene, names), batch_targets))

    if cfg.joint_params and len(batches) > 1:
        # Joint semantics are ONE shared water model across ALL targets;
        # fitting per batch would silently produce several models. The
        # CLI raises batch_targets to the target count automatically —
        # library callers must do the same (and joint cannot span
        # mixed-dimension / mixed-lens-class target groups, which can
        # never share one stacked program).
        raise ValueError(
            f"joint_params fits one shared water model across ALL targets, "
            f"which requires a single batch — got {len(batches)} batches "
            f"({'mixed target dims/lens classes' if len(groups) > 1 else f'batch_targets={batch_targets} < {len(seen)} targets'}). "
            f"Raise batch_targets to cover every target; for HBM, shard "
            f"the stack over a (view x row) mesh (--shard-mode view-row)."
        )

    results: list[RestoreResult] = []

    def fetch_timed(b: BatchInFlight):
        t0 = time.perf_counter()
        fetched = _fetch_batch(b)
        b.timings["fetch_render"] = time.perf_counter() - t0
        return fetched

    def export_timed(b: BatchInFlight, fetched):
        t0 = time.perf_counter()
        out = _export_batch(b, fetched)
        dt = time.perf_counter() - t0
        return [r._replace(timings={**r.timings, "export": dt}) for r in out]

    with cf.ThreadPoolExecutor(max_workers=1) as exporter:
        prev: BatchInFlight | None = None
        export_future = None
        try:
            for group in batches:
                cur = dispatch_survey_batch(
                    scene, list(group), output_dir, cfg, image_list, cache,
                    device_views, mesh, log,
                )
                if prev is not None:
                    fetched = fetch_timed(prev)  # overlaps cur's device work
                    if export_future is not None:
                        results.extend(export_future.result())
                    export_future = exporter.submit(export_timed, prev, fetched)
                prev = cur
            if prev is not None:
                fetched = fetch_timed(prev)
                if export_future is not None:
                    results.extend(export_future.result())
                results.extend(export_timed(prev, fetched))
                prev = None
        except Exception:
            # Salvage batches already dispatched/in export: their device
            # work is done — write their artifacts before propagating, so
            # one bad batch doesn't discard its predecessors' outputs.
            if export_future is not None:
                try:
                    results.extend(export_future.result())
                except Exception:
                    pass
            if prev is not None:
                try:
                    results.extend(export_timed(prev, fetch_timed(prev)))
                except Exception:
                    pass
            raise
    # batches were grouped by camera dims — return in input order
    by_name = {r.image_name: r for r in results}
    order = [scene[n].name for n in image_names]
    return [by_name[n] for n in order if n in by_name]


def _fit_metrics(telemetry, n_obs: int, rec_u8, raw_rgb, valid,
                 want_ssim: bool = False) -> dict:
    """Quantitative fit-quality summary for one restored target.

    - ``final_cost``: last-iteration sum of squared residuals (what the
      reference prints each iteration, sucre.py:149-152).
    - ``obs_rmse``: sqrt(final_cost / (n_obs * 3)) — per-channel RMS
      residual in [0, 1] color units across ALL observations.
    - ``recon_psnr``: PSNR (dB) of the reconstruction render against the
      raw target image over export-valid pixels — the quantitative form
      of the reference's eyeball-the-reconstruction check
      (sucre.py:106-113). Low values flag targets whose fit diverged.
    - ``recon_ssim`` (opt-in via ``want_ssim``; the CLI enables it with
      --report): SSIM over the valid region's bounding box (invalid
      pixels inside it zeroed on both sides) — structure-sensitive
      where PSNR is not: a fit that nails mean color but smears texture
      scores high PSNR, low SSIM. Cropping to the bbox keeps identical
      all-zero invalid margins from inflating the score (an all-invalid
      target reports no SSIM rather than a perfect 1.0); scipy-less
      installs simply omit the field.
    """
    m: dict = {}
    cost = np.asarray(telemetry.cost)
    if cost.shape[0] and n_obs:
        final = float(np.asarray(cost[-1]).sum())
        m["final_cost"] = final
        m["obs_rmse"] = float(np.sqrt(max(final, 0.0) / (n_obs * 3)))
    if rec_u8 is not None and raw_rgb is not None:
        from sucre_tpu.utils.metrics import psnr

        rec = np.asarray(rec_u8, np.float32) / 255.0
        raw = rgb_to_f32(raw_rgb)
        m["recon_psnr"] = psnr(rec, raw, mask=valid)
        v = np.asarray(valid, bool)
        if want_ssim and v.any():
            rs, cs = v.any(axis=1), v.any(axis=0)  # O(H+W) bbox
            r0 = int(np.argmax(rs))
            r1 = len(rs) - int(np.argmax(rs[::-1]))
            c0 = int(np.argmax(cs))
            c1 = len(cs) - int(np.argmax(cs[::-1]))
            from sucre_tpu.utils.metrics import _SSIM_WIN, ssim

            if r1 - r0 >= _SSIM_WIN and c1 - c0 >= _SSIM_WIN:

                v3 = v[r0:r1, c0:c1, None]
                try:
                    m["recon_ssim"] = ssim(
                        np.where(v3, rec[r0:r1, c0:c1], 0.0),
                        np.where(v3, raw[r0:r1, c0:c1], 0.0),
                    )
                except ImportError:
                    # neither cv2 nor scipy present for the convolution
                    # backend: omit the field rather than fail the run
                    pass
    return m


def _export_mask(cfg: RestoreConfig, target_depth: np.ndarray, observed: np.ndarray):
    """NaN-export validity parity: direct mode masks depth-invalid pixels
    (J's NaN init, sucre.py:47-50); closed-form masks never-observed pixels
    (0/0 in the closed form, sucre.py:77)."""
    if cfg.use_closed_form:
        return observed.astype(bool)
    return np.asarray(target_depth) > 0
