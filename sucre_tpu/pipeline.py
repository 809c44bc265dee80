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
import time
from pathlib import Path
from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from sucre_tpu.io.images import batched, load_depth_map, load_rgb, prefetch_views
from sucre_tpu.models.sucre import SucreParams, init_params
from sucre_tpu.ops.matching import DenseObs, PairMatch, match_and_observe_chunk_jit
from sucre_tpu.scene import Scene, View
from sucre_tpu.solve import FitConfig, FitTelemetry, fit, print_telemetry
from sucre_tpu.store import MatchesFile
from sucre_tpu.utils import checkpoint as ckpt
from sucre_tpu.utils import viz


@dataclasses.dataclass
class RestoreConfig:
    light_model: bool = False
    use_closed_form: bool = False
    min_cover: float = 0.000001  # sucre.py:282
    lr: float = 0.05  # sucre.py:289
    num_iter: int = 200  # sucre.py:291
    batch_size: int = 5  # fit view-chunk (grad-accum memory knob, sucre.py:292)
    save_interval: int | None = None
    params_path: Path | None = None
    force_compute_matches: bool = False
    keep_matches: bool = False
    num_workers: int = 0
    match_chunk: int = 8  # views per device matching batch
    verbose: bool = True


class RestoreResult(NamedTuple):
    image_name: str
    params: SucreParams
    J: np.ndarray  # (H, W, 3) with NaN at invalid/unobserved pixels
    valid: np.ndarray  # (H, W) export validity mask
    telemetry: FitTelemetry
    n_obs: int
    artifacts: list[Path]
    timings: dict[str, float]


def compute_matches(
    target: View,
    image_list: list[View],
    matches_file: MatchesFile | None,
    *,
    min_cover: float = 0.000001,
    match_chunk: int = 8,
    num_workers: int = 0,
    target_depth: np.ndarray | None = None,
    collect_dense: bool = True,
    log: Callable[[str], None] = lambda s: None,
) -> tuple[DenseObs | None, list[str]]:
    """Stage A+B fused: match the target against every view in
    ``image_list`` and gather matched colors, saving pairs that cover
    more than ``min_cover`` of the target (parity: sfm.py:127-138).

    Returns the dense observation stack over kept views (if
    ``collect_dense``) and the kept view names.
    """
    if target_depth is None:
        target_depth = load_depth_map(target.depth_path, target.width, target.height)
    d1 = jnp.asarray(target_depth)
    intr1 = jnp.asarray(target.intrinsics)
    R1 = jnp.asarray(target.R)
    t1 = jnp.asarray(target.t)

    # Bucket by camera dims so each dense stack has uniform static shapes.
    buckets: dict[tuple[int, int], list[View]] = {}
    for v in image_list:
        buckets.setdefault((v.width, v.height), []).append(v)

    kept_names: list[str] = []
    kept_parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    area = float(target.width * target.height)

    for (w2, h2), views in buckets.items():
        stream = prefetch_views(views, rgb=True, depth=True, num_workers=num_workers)
        for chunk in batched(stream, match_chunk):
            idxs = [i for i, _, _ in chunk]
            n = len(chunk)
            pad = match_chunk - n
            depths = np.stack([c[2] for c in chunk] + [np.zeros((h2, w2), np.float32)] * pad)
            rgbs = np.stack(
                [c[1] for c in chunk] + [np.zeros((h2, w2, 3), np.float32)] * pad
            )
            sub = [views[i] for i in idxs]
            intrs = np.stack([v.intrinsics for v in sub] + [sub[-1].intrinsics] * pad)
            Rs = np.stack([v.R for v in sub] + [sub[-1].R] * pad)
            ts = np.stack([v.t for v in sub] + [sub[-1].t] * pad)

            obs, match = match_and_observe_chunk_jit(
                d1, intr1, R1, t1,
                jnp.asarray(depths), jnp.asarray(rgbs), jnp.asarray(intrs),
                jnp.asarray(Rs), jnp.asarray(ts),
            )
            counts = np.asarray(obs.valid[:n].sum(axis=(1, 2)))
            for j in range(n):
                view2 = sub[j]
                if counts[j] / area > min_cover:
                    if matches_file is not None:
                        matches_file.save_pair_from_dense(
                            view2.name,
                            PairMatch(
                                u2=match.u2[j], v2=match.v2[j],
                                d2=match.d2[j], valid=match.valid[j],
                            ),
                            obs.I[j],
                        )
                    if collect_dense:
                        kept_parts.append(
                            (
                                np.asarray(obs.valid[j]),
                                np.asarray(obs.cP[j]),
                                np.asarray(obs.I[j]),
                            )
                        )
                    kept_names.append(view2.name)
            log(f"matched {len(kept_names)} kept / {len(idxs)} in chunk")

    dense = None
    if collect_dense and kept_parts:
        dense = DenseObs(
            valid=jnp.asarray(np.stack([p[0] for p in kept_parts])),
            cP=jnp.asarray(np.stack([p[1] for p in kept_parts])),
            I=jnp.asarray(np.stack([p[2] for p in kept_parts])),
        )
    return dense, kept_names


def restore_image(
    scene: Scene,
    image_name: str,
    output_dir: Path | str,
    cfg: RestoreConfig | None = None,
    image_list: list[View] | None = None,
) -> RestoreResult:
    """Restore one image end to end (parity: sucre.py:160-219)."""
    cfg = cfg or RestoreConfig()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    target = scene[image_name]
    log = print if cfg.verbose else (lambda *a, **k: None)
    timings: dict[str, float] = {}

    log(f"Restore {target.name}.")
    matches_path = (output_dir / target.name).with_suffix(".h5")
    matches_file = MatchesFile(matches_path, overwrite=cfg.force_compute_matches)

    if image_list is None:
        image_list = scene.view_list()

    target_depth = load_depth_map(target.depth_path, target.width, target.height)

    t0 = time.perf_counter()
    obs = None
    if cfg.force_compute_matches or not matches_path.exists():
        log(f"Compute {target.name} matches.")
        obs, _ = compute_matches(
            target,
            image_list,
            matches_file,
            min_cover=cfg.min_cover,
            match_chunk=cfg.match_chunk,
            num_workers=cfg.num_workers,
            target_depth=target_depth,
            collect_dense=True,
        )
    timings["match"] = time.perf_counter() - t0

    if not matches_file.exists():
        raise RuntimeError(
            f"No observations for {target.name}: no view pair exceeded "
            f"min_cover={cfg.min_cover}; cannot restore."
        )
    log("Check matches integrity.")
    matches_file.check_integrity()

    t0 = time.perf_counter()
    if obs is None:
        log("Load matches.")
        obs, _ = matches_file.load_dense(scene, target.height, target.width)
    n_obs = int(np.asarray(obs.valid).sum()) if obs is not None else 0
    log(f"Total of {n_obs} observations.")
    if obs is None or n_obs == 0:
        raise RuntimeError(f"No observations for {target.name}; cannot restore.")
    timings["load"] = time.perf_counter() - t0

    image = None
    if not cfg.use_closed_form:
        image = load_rgb(target.rgb_path, target.width, target.height)
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
            )

    t0 = time.perf_counter()
    res = fit(
        params,
        obs,
        FitConfig(
            lr=cfg.lr,
            num_iter=cfg.num_iter,
            use_closed_form=cfg.use_closed_form,
            view_chunk=cfg.batch_size,
            save_interval=cfg.save_interval,
        ),
        telemetry_fn=print_telemetry if cfg.verbose else None,
        snapshot_fn=snapshot_fn,
    )
    timings["fit"] = time.perf_counter() - t0

    valid = _export_mask(cfg, target_depth, np.asarray(res.observed))
    J = np.asarray(res.J, np.float32).copy()
    J[~valid] = np.nan

    artifacts = viz.save_plots(
        output_dir, target.name, res.params, J, valid, target.intrinsics, target_depth
    )
    params_out = (output_dir / target.name).with_suffix(".npz")
    ckpt.save_params(params_out, res.params, J=J, valid=valid)
    artifacts.append(params_out)

    if not cfg.keep_matches:
        log(f"Erase {matches_path}.")
        matches_path.unlink(missing_ok=True)

    return RestoreResult(
        image_name=target.name,
        params=res.params,
        J=J,
        valid=valid,
        telemetry=res.telemetry,
        n_obs=n_obs,
        artifacts=artifacts,
        timings=timings,
    )


def _export_mask(cfg: RestoreConfig, target_depth: np.ndarray, observed: np.ndarray):
    """NaN-export validity parity: direct mode masks depth-invalid pixels
    (J's NaN init, sucre.py:47-50); closed-form masks never-observed pixels
    (0/0 in the closed form, sucre.py:77)."""
    if cfg.use_closed_form:
        return observed.astype(bool)
    return np.asarray(target_depth) > 0
