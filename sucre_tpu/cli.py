"""Command-line interface — same surface as the reference (sucre.py:222-307).

All 18 reference flags are accepted with identical names, semantics and
defaults (device selection is TPU-native: JAX picks the platform; use
``--platform`` to force cpu/tpu). Extra TPU-framework flags are additive.

Usage:
    python -m sucre_tpu --image-dir ... --depth-dir ... --model-dir ... \
        --output-dir ... (--image-name X | --image-list f.txt | --image-ids A B)
"""

from __future__ import annotations

import argparse
from pathlib import Path

from sucre_tpu.pipeline import NoObservationsError, RestoreConfig, restore_image
from sucre_tpu.scene import Scene


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="SUCRe-TPU: multi-view underwater color restoration.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--image-dir", required=True, type=Path,
                        help="path to images directory.")
    parser.add_argument("--depth-dir", required=True, type=Path,
                        help="path to depth maps directory.")
    parser.add_argument("--model-dir", required=True, type=Path,
                        help="path to COLMAP model directory (any COLMAP "
                        "camera model, distorted or not — no undistorter "
                        "pass needed, unlike the reference).")
    parser.add_argument("--output-dir", required=True, type=Path,
                        help="path to output directory.")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--image-name", type=str, help="name of image to restore.")
    group.add_argument("--image-list", type=Path,
                       help="path to .txt file with names of images to restore, "
                            "one name per line.")
    group.add_argument("--image-ids", type=int, nargs=2, metavar=("MIN_ID", "MAX_ID"),
                       help="range of ids of images to restore in the COLMAP "
                            "model [min, max).")
    parser.add_argument("--light-model", action="store_true",
                        help="model artificial lights.")
    parser.add_argument("--use-closed-form", action="store_true",
                        help="use the partial closed-form solution for computing the "
                             "restored image from absorption, backscatter and light "
                             "parameters.")
    parser.add_argument("--min-cover", type=float, default=0.000001,
                        help="minimum percentile of shared observations to keep the "
                             "pairs of an image.")
    parser.add_argument("--image-scale", type=float, default=1.0,
                        help="rescale all images by this factor.")
    parser.add_argument("--filter-images-path", type=Path,
                        help="path to a .txt file with names of images to discard "
                             "when computing matches, one name per line.")
    parser.add_argument("--learning-rate", type=float, default=0.05,
                        help="learning rate for Adam optimizer.")
    parser.add_argument("--num-iter", type=int, default=200,
                        help="number of optimization steps.")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="number of views per gradient-accumulation chunk "
                             "(memory knob; the gradient is exact full-batch "
                             "either way). Default: the whole observation stack "
                             "in one pass — fastest; set a small value (the "
                             "reference's default is 5) to bound memory.")
    parser.add_argument("--save-interval", type=int,
                        help="save restored image every given optimization step.")
    parser.add_argument("--params-path", type=Path,
                        help="load underwater image formation model parameters from "
                             "a .npz or torch .pt file (warm start).")
    parser.add_argument("--force-compute-matches", action="store_true",
                        help="if matches file already exists, erase it and recompute "
                             "matches.")
    parser.add_argument("--skip-existing", action="store_true",
                        help="skip targets whose parameter checkpoint already "
                             "exists in the output directory — resume an "
                             "interrupted survey at target granularity (the "
                             "matches cache already resumes at file granularity "
                             "within a target).")
    parser.add_argument("--keep-matches", action="store_true",
                        help="keep matches file (can take a lot of space).")
    parser.add_argument("--num-workers", type=int, default=0,
                        help="number of decode prefetch workers, 0 decodes on the "
                             "main thread.")
    parser.add_argument("--decode-processes", action="store_true",
                        help="use worker PROCESSES for --num-workers decode "
                             "prefetch (the reference's DataLoader model) instead "
                             "of threads; only worth it for GIL-bound decode "
                             "paths (pure-Python alt-format readers).")
    parser.add_argument("--device", type=str, default=None,
                        help="accepted for reference-CLI compatibility; the JAX "
                             "platform is selected automatically (see --platform).")
    # TPU-framework extras
    parser.add_argument("--platform", type=str, default=None,
                        help="force a JAX platform (cpu/tpu).")
    parser.add_argument("--match-chunk", type=int, default=8,
                        help="views matched per device batch.")
    parser.add_argument("--match-window", type=int, default=4,
                        help="dispatched matching chunks per min-cover fetch "
                             "round trip (chunked paths only); transient HBM "
                             "peak scales ~window*match-chunk views, larger "
                             "windows amortize device round trips on "
                             "high-latency links.")
    parser.add_argument("--compile-cache", type=str,
                        default=str(Path.home() / ".cache" / "sucre_tpu_xla"),
                        help="persistent XLA compilation cache directory "
                             "(pass an empty string to disable).")
    parser.add_argument("--batch-targets", type=int, default=4,
                        help="restore up to N same-dimension targets per device "
                             "program (--image-list/--image-ids modes); 1 restores "
                             "strictly sequentially like the reference.")
    parser.add_argument("--params-format", choices=["npz", "pt"], default="npz",
                        help="parameter-checkpoint format: native .npz or the "
                             "reference's torch .pt state-dict (interop).")
    parser.add_argument("--artifacts", choices=["full", "renders"],
                        default="full",
                        help="artifact selection: 'full' (default, reference "
                             "parity) writes the PNG renders AND the "
                             ".npz/.pt parameter checkpoint; 'renders' writes "
                             "only the PNGs — the f32 J never leaves the "
                             "device (it is ~6.3 MB of the ~8 MB/target "
                             "export payload at 544x960), a large "
                             "link/disk/CPU win when the restored PNGs are "
                             "the deliverable. Note: without the checkpoint "
                             "there is nothing for a later --params-path "
                             "warm start.")
    parser.add_argument("--undistort-output", action="store_true",
                        help="distorted cameras: also write "
                             "<stem>_rgb_undistorted.png — the restored image "
                             "resampled onto the ideal pinhole camera (same "
                             "intrinsics/dims) via the closed-form forward "
                             "distortion map. The reference-style deliverable "
                             "without COLMAP's image undistorter; no-op for "
                             "pinhole targets.")
    parser.add_argument("--cull-tiles", type=int, default=4,
                        help="tile-granular culling: split each target into "
                             "NxN tiles and match each view chunk only "
                             "against the target rectangle its surfaces can "
                             "reach (chunked matching paths; results "
                             "identical). <=1 keeps whole-view culling only.")
    parser.add_argument("--no-culling", action="store_true",
                        help="disable surface-overlap view culling. Culling is "
                             "conservative (a dropped pair's surfaces provably "
                             "cannot intersect) but its AABBs subsample depth "
                             "maps — disable for strict reference-identical "
                             "pair sets on pathological depth data.")
    parser.add_argument("--bilinear-colors", action="store_true",
                        help="sample observed colors bilinearly at the continuous "
                             "reprojection instead of the reference's nearest-pixel "
                             "gather (matches/geometry unchanged). COST: ~5x the "
                             "matching gather count (4 neighbor gathers on top of "
                             "the packed one) on the gather-bound matching stage, "
                             "and f32 observation colors (4x the I-stack HBM). "
                             "Measured benefit is small (BASELINE.md: +0.02-0.09 dB "
                             "on the synthetic scene).")
    parser.add_argument("--joint-params", action="store_true",
                        help="estimate ONE shared set of water parameters "
                             "(B, beta, gamma[, light]) jointly across all targets "
                             "of a batch instead of per-image fits.")
    parser.add_argument("--stop-tol", type=float, default=None,
                        help="measured-convergence early stop: end the fit "
                             "once the relative cost improvement per "
                             "--stop-check-iteration window falls below this "
                             "for every target (off by default — the "
                             "reference always runs exactly --num-iter "
                             "iterations). Measured (BASELINE.md): <= 0.02 "
                             "is quality-neutral; 0.05 stopped 125 iters "
                             "early but cost -0.41 dB PSNR on noisy data. "
                             "num-iter stays the hard cap.")
    parser.add_argument("--stop-check", type=int, default=25,
                        help="iterations per convergence-check window for "
                             "--stop-tol (each check costs one small device "
                             "round trip).")
    parser.add_argument("--checkpoint-interval", type=int,
                        help="snapshot full solver state (params + Adam moments + "
                             "iteration) every N iterations; an interrupted restore "
                             "resumes exactly where it stopped.")
    parser.add_argument("--store", choices=["hdf5", "memory"], default="hdf5",
                        help="matches-cache backend. hdf5 (reference parity) "
                             "writes <image>.h5 caches — file-granular resume "
                             "and --keep-matches. memory skips the cache: "
                             "fastest, and required for the single-program "
                             "survey matching path (including the sharded "
                             "oversized-survey route on a view-row mesh).")
    parser.add_argument("--shard-mode", choices=["auto", "batch", "view-row", "none"],
                        default="auto",
                        help="multi-chip strategy when several devices are "
                             "visible. batch: different chips restore different "
                             "targets (batched runs); view-row: each restore's "
                             "observation stack shards over a (view x row) mesh "
                             "(single-target / sequential runs); auto picks "
                             "batch for batched runs and view-row otherwise; "
                             "none disables sharding.")
    parser.add_argument("--mesh", type=str, default=None, metavar="VxR",
                        help="explicit (view x row) mesh factorization for "
                             "--shard-mode view-row, e.g. 2x4; default 1xN "
                             "(all devices shard pixel rows).")
    parser.add_argument("--profile-dir", type=Path,
                        help="capture a jax.profiler trace of the run into this "
                             "directory (view with TensorBoard/XProf).")
    parser.add_argument("--report", type=Path, nargs="?", const=Path("-"),
                        metavar="PATH",
                        help="write a JSON run report (per-target observation "
                             "counts, final cost/parameters, stage timings, "
                             "artifacts; run-level config/platform/wall time). "
                             "Without PATH, writes <output-dir>/report.json.")
    parser.add_argument("--quiet", action="store_true", help="suppress telemetry.")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import os

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Multi-host (DCN tier): when launched under a JAX coordinator, join
    # the process group; each host then restores a disjoint strided slice
    # of the target list (no cross-host communication during restores).
    multihost = bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if multihost and args.joint_params:
        # same reason --skip-existing rejects joint: hosts restore
        # disjoint strided slices, so each would fit its own "shared"
        # water model on a fraction of the targets
        raise SystemExit(
            "--joint-params cannot combine with multi-host target "
            "striding (each host would fit a separate shared model on "
            "its slice); run the joint fit single-host — its stack can "
            "still shard over that host's chips (--shard-mode view-row)"
        )
    if multihost:
        from sucre_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()

    print("Loading COLMAP model.")
    scene = Scene.from_colmap(
        model_dir=args.model_dir,
        image_dir=args.image_dir,
        depth_dir=args.depth_dir,
        image_scale=args.image_scale,
    )

    # Target selection (3 mutually-exclusive modes, sucre.py:228-235)
    if args.image_name is not None:
        targets = [scene[args.image_name].name]
    elif args.image_list is not None:
        targets = [
            scene[name].name for name in args.image_list.read_text().splitlines() if name
        ]
    else:
        targets = [
            scene.views[i].name
            for i in range(args.image_ids[0], args.image_ids[1])
            if i in scene.views
        ]

    # Pairing filter (targets stay restorable, sucre.py:237-239)
    filter_names = (
        set(args.filter_images_path.read_text().splitlines())
        if args.filter_images_path
        else set()
    )
    image_list = [v for v in scene.view_list() if v.name not in filter_names]

    args.output_dir.mkdir(parents=True, exist_ok=True)

    # Flag validation BEFORE the skip-existing filter so a fully-restored
    # rerun with contradictory flags still errors instead of no-op'ing.
    if args.store == "memory" and args.keep_matches:
        raise SystemExit("--keep-matches requires the hdf5 store "
                         "(--store memory writes no matches cache)")
    if args.stop_tol is not None and args.stop_tol <= 0:
        raise SystemExit(f"--stop-tol must be > 0, got {args.stop_tol}")
    if args.stop_tol is not None and args.stop_check < 1:
        raise SystemExit(f"--stop-check must be >= 1, got {args.stop_check}")
    if args.joint_params and len(targets) > 1:
        # joint fitting needs ONE stacked program over ALL targets, so
        # they must share camera dimensions and a lens stack class —
        # surface restore_survey's ValueError as a clean CLI message
        from sucre_tpu.ops.distortion import stack_class

        tgroups = {
            (scene[n].width, scene[n].height, stack_class(scene[n].dist_model))
            for n in targets
        }
        if len(tgroups) > 1:
            raise SystemExit(
                "--joint-params fits one shared water model across ALL "
                "targets in a single stacked program, but the targets mix "
                f"camera dimensions / lens classes: {sorted(tgroups)}. "
                "Restore each homogeneous group in its own run (per-group "
                "joint models), or drop --joint-params for per-image fits."
            )
    if args.skip_existing and args.joint_params:
        # the joint fit's semantics are ONE shared water model across ALL
        # targets; refitting only the unrestored subset would silently
        # produce two halves restored under different models
        raise SystemExit("--skip-existing cannot combine with "
                         "--joint-params (a partial rerun would fit the "
                         "shared water model on only the remaining "
                         "targets); rerun the full list instead")

    if args.skip_existing:
        ext = "." + args.params_format

        def _done(n: str) -> bool:
            base = (args.output_dir / n).with_suffix("")
            if args.artifacts == "renders":
                # renders-only runs write no checkpoint; the LAST
                # render written marks completion — the vignetting PNG
                # under --light-model (viz.save_plots writes _rgb,
                # _reconstruction, then _vignetting), else the
                # reconstruction PNG
                marker = (
                    "_vignetting.png" if args.light_model
                    else "_reconstruction.png"
                )
                return base.with_name(base.name + marker).exists()
            return base.with_suffix(ext).exists()

        remaining = [n for n in targets if not _done(n)]
        if len(remaining) < len(targets):
            print(
                f"Skip {len(targets) - len(remaining)} already-restored "
                f"targets (--skip-existing)."
            )
        targets = remaining
        if not targets:
            print("Nothing to do: all targets already restored.")
            if args.report is not None:
                # still overwrite the report: a stale report.json from the
                # prior run would misrepresent the run that just exited 0
                path = _report_path(args, multihost)
                _write_report(path, args, [], "none", 0.0)
                print(f"Report: {path}")
            return 0
    cfg = RestoreConfig(
        store=args.store,
        light_model=args.light_model,
        use_closed_form=args.use_closed_form,
        min_cover=args.min_cover,
        lr=args.learning_rate,
        num_iter=args.num_iter,
        batch_size=args.batch_size,
        save_interval=args.save_interval,
        params_path=args.params_path,
        force_compute_matches=args.force_compute_matches,
        keep_matches=args.keep_matches,
        num_workers=args.num_workers,
        decode_processes=args.decode_processes,
        match_chunk=args.match_chunk,
        match_window=args.match_window,
        frustum_cull=not args.no_culling,
        cull_tiles=args.cull_tiles,
        joint_params=args.joint_params,
        bilinear_colors=args.bilinear_colors,
        params_format=args.params_format,
        artifacts=args.artifacts,
        undistort_output=args.undistort_output,
        checkpoint_interval=args.checkpoint_interval,
        stop_tol=args.stop_tol,
        stop_check=args.stop_check,
        # SSIM costs real host CPU per target; compute it only when the
        # report (its one consumer) was requested
        ssim_metric=args.report is not None,
        verbose=not args.quiet,
    )

    import contextlib

    profile_cm = (
        jax.profiler.trace(str(args.profile_dir))
        if args.profile_dir
        else contextlib.nullcontext()
    )
    # Multi-host: each process restores a disjoint strided slice of the
    # target list (artifacts land in the shared output dir; the matches
    # cache is file-granular, so failed hosts re-run only their targets).
    if multihost:
        from sucre_tpu.parallel.multihost import shard_targets

        targets = shard_targets(targets)
        print(
            f"Process {jax.process_index()}/{jax.process_count()}: "
            f"{len(targets)} targets."
        )
    # Multi-target batching: group same-dimension targets and restore each
    # group in one device program (views decoded/uploaded once). Modes the
    # batched fit doesn't cover (snapshots, mid-fit checkpoints,
    # view-chunked memory limits) fall back to the sequential path.
    batched_ok = (
        (args.batch_targets > 1 or args.joint_params)
        and len(targets) > 1
        and not args.save_interval
        and not args.checkpoint_interval
    )
    if args.joint_params and not batched_ok:
        raise SystemExit("--joint-params requires multiple targets and the "
                         "batched path (no --save-interval/--checkpoint-interval)")

    # Multi-chip sharding (this process's local devices): batched runs
    # spread the target batch one-image-per-chip; sequential/single-target
    # runs shard each restore's observation stack over a (view x row) mesh.
    devices = jax.local_devices()
    mode = args.shard_mode
    if mode == "auto":
        mode = "none" if len(devices) == 1 else ("batch" if batched_ok else "view-row")
    elif mode == "batch" and not batched_ok:
        # Explicit modes are honored or declined, never silently swapped.
        print("--shard-mode batch needs the batched path (multiple targets, "
              "no --save-interval/--checkpoint-interval); running unsharded.")
        mode = "none"
    if len(devices) == 1:
        mode = "none"
    mesh = None
    batch_targets = args.batch_targets
    if args.joint_params:
        # ONE shared water model across ALL targets = one batch (the
        # batched fit sums shared-global gradients over the whole stack);
        # restore_survey rejects multi-batch joint runs.
        batch_targets = max(batch_targets, len(targets))
    if mode == "batch":
        import numpy as np

        mesh = jax.sharding.Mesh(np.asarray(devices), axis_names=("batch",))
        # batches must fill the mesh's batch axis to shard evenly
        batch_targets = max(batch_targets, len(devices))
        print(f"Sharding: target batches of {batch_targets} over "
              f"{len(devices)} devices.")
    elif mode == "view-row":
        from sucre_tpu.parallel import make_mesh

        if args.mesh:
            try:
                v, r = (int(x) for x in args.mesh.lower().split("x"))
            except ValueError:
                raise SystemExit(
                    f"--mesh must be VIEWSxROWS (e.g. 2x4), got "
                    f"{args.mesh!r}"
                )
        else:
            v, r = 1, len(devices)
        mesh = make_mesh(v, r, devices=devices)
        print(f"Sharding: (view={v} x row={r}) mesh per restore.")

    import time

    run_t0 = time.perf_counter()
    results = []
    with profile_cm:
        if batched_ok:
            from sucre_tpu.pipeline import restore_survey

            # Groups same-dimension targets into batches over one shared
            # decoded/uploaded view stack, software-pipelining device
            # compute against host transfer+export across batches.
            # batch meshes spread targets one-per-chip; (view x row)
            # meshes shard each batch's observation stacks (and raise
            # the survey-program pair budget by the mesh size — the
            # views-axis HBM scaling path)
            results = restore_survey(
                scene, targets, args.output_dir, cfg,
                image_list=image_list, batch_targets=batch_targets,
                mesh=mesh,
            )
        else:
            rmesh = mesh if mode == "view-row" else None
            cache = None
            if len(targets) > 1:
                # decode each view / compute each surface AABB once
                # across the sequential loop (the reference re-decodes
                # per target, sfm.py:130-131)
                from sucre_tpu.pipeline import ViewCache

                cache = ViewCache()
                cache.prefill(
                    image_list, num_workers=args.num_workers,
                    processes=args.decode_processes,
                )
            for name in targets:
                try:
                    results.append(
                        restore_image(scene, name, args.output_dir, cfg,
                                      image_list=image_list, mesh=rmesh,
                                      cache=cache)
                    )
                except NoObservationsError as e:
                    # one bad target (empty depth map, min_cover filtered
                    # everything) must not kill the rest of the list; the
                    # failure is reported below and in the exit code.
                    # (Specifically NOT any RuntimeError: jaxlib device /
                    # compile errors subclass it and must propagate.)
                    print(f"ERROR: {e}")
    restored = {r.image_name for r in results}
    # dict.fromkeys: order-preserving dedup (the restore paths dedup the
    # target list; a duplicated failing name must not count twice)
    failed = list(dict.fromkeys(
        n for n in targets if scene[n].name not in restored
    ))
    if failed:
        print(f"FAILED ({len(failed)}/{len(targets)} targets not restored): "
              + ", ".join(failed))
    if args.report is not None:
        path = _report_path(args, multihost)
        _write_report(path, args, results, mode, time.perf_counter() - run_t0,
                      failed=failed)
        print(f"Report: {path}")
    return 1 if failed else 0


def _report_path(args, multihost: bool) -> Path:
    """Resolve --report to a per-process path under multihost: every
    process restores a disjoint slice into the SHARED output dir, so a
    single shared path would be clobbered by all but one process. '-'
    resolves to <output>/report.json; an EXPLICIT path gets the same
    process-index suffix inserted before its extension."""
    import jax

    multiproc = multihost and jax.process_count() > 1
    if str(args.report) != "-":
        path = Path(args.report)
        if multiproc:
            return path.with_name(
                f"{path.stem}.p{jax.process_index()}{path.suffix}")
        return path
    name = (
        f"report.p{jax.process_index()}.json"
        if multiproc
        else "report.json"
    )
    return args.output_dir / name


def _write_report(path, args, results, shard_mode: str, wall_s: float,
                  failed: list[str] = ()) -> None:
    """One JSON document summarizing the run: per-target fit outcomes and
    stage timings plus run-level config/platform (the observability
    counterpart of the reference's per-iteration prints)."""
    import json

    import jax
    import numpy as np

    def finite(x):
        # diverged fits give inf/nan, which json.dumps would emit as the
        # non-standard Infinity/NaN tokens strict parsers reject
        return float(x) if x is not None and np.isfinite(x) else None

    def target_entry(r):
        cost = np.asarray(r.telemetry.cost)
        m = r.metrics or {}
        e = {
            "image": r.image_name,
            "n_obs": int(r.n_obs),
            # < num_iter when --stop-tol ended the fit early
            "iters": int(cost.shape[0]),
            # None when no iterations ran (--num-iter 0 / exhausted resume)
            "final_cost": finite(cost[-1].sum()) if cost.shape[0] else None,
            "B": np.asarray(r.params.B).ravel().tolist(),
            "beta": np.asarray(r.params.beta).ravel().tolist(),
            "gamma": np.asarray(r.params.gamma).ravel().tolist(),
            "observed_fraction": float(np.asarray(r.valid, bool).mean()),
            # per-channel RMS residual over all observations + PSNR of
            # the reconstruction render vs the raw image (dB): low
            # recon_psnr flags targets whose fit diverged
            "obs_rmse": finite(m.get("obs_rmse")),
            "recon_psnr": finite(m.get("recon_psnr")),
            # structure-sensitive companion (None on sub-11px images)
            "recon_ssim": finite(m.get("recon_ssim")),
            "timings_s": {k: round(v, 4) for k, v in r.timings.items()},
            "artifacts": [str(a) for a in r.artifacts],
        }
        if r.params.cam2light is not None:
            e["cam2light"] = np.asarray(r.params.cam2light).ravel().tolist()
            e["sigma"] = np.asarray(r.params.sigma).tolist()
        return e

    report = {
        "framework": "sucre_tpu",
        "platform": jax.default_backend(),
        "devices": len(jax.local_devices()),
        "shard_mode": shard_mode,
        "num_iter": args.num_iter,
        "learning_rate": args.learning_rate,
        "light_model": args.light_model,
        "use_closed_form": args.use_closed_form,
        "joint_params": args.joint_params,
        "wall_s": round(wall_s, 3),
        "n_targets": len(results),
        # targets requested but not restored (zero observations): the
        # run continues past them and exits 1
        "failed_targets": list(failed),
        "total_obs": int(sum(int(r.n_obs) for r in results)),
        "targets": [target_entry(r) for r in results],
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    raise SystemExit(main())
