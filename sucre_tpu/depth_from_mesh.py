"""Generate reference-format depth maps from a dense mesh + COLMAP model.

    python -m sucre_tpu.depth_from_mesh \
        --mesh scene_mesh.ply --model-dir sparse/0 --output-dir depths

The reference's data-processing pipeline (README.md "Data processing
pipeline") leaves depth-map generation to an EXTERNAL third-party tool:
step 3 builds a mesh with OpenMVS, step 4 runs
ferreram/depth_map_2_mesh_ray_tracer to render depth_<stem>.png files.
This module is that step, in-framework: it z-buffer-rasterizes the mesh
into every registered view and writes depth maps in the reference's
16-bit millimeter PNG format (or COLMAP dense ``.bin`` float meters via
``--format bin`` — both formats feed the pipeline directly).

Conventions (must match the matching geometry, ops/pinhole.py):
  - pixel (u, v) samples the ray through (u + 0.5, v + 0.5);
  - the stored value is camera-frame Z (not range) of the nearest
    surface; 0 = no hit (invalid, reference semantics);
  - 1/z interpolates linearly in screen space (perspective-correct Z —
    a planar surface rasterizes to its analytic depth exactly).

Distorted cameras (any COLMAP model this framework ingests) rasterize
on a ``--supersample``-times-finer ideal pinhole grid covering the
lens's field, then each distorted pixel samples the grid at its
undistorted ray (nearest; the supersampling bounds the half-texel ray
error well under a distorted pixel). Pinhole cameras rasterize their
exact grid — no resampling.

Rasterization runs on the native C++ threaded z-buffer
(csrc/depth_raster.cpp, lock-free atomic float-min) when built; a
vectorized-per-triangle numpy fallback otherwise (same math, slower —
fine for small meshes).
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import time
from pathlib import Path

import numpy as np

from sucre_tpu.io.mesh import Mesh, read_mesh

# Grid-size ceiling for the supersampled pinhole raster of distorted
# cameras (wide fisheyes can map to huge ideal-pinhole fields); the
# supersample factor degrades gracefully to stay under it.
MAX_RASTER_PIXELS = 64_000_000


def _clip_near(poly: np.ndarray, znear: float) -> np.ndarray:
    """Sutherland-Hodgman clip of a polygon (K, 3) against z > znear."""
    out = []
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        ina, inb = a[2] > znear, b[2] > znear
        if ina:
            out.append(a)
        if ina != inb:
            t = (znear - a[2]) / (b[2] - a[2])
            p = a + t * (b - a)
            p[2] = znear
            out.append(p)
    return np.asarray(out, np.float64).reshape(-1, 3)


def rasterize_depth_numpy(
    verts_cam: np.ndarray,
    faces: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    znear: float = 0.05,
) -> np.ndarray:
    """Pure-numpy z-buffer rasterizer (the csrc/depth_raster.cpp
    fallback; identical conventions — see module docstring)."""
    zbuf = np.full((height, width), np.inf, np.float64)
    V = np.asarray(verts_cam, np.float64)
    F = np.asarray(faces, np.int64).reshape(-1, 3)
    if F.size and (F.min() < 0 or F.max() >= len(V)):
        raise ValueError("face index out of range")

    for tri_idx in F:
        poly = V[tri_idx]
        if np.all(poly[:, 2] > znear):
            fans = [poly]
        else:
            clipped = _clip_near(poly, znear)
            if len(clipped) < 3:
                continue
            fans = [
                np.stack([clipped[0], clipped[k], clipped[k + 1]])
                for k in range(1, len(clipped) - 1)
            ]
        for tri in fans:
            px = fx * tri[:, 0] / tri[:, 2] + cx
            py = fy * tri[:, 1] / tri[:, 2] + cy
            area = (px[1] - px[0]) * (py[2] - py[0]) - (py[1] - py[0]) * (
                px[2] - px[0]
            )
            if not abs(area) > 1e-14:
                continue
            x0 = max(0, int(np.floor(px.min() - 0.5)))
            x1 = min(width - 1, int(np.ceil(px.max() - 0.5)))
            y0 = max(0, int(np.floor(py.min() - 0.5)))
            y1 = min(height - 1, int(np.ceil(py.max() - 0.5)))
            if x0 > x1 or y0 > y1:
                continue
            # Row-chunk the bbox: a near-clipped triangle can span the
            # whole (possibly supersampled) frame, and the ~6 bbox-sized
            # float64 temporaries below would otherwise transiently cost
            # gigabytes on large grids.
            rows_per = max(1, 1_000_000 // (x1 - x0 + 1))
            for yc in range(y0, y1 + 1, rows_per):
                ye = min(y1, yc + rows_per - 1)
                us, vs = np.meshgrid(
                    np.arange(x0, x1 + 1) + 0.5, np.arange(yc, ye + 1) + 0.5
                )
                w0 = ((px[1] - us) * (py[2] - vs) - (py[1] - vs) * (px[2] - us)) / area
                w1 = ((px[2] - us) * (py[0] - vs) - (py[2] - vs) * (px[0] - us)) / area
                w2 = 1.0 - w0 - w1
                inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                if not inside.any():
                    continue
                invz = w0 / tri[0, 2] + w1 / tri[1, 2] + w2 / tri[2, 2]
                with np.errstate(divide="ignore"):
                    zt = np.where(inside, 1.0 / invz, np.inf)
                sub = zbuf[yc : ye + 1, x0 : x1 + 1]
                np.minimum(sub, zt, out=sub)

    return np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)


_native_fallback_warned = False


def _rasterize(verts_cam, faces, fx, fy, cx, cy, width, height, znear, n_threads):
    global _native_fallback_warned
    try:
        from sucre_tpu.io import native

        if native.available():
            return native.raster_depth(
                verts_cam, faces, fx, fy, cx, cy, width, height,
                znear=znear, n_threads=max(1, n_threads),
            )
    except Exception as e:
        # A broken/stale libsucre_native.so must not silently turn a
        # seconds-long survey render into hours of numpy rasterization.
        if not _native_fallback_warned:
            _native_fallback_warned = True
            print(
                f"WARNING: native rasterizer failed ({e!r}); falling back "
                f"to the pure-numpy rasterizer (orders of magnitude "
                f"slower). Rebuild with `make -C csrc`.",
                file=sys.stderr,
            )
    return rasterize_depth_numpy(
        verts_cam, faces, fx, fy, cx, cy, width, height, znear=znear
    )


def render_view_depth(
    view,
    mesh: Mesh,
    znear: float = 0.05,
    supersample: float = 2.0,
    n_threads: int = 4,
) -> np.ndarray:
    """(H, W) float32 camera-frame Z-depth (meters, 0 = no hit) of the
    mesh seen from a ``scene.View`` — the exact input the matching
    geometry expects for that view."""
    R_wc = view.R.T  # View stores cam->world (scene.py); invert
    t_wc = -view.R.T @ view.t
    verts_cam = (mesh.vertices @ R_wc.T + t_wc).astype(np.float32)

    if view.dist_model == "none":
        return _rasterize(
            verts_cam, mesh.faces, view.fx, view.fy, view.cx, view.cy,
            view.width, view.height, znear, n_threads,
        )

    # Distorted camera: every pixel's ray = undistort(normalized pixel).
    # Rasterize an ideal-pinhole grid covering those rays, supersampled,
    # then sample each pixel's ray nearest on the grid.
    from sucre_tpu.ops.distortion import undistort

    uu, vv = np.meshgrid(np.arange(view.width), np.arange(view.height))
    xd = (uu + 0.5 - view.cx) / view.fx
    yd = (vv + 0.5 - view.cy) / view.fy
    xu, yu = undistort(view.dist_model, view.dist.astype(np.float64), xd, yd, xp=np)
    ok = np.isfinite(xu) & np.isfinite(yu)
    if not ok.any():
        return np.zeros((view.height, view.width), np.float32)

    fxs = view.fx * supersample
    fys = view.fy * supersample
    pad = 2
    x_lo, x_hi = xu[ok].min(), xu[ok].max()
    y_lo, y_hi = yu[ok].min(), yu[ok].max()
    gw = int(np.ceil((x_hi - x_lo) * fxs)) + 2 * pad + 1
    gh = int(np.ceil((y_hi - y_lo) * fys)) + 2 * pad + 1
    if gw * gh > MAX_RASTER_PIXELS:
        shrink = np.sqrt(MAX_RASTER_PIXELS / (gw * gh))
        fxs *= shrink
        fys *= shrink
        gw = int(np.ceil((x_hi - x_lo) * fxs)) + 2 * pad + 1
        gh = int(np.ceil((y_hi - y_lo) * fys)) + 2 * pad + 1
    cxs = pad - x_lo * fxs
    cys = pad - y_lo * fys

    z_grid = _rasterize(
        verts_cam, mesh.faces, fxs, fys, cxs, cys, gw, gh, znear, n_threads
    )
    pu = np.clip((fxs * np.where(ok, xu, 0.0) + cxs).astype(np.int64), 0, gw - 1)
    pv = np.clip((fys * np.where(ok, yu, 0.0) + cys).astype(np.int64), 0, gh - 1)
    z = z_grid[pv, pu]
    return np.where(ok, z, 0.0).astype(np.float32)


def write_depth_map(path: Path, z_meters: np.ndarray, fmt: str = "png") -> int:
    """Write a rendered depth map; returns the count of valid depths
    clipped to invalid because they exceed uint16 millimeters (always 0
    for fmt='bin', which stores float meters)."""
    if fmt == "bin":
        from sucre_tpu.io.depth_formats import write_colmap_array

        write_colmap_array(path, z_meters.astype(np.float32))
        return 0
    if fmt != "png":
        raise ValueError(f"unknown depth format {fmt!r} (png|bin)")
    import cv2

    mm = np.round(z_meters.astype(np.float64) * 1000.0)
    over = int(((mm > np.iinfo(np.uint16).max) & (z_meters > 0)).sum())
    mm = np.where(mm > np.iinfo(np.uint16).max, 0.0, mm)
    if not cv2.imwrite(str(path), mm.astype(np.uint16)):
        raise IOError(f"cannot write {path}")
    return over


def generate_depth_maps(
    views: list,
    mesh: Mesh,
    output_dir: Path | str,
    fmt: str = "png",
    znear: float = 0.05,
    supersample: float = 2.0,
    num_workers: int = 0,
    verbose: bool = True,
) -> list[dict]:
    """Render + write a depth map for every view; returns per-view stats
    (name, path, coverage, z range, u16 clip count)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    workers = max(1, num_workers)
    # parallelism budget: views x in-view raster threads ~ cores
    raster_threads = max(1, (os.cpu_count() or 4) // workers)

    def one(view) -> dict:
        z = render_view_depth(
            view, mesh, znear=znear, supersample=supersample,
            n_threads=raster_threads,
        )
        suffix = ".png" if fmt == "png" else ".bin"
        out = output_dir / view.name
        out = out.parent / f"depth_{Path(view.name).stem}{suffix}"
        out.parent.mkdir(parents=True, exist_ok=True)
        clipped = write_depth_map(out, z, fmt)
        valid = z > 0
        return dict(
            name=view.name,
            path=str(out),
            coverage=float(valid.mean()),
            z_min=float(z[valid].min()) if valid.any() else 0.0,
            z_max=float(z[valid].max()) if valid.any() else 0.0,
            clipped_u16=clipped,
        )

    stats: list[dict] = []

    def consume(results) -> None:
        for s in results:
            stats.append(s)
            if verbose:
                extra = (
                    f"  [{s['clipped_u16']} px beyond 65.535 m -> invalid]"
                    if s["clipped_u16"]
                    else ""
                )
                print(
                    f"{s['name']}: coverage {100 * s['coverage']:.1f}%  "
                    f"z [{s['z_min']:.2f}, {s['z_max']:.2f}] m{extra}",
                    flush=True,
                )

    if workers == 1:
        consume(map(one, views))
    else:
        # cancel_futures: one failed view (unwritable output, bad file)
        # must not leave worker threads rasterizing the rest of a large
        # survey after the exception propagates
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            try:
                consume(pool.map(one, views))
            except BaseException:
                pool.shutdown(wait=False, cancel_futures=True)
                raise
    return stats


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m sucre_tpu.depth_from_mesh",
        description="Render reference-format depth maps from a dense mesh "
        "(PLY/OBJ, e.g. OpenMVS output) and a COLMAP model — the external "
        "ray-tracer step of the reference's data pipeline, in-framework.",
    )
    parser.add_argument("--mesh", type=Path, required=True,
                        help="triangle mesh in the model's world frame (.ply/.obj)")
    parser.add_argument("--model-dir", type=Path, required=True,
                        help="COLMAP model directory (bin or txt)")
    parser.add_argument("--output-dir", type=Path, required=True,
                        help="where depth_<stem>.png land (use as --depth-dir)")
    parser.add_argument("--format", choices=("png", "bin"), default="png",
                        help="png = reference 16-bit millimeters; bin = COLMAP "
                        "dense float32 meters (no 65.535 m cap)")
    parser.add_argument("--image-list", type=Path, default=None,
                        help="optional .txt of image names to render (default all)")
    parser.add_argument("--znear", type=float, default=0.05,
                        help="near-plane clip distance in meters (default 0.05)")
    parser.add_argument("--supersample", type=float, default=2.0,
                        help="pinhole-grid oversampling for distorted cameras")
    parser.add_argument("--num-workers", type=int, default=4,
                        help="views rendered in parallel")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    from sucre_tpu.scene import Scene

    t0 = time.time()
    mesh = read_mesh(args.mesh)
    scene = Scene.from_colmap(args.model_dir, args.output_dir, args.output_dir)
    views = scene.view_list()
    if args.image_list is not None:
        wanted = [
            ln.strip()
            for ln in args.image_list.read_text().splitlines()
            if ln.strip()
        ]
        views = [scene[name] for name in wanted]
    if not args.quiet:
        print(f"{mesh!r}; rendering {len(views)} views", flush=True)
    stats = generate_depth_maps(
        views, mesh, args.output_dir, fmt=args.format, znear=args.znear,
        supersample=args.supersample, num_workers=args.num_workers,
        verbose=not args.quiet,
    )
    empty = [s["name"] for s in stats if s["coverage"] == 0.0]
    if not args.quiet:
        print(
            f"done: {len(stats)} depth maps in {time.time() - t0:.1f}s "
            f"-> {args.output_dir}",
            flush=True,
        )
    if empty:
        print(
            f"WARNING: {len(empty)} views see no mesh surface: "
            f"{empty[:5]}{'...' if len(empty) > 5 else ''}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
