"""Visualization / artifact export (parity: sucre.py:84-121).

Artifacts per restored image (same names as the reference):
  <stem>_rgb[_NNNN].png             percentile-normalized restored image
  <stem>_reconstruction[_NNNN].png  formation model re-rendered from own depth
  <stem>_vignetting[_NNNN].png      jet-mapped light footprint (light model)
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np
from PIL import Image as PILImage

import jax
import jax.numpy as jnp

from sucre_tpu.models.sucre import SucreParams, compute_l_z, formation_forward
from sucre_tpu.ops import distortion as distortion_ops
from sucre_tpu.ops.pinhole import pixel_grid


def plot_J(J: np.ndarray, valid: np.ndarray) -> PILImage.Image:
    """Percentile-normalize the restored image for display.

    Parity with sucre.py:84-94: per-channel clip to [p1, p99] computed
    over valid pixels, then min-max normalize; invalid pixels black.
    ``valid`` is (H, W) bool (the reference encodes it as non-NaN).
    """
    J = np.asarray(J, np.float64).copy()
    valid = np.asarray(valid, bool)
    if valid.any():
        J_valid = J[valid]
        lo = np.percentile(J_valid, 1, axis=0)
        hi = np.percentile(J_valid, 99, axis=0)
        J_valid = np.clip(J_valid, lo, hi)
        J_valid = J_valid - np.min(J_valid, axis=0)
        maxv = np.max(J_valid, axis=0)
        maxv[maxv == 0] = 1.0
        J_valid = J_valid / maxv
        J[~valid] = 0.0
        J[valid] = J_valid
    else:
        J[:] = 0.0
    return PILImage.fromarray(np.uint8(J * 255))


@partial(jax.jit, static_argnames=("dist_model",))
def _render_reconstruction_jit(params, J, intr4, d, dist=None, dist_model="none"):
    H, W = d.shape
    u, v = pixel_grid(H, W)
    valid = d > 0
    # (1, H, W, 3) fake view axis; distorted targets bend the rays
    cP = distortion_ops.unproject_any(intr4, dist, dist_model, u, v, d)[None]
    if dist_model != "none":
        # non-invertible distorted pixels (NaN rays) render as invalid
        valid = valid & jnp.isfinite(cP[0, ..., 0])
        cP = jnp.nan_to_num(cP)
    I_hat = formation_forward(params, J, cP, valid[None])[0]
    I_hat = jnp.clip(I_hat, 0.0, 1.0)
    I_hat = jnp.where(valid[..., None], I_hat, 0.0)
    # quantize on device: 4x smaller device->host fetch, and the PNG is
    # 8-bit anyway (round matches np.uint8(x*255) floor only at exact ints,
    # so keep the reference floor semantics via floor after scaling)
    return jnp.floor(I_hat * 255.0).astype(jnp.uint8)


def render_reconstruction(
    params: SucreParams, J: jnp.ndarray, intrinsics: np.ndarray, depth_map: np.ndarray,
    dist: np.ndarray | None = None, dist_model: str = "none",
) -> np.ndarray:
    """Re-render the observed image from the model and the target's own
    depth map (parity: sucre.py:106-113). Returns (H, W, 3) float in [0, 1];
    invalid-depth pixels are 0. Jitted: one device dispatch."""
    return np.asarray(
        _render_reconstruction_jit(
            params,
            jnp.asarray(J, jnp.float32),
            jnp.asarray(intrinsics, jnp.float32),
            jnp.asarray(depth_map, jnp.float32),
            None if dist is None else jnp.asarray(dist, jnp.float32),
            dist_model=dist_model,
        )
    ).astype(np.float32) / 255.0


@partial(jax.jit, static_argnames=("dist_model",))
def _render_reconstruction_batch_jit(params, J, intr4, d, dist=None,
                                     dist_model="none"):
    if dist_model == "none":
        return jax.vmap(_render_reconstruction_jit)(params, J, intr4, d)
    return jax.vmap(
        lambda p, Jt, i4, dt, dd: _render_reconstruction_jit(
            p, Jt, i4, dt, dd, dist_model=dist_model
        )
    )(params, J, intr4, d, dist)


@jax.jit
def plot_J_batch_device(J, valid):
    """Device-side batched ``plot_J``: per-channel [p1, p99] clip over
    valid pixels + min-max normalize, invalid pixels black, quantized to
    uint8 on device (same math as plot_J; percentiles via sort instead of
    a host round trip). J (T, H, W, 3) f32; valid (T, H, W) bool."""

    def one(Jt, vt):
        Jm = jnp.where(vt[..., None], Jt, jnp.nan)
        flat = Jm.reshape(-1, 3)
        lo = jnp.nanpercentile(flat, 1.0, axis=0)
        hi = jnp.nanpercentile(flat, 99.0, axis=0)
        Jc = jnp.clip(Jm, lo, hi)
        mn = jnp.nanmin(Jc.reshape(-1, 3), axis=0)
        Jc = Jc - mn
        mx = jnp.nanmax(Jc.reshape(-1, 3), axis=0)
        Jn = Jc / jnp.where(mx == 0, 1.0, mx)
        Jn = jnp.where(vt[..., None], Jn, 0.0)
        # np.uint8(x * 255) floor semantics (plot_J parity)
        return jnp.floor(Jn * 255.0).astype(jnp.uint8)

    return jax.vmap(one)(J, valid)


def render_reconstruction_batch(
    params_stacked, J, intrs, depths, dists=None, dist_model: str = "none"
) -> np.ndarray:
    """Batched reconstruction render: one device dispatch + one u8 fetch
    for T targets. ``params_stacked`` has leading-T leaves; J (T, H, W, 3);
    intrs (T, 4); depths (T, H, W). Returns (T, H, W, 3) float in [0, 1].

    Convenience host wrapper over render_reconstruction_batch_device
    (the pipeline uses the device form directly to fold the fetch into
    its batched export transfer)."""
    out = render_reconstruction_batch_device(
        params_stacked,
        jnp.asarray(J, jnp.float32),
        jnp.asarray(np.stack(intrs), jnp.float32),
        jnp.asarray(np.stack(depths), jnp.float32),
        dists_dev=None if dists is None else jnp.asarray(
            np.stack(dists), jnp.float32
        ),
        dist_model=dist_model,
    )
    return np.asarray(out).astype(np.float32) / 255.0


def render_reconstruction_batch_device(params_stacked, J_dev, intrs_dev, depths_dev,
                                       dists_dev=None, dist_model: str = "none"):
    """Async device-side batched render returning the (T, H, W, 3) uint8
    array WITHOUT fetching — callers fold it into one batched device_get
    alongside the other export arrays (and J stays device-resident,
    avoiding a round trip through the host)."""
    return _render_reconstruction_batch_jit(
        params_stacked, J_dev, intrs_dev, depths_dev, dists_dev,
        dist_model=dist_model,
    )


def render_reconstruction_host(
    params: SucreParams, J: np.ndarray, intrinsics, depth_map: np.ndarray,
    dist: np.ndarray | None = None, dist_model: str = "none",
) -> np.ndarray:
    """Host-numpy reconstruction render (no-light model only) — same
    f32 math and floor-quantization as ``_render_reconstruction_jit``.

    Used by the pipelined survey exporter: computing the u8 render on the
    already-fetched J inside the (overlapped) exporter thread saves its
    device->host transfer, which dominates on slow links. Exp ULP
    differences between numpy and XLA can flip a floor boundary on rare
    pixels — within the PNG artifact's own quantization."""
    if params.cam2light is not None:
        raise ValueError("host reconstruction render supports the no-light model only")
    fx, fy, cx, cy = (np.float32(x) for x in np.asarray(intrinsics, np.float32))
    d = np.asarray(depth_map, np.float32)
    H, W = d.shape
    valid = d > 0
    # unproject own depth (ops/pinhole convention: +0.5 pixel centers)
    xs = (np.arange(W, dtype=np.float32) + np.float32(0.5) - cx) / fx
    ys = (np.arange(H, dtype=np.float32) + np.float32(0.5) - cy) / fy
    if dist_model != "none" and dist is not None:
        xr, yr = distortion_ops.undistort(
            dist_model, np.asarray(dist, np.float32), xs[None, :], ys[:, None],
            xp=np,
        )
        valid = valid & np.isfinite(xr)  # NaN rays render as invalid
        X = d * np.nan_to_num(xr)
        Y = d * np.nan_to_num(yr)
    else:
        X = d * xs[None, :]
        Y = d * ys[:, None]
    z = np.sqrt(X * X + Y * Y + d * d, dtype=np.float32)[..., None]
    beta = np.asarray(params.beta, np.float32)
    gamma = np.asarray(params.gamma, np.float32)
    B = np.asarray(params.B, np.float32)
    I_hat = np.nan_to_num(np.asarray(J, np.float32)) * np.exp(-beta * z) + B * (
        1.0 - np.exp(-gamma * z)
    )
    I_hat = np.clip(I_hat, 0.0, 1.0, dtype=np.float32)
    I_hat[~valid] = 0.0
    return np.floor(I_hat * np.float32(255.0)).astype(np.uint8)


@partial(jax.jit, static_argnames=("dist_model",))
def _render_vignetting_jit(params, intr4, d, dist=None, dist_model="none"):
    H, W = d.shape
    u, v = pixel_grid(H, W)
    valid = d > 0
    cP = distortion_ops.unproject_any(intr4, dist, dist_model, u, v, d)
    if dist_model != "none":
        valid = valid & jnp.isfinite(cP[..., 0])
        cP = jnp.nan_to_num(cP)
    l, _ = compute_l_z(params, cP, valid)
    if isinstance(l, float):
        l = jnp.where(valid, 1.0, 0.0)
    return jnp.where(valid, l, 0.0)


def render_vignetting(
    params: SucreParams, intrinsics: np.ndarray, depth_map: np.ndarray,
    dist: np.ndarray | None = None, dist_model: str = "none",
) -> np.ndarray:
    """The light-footprint map l over the target's own depth (parity:
    sucre.py:96-104). Returns (H, W) float; invalid pixels 0."""
    return np.asarray(
        _render_vignetting_jit(
            params, jnp.asarray(intrinsics, jnp.float32),
            jnp.asarray(depth_map, jnp.float32),
            None if dist is None else jnp.asarray(dist, jnp.float32),
            dist_model=dist_model,
        )
    )


def plot_matches(
    rgb1: np.ndarray,
    rgb2: np.ndarray,
    u1: np.ndarray,
    v1: np.ndarray,
    u2: np.ndarray,
    v2: np.ndarray,
    step: int = 10000,
    color: tuple[int, int, int] | None = None,
    seed: int = 0,
) -> PILImage.Image:
    """Debug overlay of pixel correspondences: the two images side by side
    with lines between every ``step``-th match (parity: Matches.plot,
    sfm.py:161-169; random per-line colors unless ``color`` given)."""
    from PIL import ImageDraw

    h = max(rgb1.shape[0], rgb2.shape[0])
    canvas = np.zeros((h, rgb1.shape[1] + rgb2.shape[1], 3), np.float32)
    canvas[: rgb1.shape[0], : rgb1.shape[1]] = rgb1
    canvas[: rgb2.shape[0], rgb1.shape[1] :] = rgb2
    img = PILImage.fromarray(np.uint8(np.clip(canvas, 0, 1) * 255))
    draw = ImageDraw.Draw(img)
    rng = np.random.default_rng(seed)
    for a, b, c, d in zip(u1[::step], v1[::step], u2[::step], v2[::step]):
        fill = tuple(int(x) for x in rng.integers(0, 256, 3)) if color is None else color
        draw.line([(int(a), int(b)), (int(c) + rgb1.shape[1], int(d))], fill=fill, width=3)
    return img


def _write_png(path: Path, image_u8: np.ndarray, compress_level: int = 1) -> None:
    """PNG write via the native libpng encoder when built (fast path for
    artifact export), else PIL."""
    try:
        from sucre_tpu.io import native

        if native.available():
            native.encode_png8(path, image_u8, compress_level)
            return
    except Exception:
        pass
    PILImage.fromarray(image_u8).save(path, compress_level=compress_level)


def save_plots(
    save_dir: Path,
    image_name: str,
    params: SucreParams,
    J: np.ndarray,
    valid: np.ndarray,
    intrinsics: np.ndarray,
    depth_map: np.ndarray,
    iteration: int | None = None,
    reconstruction: np.ndarray | None = None,
    rgb_plot: np.ndarray | None = None,
    dist: np.ndarray | None = None,
    dist_model: str = "none",
    undistort: bool = False,
) -> list[Path]:
    """Write the artifact set with reference-parity filenames
    (sucre.py:115-121). Precomputed ``reconstruction`` / ``rgb_plot``
    arrays (from the batched device export path) skip the per-target
    render dispatch / host percentile-normalize. ``undistort`` adds
    ``<stem>_rgb_undistorted.png`` for distorted cameras — the restored
    image resampled onto the ideal pinhole grid (same intrinsics/dims;
    see utils/undistort.py) — the reference-style deliverable without
    COLMAP's image undistorter; a no-op on pinhole targets."""
    # Mirror the reference's path semantics (sucre.py:116 with_stem):
    # image names with subdirectories keep them, so 'cam0/x.png' and
    # 'cam1/x.png' never overwrite each other's artifacts.
    base = (Path(save_dir) / image_name).with_suffix(".png")
    base.parent.mkdir(parents=True, exist_ok=True)
    save_dir = base.parent
    stem = base.stem
    suffix = "" if iteration is None else f"_{iteration:04d}"
    written = []

    p = save_dir / f"{stem}_rgb{suffix}.png"
    if rgb_plot is not None:
        _write_png(p, np.asarray(rgb_plot))
    else:
        _write_png(p, np.asarray(plot_J(J, valid)))
    written.append(p)

    if undistort and dist_model != "none":
        from sucre_tpu.utils.undistort import undistort_image

        J_und, valid_und = undistort_image(
            np.asarray(J, np.float32), valid, intrinsics, dist, dist_model
        )
        p = save_dir / f"{stem}_rgb_undistorted{suffix}.png"
        _write_png(p, np.asarray(plot_J(J_und, valid_und)))
        written.append(p)

    p = save_dir / f"{stem}_reconstruction{suffix}.png"
    rec = (
        reconstruction
        if reconstruction is not None
        else render_reconstruction(params, J, intrinsics, depth_map,
                                   dist=dist, dist_model=dist_model)
    )
    rec_u8 = rec if rec.dtype == np.uint8 else np.uint8(rec * 255)
    _write_png(p, rec_u8)
    written.append(p)

    if params.cam2light is not None:
        try:
            import matplotlib
        except ImportError:
            import sys

            print(
                "WARNING: matplotlib not installed (the 'viz' extra) — "
                "skipping the vignetting colormap PNG; all other "
                "artifacts were written.",
                file=sys.stderr,
            )
            return written
        p = save_dir / f"{stem}_vignetting{suffix}.png"
        l_map = render_vignetting(params, intrinsics, depth_map,
                                  dist=dist, dist_model=dist_model)
        rgb = matplotlib.colormaps["jet"](l_map)[:, :, :3]
        _write_png(p, np.uint8(rgb * 255))
        written.append(p)
    return written
