"""Image/depth decode + host-side prefetch.

Decode semantics are exact parity with the reference (loader.py:156-170):
  - RGB: cv2.imread (BGR) -> RGB, /255 -> float32; resize with INTER_AREA
    when downscaling (target width < source width) else INTER_CUBIC.
  - Depth: 16-bit PNG via IMREAD_UNCHANGED, /1000 -> meters float32;
    resize with INTER_NEAREST.

Where the reference used torch DataLoader worker *processes* for
prefetch (loader.py:133-180), this uses a thread pool: cv2 releases the
GIL during decode, threads avoid fork/pickle overhead, and the decoded
arrays feed ``jax.device_put`` double-buffered against device compute.
A C++ libjpeg/libpng fast path (csrc/) can be swapped in transparently.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from pathlib import Path
from typing import Iterable, Iterator, Sequence

# OpenCV gates EXR decode behind this env var AT IMPORT TIME; without it
# cv2.imread returns None for .exr depth maps (io/depth_formats.py).
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
import cv2
import numpy as np

from sucre_tpu.io.depth_formats import ALT_DEPTH_SUFFIXES as _ALT_DEPTH_SUFFIXES


def load_rgb(rgb_path: Path | str, width: int, height: int) -> np.ndarray:
    """Decode an RGB image to float32 (H, W, 3) in [0, 1], resized to
    (height, width) with the reference's interpolation choice."""
    bgr = cv2.imread(str(rgb_path))
    if bgr is None:
        raise FileNotFoundError(f"Cannot decode image {rgb_path}")
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB) / 255
    if (rgb.shape[0] != height) or (rgb.shape[1] != width):
        rgb = cv2.resize(
            rgb,
            (width, height),
            interpolation=cv2.INTER_AREA if width < rgb.shape[1] else cv2.INTER_CUBIC,
        )
    return np.ascontiguousarray(rgb, dtype=np.float32)


def load_depth_map(depth_map_path: Path | str, width: int, height: int) -> np.ndarray:
    """Decode a depth map to float32 meters (H, W), resized with
    INTER_NEAREST.

    16-bit millimeter PNG is the reference format (loader.py:166-170,
    exact parity); COLMAP dense ``.bin`` / ``.npy`` / float TIFF/EXR are
    read via io.depth_formats (meters for float sources, quantized to
    whole millimeters when the range fits uint16 — see that module)."""
    suffix = Path(depth_map_path).suffix.lower()
    if suffix in _ALT_DEPTH_SUFFIXES:
        from sucre_tpu.io.depth_formats import read_depth_any

        raw = read_depth_any(depth_map_path)
        depth = raw / 1000 if np.issubdtype(raw.dtype, np.integer) else raw
    else:
        raw = cv2.imread(str(depth_map_path), cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise FileNotFoundError(f"Cannot decode depth map {depth_map_path}")
        if raw.ndim == 3:
            # multi-channel depth PNG (editor/exporter artifact): collapse
            # to one plane exactly like the TIFF/EXR path, instead of
            # returning an (H, W, 3) "depth map"
            from sucre_tpu.io.depth_formats import _collapse_channels

            raw = _collapse_channels(depth_map_path, raw)
        depth = raw / 1000
    if (depth.shape[0] != height) or (depth.shape[1] != width):
        depth = cv2.resize(depth, (width, height), interpolation=cv2.INTER_NEAREST)
    return np.ascontiguousarray(depth, dtype=np.float32)


def _native():
    """The C++ decode module, or None if not built."""
    try:
        from sucre_tpu.io import native

        if native.available():
            return native
    except Exception:
        pass
    return None


def load_rgb_raw(rgb_path: Path | str, width: int, height: int) -> np.ndarray:
    """Decode RGB keeping uint8 (exact when unresized: u8/255 on device
    equals the f32 decode). DOWNSCALING (image_scale < 1, the flag's
    common use) resamples in the uint8 domain — cv2's fixed-point
    INTER_AREA rounds at most 1 LSB (~4e-3) differently from the
    reference's float-domain resize (measured 0.00196 max), far below
    the 8-bit artifact quantization and the 0.1 dB parity bar (see
    tests/test_reference_parity.py::test_image_scale_full_parity) —
    keeping the packed single-gather matching path + 4x cheaper H2D.
    UPSCALING falls back to the float path: the reference's
    float-domain INTER_CUBIC overshoots outside [0, 1] (measured down
    to -0.17 / up to 1.19) and those unclipped values are load-bearing
    observation colors, which uint8 cannot represent.

    Uses the native libjpeg/libpng decoder (csrc/image_codec.cpp) when
    built; cv2 otherwise.
    """
    nat = _native()
    if nat is not None:
        try:
            w, h, _ = nat.probe(rgb_path)
            if (w, h) == (width, height):
                return nat.decode_rgb8(rgb_path, width, height)
        except Exception:
            pass
    bgr = cv2.imread(str(rgb_path))
    if bgr is None:
        raise FileNotFoundError(f"Cannot decode image {rgb_path}")
    if bgr.shape[0] == height and bgr.shape[1] == width:
        return np.ascontiguousarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    if width < bgr.shape[1]:
        bgr = cv2.resize(bgr, (width, height), interpolation=cv2.INTER_AREA)
        return np.ascontiguousarray(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    # upscale: the reference's float-domain INTER_CUBIC (overshoots are
    # load-bearing, see docstring) on the ALREADY-decoded pixels — a
    # load_rgb call here would decode the file a second time
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB) / 255
    rgb = cv2.resize(rgb, (width, height), interpolation=cv2.INTER_CUBIC)
    return np.ascontiguousarray(rgb, dtype=np.float32)


def load_depth_raw(depth_map_path: Path | str, width: int, height: int) -> np.ndarray:
    """Decode depth keeping uint16 millimeters (INTER_NEAREST resampling
    commutes with the /1000 scale, so this is always exact parity).

    Native libpng 16-bit decode when built; cv2 otherwise. Non-PNG
    formats (COLMAP dense .bin, .npy, float TIFF/EXR) come back uint16
    millimeters when their range fits, float32 meters otherwise (the
    float case routes matching off the packed fast path automatically).
    """
    suffix = Path(depth_map_path).suffix.lower()
    if suffix in _ALT_DEPTH_SUFFIXES:
        from sucre_tpu.io.depth_formats import read_depth_any

        raw = read_depth_any(depth_map_path)
        if raw.shape[0] != height or raw.shape[1] != width:
            raw = cv2.resize(raw, (width, height), interpolation=cv2.INTER_NEAREST)
        return np.ascontiguousarray(raw)
    nat = _native()
    if nat is not None:
        try:
            w, h, kind = nat.probe(depth_map_path)
            if kind == "png" and (w, h) == (width, height):
                return nat.decode_depth_png16(depth_map_path, width, height)
        except Exception:
            pass
    raw = cv2.imread(str(depth_map_path), cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(f"Cannot decode depth map {depth_map_path}")
    if raw.ndim == 3:
        from sucre_tpu.io.depth_formats import _collapse_channels

        raw = _collapse_channels(depth_map_path, raw)
    if raw.shape[0] != height or raw.shape[1] != width:
        raw = cv2.resize(raw, (width, height), interpolation=cv2.INTER_NEAREST)
    return np.ascontiguousarray(raw)


def rgb_to_f32(rgb: np.ndarray) -> np.ndarray:
    """Host-side raw->float conversion (no-op on float input)."""
    if np.issubdtype(rgb.dtype, np.integer):
        return (rgb / 255).astype(np.float32)
    return rgb


def depth_to_f32(depth: np.ndarray) -> np.ndarray:
    if np.issubdtype(depth.dtype, np.integer):
        return (depth / 1000).astype(np.float32)
    return depth


def load_view_arrays(
    view, *, rgb: bool = True, depth: bool = True, raw: bool = False
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Load (rgb, depth) for a Scene View at its scaled dimensions.

    ``raw=True`` keeps compact integer dtypes (u8/u16) for cheap
    host->device transfer; convert with rgb_to_f32/depth_to_f32 or let
    the matching kernel convert on device.
    """
    return _decode_job(
        view.rgb_path, view.depth_path, view.width, view.height, rgb, depth, raw
    )


def _decode_job(
    rgb_path, depth_path, width: int, height: int,
    rgb: bool, depth: bool, raw: bool,
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Process-pool work unit: plain-path args (no View pickling), so a
    spawn-context child only imports this module."""
    if raw:
        r = load_rgb_raw(rgb_path, width, height) if rgb else None
        d = load_depth_raw(depth_path, width, height) if depth else None
    else:
        r = load_rgb(rgb_path, width, height) if rgb else None
        d = load_depth_map(depth_path, width, height) if depth else None
    return r, d


def prefetch_views(
    views: Sequence,
    *,
    rgb: bool = True,
    depth: bool = True,
    num_workers: int = 0,
    lookahead: int = 4,
    raw: bool = False,
    processes: bool = False,
) -> Iterator[tuple[int, np.ndarray | None, np.ndarray | None]]:
    """Iterate (index, rgb, depth) over views with lookahead decode.

    ``num_workers=0`` decodes synchronously on the calling thread (parity
    with the reference's DataLoader(num_workers=0)). Otherwise a worker
    pool keeps up to ``lookahead`` decoded images in flight, overlapping
    host decode with device compute. The pool is threads by default —
    cv2/libjpeg release the GIL, and threads skip fork/pickle overhead.
    ``processes=True`` uses spawn-context worker PROCESSES instead (the
    reference's DataLoader model, loader.py:173-180): only worth it when
    the decode path holds the GIL (pure-Python alt-format readers), at
    the cost of per-worker interpreter startup and result pickling.
    """
    if num_workers <= 0:
        for i, v in enumerate(views):
            r, d = load_view_arrays(v, rgb=rgb, depth=depth, raw=raw)
            yield i, r, d
        return

    if processes:
        import multiprocessing as mp

        # spawn, not fork: this process may hold initialized JAX/XLA
        # runtime threads that a forked child would inherit mid-state
        pool = cf.ProcessPoolExecutor(
            max_workers=num_workers, mp_context=mp.get_context("spawn")
        )

        def submit(v):
            return pool.submit(
                _decode_job, v.rgb_path, v.depth_path, v.width, v.height,
                rgb, depth, raw,
            )
    else:
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)

        def submit(v):
            return pool.submit(load_view_arrays, v, rgb=rgb, depth=depth, raw=raw)

    with pool:
        pending: dict[int, cf.Future] = {}
        next_submit = 0
        next_yield = 0
        n = len(views)
        while next_yield < n:
            while next_submit < n and len(pending) < max(lookahead, num_workers):
                pending[next_submit] = submit(views[next_submit])
                next_submit += 1
            r, d = pending.pop(next_yield).result()
            yield next_yield, r, d
            next_yield += 1


def batched(iterable: Iterable, n: int) -> Iterator[list]:
    """Yield lists of up to n consecutive items."""
    batch: list = []
    for item in iterable:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch
