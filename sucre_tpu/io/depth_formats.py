"""Depth-map input formats beyond the reference's 16-bit PNG.

The reference reads exactly one depth format — 16-bit millimeter PNG
(loader.py:166-170) — so its README's "data processing pipeline" ends
with users hand-converting whatever their dense-reconstruction stack
produced. Real COLMAP workflows already *have* dense depth:
``colmap patch_match_stereo`` writes
``stereo/depth_maps/<image name>.geometric.bin`` in COLMAP's dense
array format. This module reads those directly, plus the common float
containers (``.npy``, float TIFF/EXR), so ``--depth-dir`` can point
straight at a COLMAP dense workspace with zero conversion scripts.

Unit semantics: integer sources are MILLIMETERS (reference parity);
float sources are METERS (COLMAP reconstruction units). Float maps are
quantized to whole millimeters at decode when they fit uint16 — exactly
the ``np.round(d * 1000)`` conversion a user targeting the reference
format would run — so results are bit-identical to a converted-to-PNG
run and the packed single-gather matching fast path stays active. Maps
with depths beyond 65.535 m stay float32 meters and route through the
generic (two-gather) matching path automatically. Non-finite values
(NaN/Inf — geometric-filtered COLMAP maps use them for "no depth") and
negatives become 0, the reference's invalid-depth marker.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# Suffixes read by this module (everything else goes to the PNG path).
# Order = scene.resolve_depth_path's candidate order after the reference
# depth_<stem>.png default; keep the single-channel containers first.
ALT_DEPTH_SUFFIXES = (".npy", ".tif", ".tiff", ".exr", ".bin")


def read_colmap_array_header(path: Path | str) -> tuple[int, int, int, int]:
    """(width, height, channels, data_offset) of a COLMAP dense array.

    The format is an ASCII ``{width}&{height}&{channels}&`` header
    followed by the raw little-endian float32 payload.
    """
    with Path(path).open("rb") as f:
        head = f.read(64)
    parts = head.split(b"&", 3)
    if len(parts) < 4:
        raise ValueError(f"{path}: not a COLMAP dense array (no w&h&c& header)")
    try:
        w, h, c = (int(p) for p in parts[:3])
    except ValueError:
        raise ValueError(
            f"{path}: not a COLMAP dense array (non-integer header)"
        ) from None
    if w <= 0 or h <= 0 or c <= 0:
        raise ValueError(f"{path}: bad COLMAP dense array dims {w}x{h}x{c}")
    offset = len(parts[0]) + len(parts[1]) + len(parts[2]) + 3
    return w, h, c, offset


def read_colmap_array(path: Path | str) -> np.ndarray:
    """Read a COLMAP dense array (.bin) as (H, W) or (H, W, C) float32.

    The payload orders x fastest, then y, then channel — i.e. C-order
    (C, H, W) — matching COLMAP's ``read_array`` (reshape((w, h, c),
    order="F") + transpose).
    """
    w, h, c, offset = read_colmap_array_header(path)
    data = np.fromfile(path, dtype="<f4", offset=offset)
    if data.size != w * h * c:
        raise ValueError(
            f"{path}: COLMAP dense array payload is {data.size} floats, "
            f"header says {w}x{h}x{c} = {w * h * c}"
        )
    arr = data.reshape(c, h, w)
    return arr[0] if c == 1 else np.moveaxis(arr, 0, -1)


def write_colmap_array(path: Path | str, arr: np.ndarray) -> None:
    """Write (H, W[, C]) float32 in COLMAP's dense array format."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    with Path(path).open("wb") as f:
        f.write(f"{w}&{h}&{c}&".encode())
        np.ascontiguousarray(np.moveaxis(arr, -1, 0)).astype("<f4").tofile(f)


def _finalize_meters(depth: np.ndarray) -> np.ndarray:
    """Sanitize float meters and quantize to u16 millimeters when exact.

    Quantization is the same np.round(d*1000) every reference-format
    converter applies, so downstream results match a PNG-converted run
    bit for bit; out-of-u16-range maps stay float32 (see module doc).
    """
    depth = np.asarray(depth, dtype=np.float32)
    depth = np.where(np.isfinite(depth) & (depth > 0), depth, np.float32(0))
    mm = np.round(depth.astype(np.float64) * 1000.0)
    if np.max(mm, initial=0.0) <= np.iinfo(np.uint16).max:
        return mm.astype(np.uint16)
    return np.ascontiguousarray(depth)


def _finalize_mm_int(mm: np.ndarray) -> np.ndarray:
    """Integer millimeters -> u16 mm, or float32 meters when out of range."""
    mm = np.where(mm > 0, mm, 0)
    if np.max(mm, initial=0) <= np.iinfo(np.uint16).max:
        return mm.astype(np.uint16)
    return (mm.astype(np.float64) / 1000.0).astype(np.float32)


def _collapse_channels(path, arr: np.ndarray) -> np.ndarray:
    """Multi-channel TIFF/EXR depth -> one (H, W) plane.

    Exporters pad single-plane depth three ways: replicating the value
    across channels (take any), writing it into ONE channel with the rest
    zero (common for EXR depth passes — often R, which is channel 2 under
    OpenCV's BGR ordering), or pairing it with a CONSTANT alpha plane
    (gray+alpha TIFF, or RGBA with depth in any one channel — including
    the alpha itself). Picking a fixed channel would silently decode a
    zero or constant plane as an all-invalid map, so detect the carrying
    channel; genuinely conflicting planes raise."""
    n = arr.shape[2]
    first = arr[..., 0]
    # equal_nan: geometric-filtered float maps carry NaN at no-depth
    # pixels; replicated channels must still count as equal there
    if all(
        np.array_equal(arr[..., i], first, equal_nan=True)
        for i in range(1, n)
    ):
        return first

    def _pick(i):
        import sys

        print(
            f"WARNING: {path}: depth lives in channel {i} of a "
            f"{n}-channel image (the others are zero or constant "
            f"padding); using it.",
            file=sys.stderr,
        )
        return arr[..., i]

    nonzero = [i for i in range(n) if np.any(arr[..., i])]
    if len(nonzero) == 1:
        return _pick(nonzero[0])
    # Constant non-zero planes are alpha/padding fill, not depth: drop
    # them and retry (a real depth plane varies across the image).
    varying = [i for i in nonzero if arr[..., i].min() != arr[..., i].max()]
    if len(varying) == 1:
        return _pick(varying[0])
    if varying and all(
        np.array_equal(arr[..., i], arr[..., varying[0]], equal_nan=True)
        for i in varying[1:]
    ):
        return arr[..., varying[0]]
    if not varying:
        # Every non-zero plane is CONSTANT (a genuinely flat depth map
        # paired with constant alpha/padding). Equal planes are one
        # value replicated; otherwise a trailing alpha plane on 2/4
        # channel (gray+alpha / RGBA) images is fill — drop it and
        # accept a consensus among the rest.
        if all(
            np.array_equal(arr[..., i], arr[..., nonzero[0]], equal_nan=True)
            for i in nonzero[1:]
        ):
            return _pick(nonzero[0])
        if n in (2, 4):
            body = [i for i in nonzero if i != n - 1]
            if body and all(
                np.array_equal(arr[..., i], arr[..., body[0]], equal_nan=True)
                for i in body[1:]
            ):
                return _pick(body[0])
    raise ValueError(
        f"{path}: {n}-channel depth map with differing non-zero "
        f"channels — ambiguous (export depth as a single plane, or "
        f"replicate it across channels)"
    )


def _tiff_stored_dtype(path: Path) -> np.dtype:
    """Sample dtype from the first IFD's BitsPerSample (258) +
    SampleFormat (339) tags — header-only, no pixel decode."""
    import struct

    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8 or head[:2] not in (b"II", b"MM"):
            raise ValueError("not a TIFF")
        en = "<" if head[:2] == b"II" else ">"
        if struct.unpack(en + "H", head[2:4])[0] != 42:
            raise ValueError("unsupported TIFF variant (BigTIFF?)")
        f.seek(struct.unpack(en + "I", head[4:8])[0])
        (count,) = struct.unpack(en + "H", f.read(2))
        bits, fmt = 8, 1  # TIFF defaults: 8-bit unsigned
        for _ in range(count):
            e = f.read(12)
            tag, _typ, cnt = struct.unpack(en + "HHI", e[:8])
            if tag not in (258, 339):
                continue
            # TIFF stores the value INLINE in the 4-byte field whenever
            # cnt * sizeof(SHORT) fits (e.g. gray+alpha's two SHORTs);
            # only larger counts indirect through a file offset
            if cnt * 2 <= 4:
                (val,) = struct.unpack(en + "H", e[8:10])
            else:  # per-channel SHORTs at an offset (channels agree here)
                pos = f.tell()
                f.seek(struct.unpack(en + "I", e[8:12])[0])
                (val,) = struct.unpack(en + "H", f.read(2))
                f.seek(pos)
            if tag == 258:
                bits = val
            else:
                fmt = val
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    # bits == 0 can reach here from a malformed/big-endian-4-byte-typed
    # BitsPerSample tag; np.dtype('u0') would raise TypeError outside
    # callers' fallback catches, so reject it as unsupported instead.
    if kind is None or bits == 0 or bits % 8 or bits > 64:
        raise ValueError(f"unsupported TIFF sample format {fmt}/{bits}")
    return np.dtype(f"{kind}{bits // 8}")


def _exr_stored_dtype(path: Path) -> np.dtype:
    """Pixel type of the first channel in the EXR header's chlist —
    header-only. HALF reports float16 (the true stored width; a cv2
    decode would widen it to float32)."""
    import struct

    with open(path, "rb") as f:
        if f.read(4) != b"\x76\x2f\x31\x01":
            raise ValueError("not an EXR")
        f.read(4)  # version/flags

        def cstr() -> bytes:
            bs = bytearray()
            while True:
                c = f.read(1)
                if not c or c == b"\0":
                    return bytes(bs)
                bs += c

        while True:
            name = cstr()
            if not name:  # end of header before a channels attribute
                raise ValueError("EXR header has no channels attribute")
            typ = cstr()
            (size,) = struct.unpack("<I", f.read(4))
            if name == b"channels" and typ == b"chlist":
                if not cstr():  # first channel name; empty = end of list
                    raise ValueError("empty EXR channel list")
                (ptype,) = struct.unpack("<i", f.read(4))
                try:
                    return {
                        0: np.dtype(np.uint32),
                        1: np.dtype(np.float16),
                        2: np.dtype(np.float32),
                    }[ptype]
                except KeyError:
                    raise ValueError(f"unknown EXR pixel type {ptype}")
            f.seek(size, 1)


def source_dtype(path: Path | str) -> np.dtype:
    """Dtype of the STORED depth payload (before any unit conversion) —
    the validator's unit-mistake heuristics need the on-disk width, which
    ``read_depth_any``'s u16-mm normalization erases. Header-only for
    every format (deep validation already pays one full decode per view;
    this must not add a second); falls back to a cv2 decode only when a
    TIFF/EXR header is an unsupported variant."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".bin":
        return np.dtype("<f4")
    if suffix == ".npy":
        # mmap: header-only read, public API
        return np.load(path, mmap_mode="r", allow_pickle=False).dtype
    if suffix in (".tif", ".tiff", ".exr"):
        import struct as _struct

        try:
            if suffix == ".exr":
                return _exr_stored_dtype(path)
            return _tiff_stored_dtype(path)
        except (ValueError, _struct.error):
            # unparseable/truncated header: fall back to a full decode
            pass
        import os

        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise FileNotFoundError(f"Cannot decode depth map {path}")
        return arr.dtype
    raise ValueError(f"Unsupported depth format: {path}")


def read_depth_any(path: Path | str) -> np.ndarray:
    """Decode a non-PNG depth map to (H, W) uint16 millimeters (when the
    range fits) or float32 meters. See module doc for unit rules."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".bin":
        arr = read_colmap_array(path)
        if arr.ndim != 2:
            raise ValueError(
                f"{path}: COLMAP dense array has {arr.shape[-1]} channels; "
                f"depth maps have 1 (this looks like a normal map)"
            )
        return _finalize_meters(arr)
    if suffix == ".npy":
        arr = np.load(path, allow_pickle=False)
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[..., 0]
        if arr.ndim != 2:
            raise ValueError(f"{path}: depth .npy must be (H, W), got {arr.shape}")
        if np.issubdtype(arr.dtype, np.integer):
            return _finalize_mm_int(arr)
        return _finalize_meters(arr)
    if suffix in (".tif", ".tiff", ".exr"):
        import os

        # cv2 reads this env var at import; harmless if already imported
        # with it set (sucre_tpu.io.images sets it before its import)
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if arr is None:
            hint = (
                " (EXR decode needs the OPENCV_IO_ENABLE_OPENEXR=1 "
                "environment variable set before OpenCV is first "
                "imported — export it before launch)"
                if suffix == ".exr"
                else ""
            )
            raise FileNotFoundError(f"Cannot decode depth map {path}{hint}")
        if arr.ndim == 3:
            arr = _collapse_channels(path, arr)
        if np.issubdtype(arr.dtype, np.integer):
            return _finalize_mm_int(arr)
        return _finalize_meters(arr)
    raise ValueError(f"Unsupported depth format: {path}")
