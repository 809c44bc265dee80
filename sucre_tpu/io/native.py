"""ctypes bindings for the native C++ layer (csrc/libsucre_native.so).

Provides:
  - ``read_model_native(model_dir)`` — COLMAP cameras.bin/images.bin via
    the C++ one-pass parser (csrc/colmap_reader.cpp), returning the same
    dict-of-dataclasses as io.colmap.read_model (points2D omitted — the
    pipeline never uses them; fall back to the Python parser if needed).
  - ``decode_depth_png16 / decode_rgb8`` — direct libpng/libjpeg decode
    into numpy buffers (csrc/image_codec.cpp).
  - ``decode_batch`` — thread-pooled batched decode (GIL released for
    the whole batch).
  - ``raster_depth`` — threaded z-buffer mesh rasterizer
    (csrc/depth_raster.cpp) backing sucre_tpu.depth_from_mesh.

All entry points raise ``NativeUnavailable`` when the shared library is
absent; callers fall back to the pure-Python/cv2 paths. Build with
``make -C csrc``.
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path

import numpy as np

from sucre_tpu.io.colmap import CAMERA_MODELS, ColmapCamera, ColmapImage


class NativeUnavailable(RuntimeError):
    pass


_SEARCH_PATHS = [
    Path(__file__).resolve().parent.parent.parent / "csrc" / "libsucre_native.so",
    Path(__file__).resolve().parent / "libsucre_native.so",
]


class _ColmapModelStruct(ctypes.Structure):
    _fields_ = [
        ("n_cameras", ctypes.c_int64),
        ("cam_ids", ctypes.POINTER(ctypes.c_int32)),
        ("cam_models", ctypes.POINTER(ctypes.c_int32)),
        ("cam_widths", ctypes.POINTER(ctypes.c_int64)),
        ("cam_heights", ctypes.POINTER(ctypes.c_int64)),
        ("cam_params", ctypes.POINTER(ctypes.c_double)),
        ("n_images", ctypes.c_int64),
        ("img_ids", ctypes.POINTER(ctypes.c_int32)),
        ("img_camera_ids", ctypes.POINTER(ctypes.c_int32)),
        ("img_qvecs", ctypes.POINTER(ctypes.c_double)),
        ("img_tvecs", ctypes.POINTER(ctypes.c_double)),
        ("img_names", ctypes.POINTER(ctypes.c_char)),  # NUL-separated blob
        ("img_names_len", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
    ]


@functools.cache
def _lib() -> ctypes.CDLL:
    for p in _SEARCH_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.colmap_read_model.restype = ctypes.POINTER(_ColmapModelStruct)
            lib.colmap_read_model.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.colmap_free_model.argtypes = [ctypes.POINTER(_ColmapModelStruct)]
            lib.image_probe.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.decode_depth_png16.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.decode_rgb8.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            try:  # absent from .so builds older than the encoder
                lib.encode_png8.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                ]
            except AttributeError:
                pass
            try:  # absent from .so builds older than the rasterizer
                lib.sucre_raster_depth.restype = ctypes.c_int32
                lib.sucre_raster_depth.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.c_double,
                    ctypes.c_double,
                    ctypes.c_double,
                    ctypes.c_double,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_double,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_float),
                ]
            except AttributeError:
                pass
            try:  # absent from .so builds older than the batch pool
                lib.decode_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint16)),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                ]
            except AttributeError:
                pass
            return lib
    raise NativeUnavailable(
        "libsucre_native.so not built; run `make -C csrc` (falls back to "
        "Python/cv2 paths)"
    )


def available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def read_model_native(
    model_dir: Path | str,
) -> tuple[dict[int, ColmapCamera], dict[int, ColmapImage]]:
    """Parse cameras.bin/images.bin with the C++ reader."""
    lib = _lib()
    model_dir = Path(model_dir)
    mp = lib.colmap_read_model(
        str(model_dir / "cameras.bin").encode(), str(model_dir / "images.bin").encode()
    )
    if not mp:
        raise MemoryError("colmap_read_model allocation failed")
    try:
        m = mp.contents
        if m.error and m.error != b"":
            raise ValueError(f"COLMAP parse error: {m.error.decode()}")
        nc = m.n_cameras
        cam_ids = np.ctypeslib.as_array(m.cam_ids, (nc,)).copy()
        cam_models = np.ctypeslib.as_array(m.cam_models, (nc,)).copy()
        widths = np.ctypeslib.as_array(m.cam_widths, (nc,)).copy()
        heights = np.ctypeslib.as_array(m.cam_heights, (nc,)).copy()
        params = np.ctypeslib.as_array(m.cam_params, (nc, 12)).copy()
        cameras: dict[int, ColmapCamera] = {}
        for i in range(nc):
            name, n_params = CAMERA_MODELS[int(cam_models[i])]
            cameras[int(cam_ids[i])] = ColmapCamera(
                camera_id=int(cam_ids[i]),
                model=name,
                width=int(widths[i]),
                height=int(heights[i]),
                params=params[i, :n_params].copy(),
            )

        ni = m.n_images
        img_ids = np.ctypeslib.as_array(m.img_ids, (ni,)).copy()
        img_cams = np.ctypeslib.as_array(m.img_camera_ids, (ni,)).copy()
        qvecs = np.ctypeslib.as_array(m.img_qvecs, (ni, 4)).copy()
        tvecs = np.ctypeslib.as_array(m.img_tvecs, (ni, 3)).copy()
        names_blob = ctypes.string_at(m.img_names, m.img_names_len)
        names = names_blob.decode("utf-8").split("\x00")[:-1] if ni else []
        images: dict[int, ColmapImage] = {}
        for i in range(ni):
            images[int(img_ids[i])] = ColmapImage(
                image_id=int(img_ids[i]),
                qvec=qvecs[i].copy(),
                tvec=tvecs[i].copy(),
                camera_id=int(img_cams[i]),
                name=names[i],
                xys=np.zeros((0, 2)),
                point3D_ids=np.zeros((0,), np.int64),
            )
        return cameras, images
    finally:
        lib.colmap_free_model(mp)


def probe(path: Path | str) -> tuple[int, int, str]:
    """(width, height, 'png'|'jpeg') of an image file."""
    lib = _lib()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    kind = ctypes.c_int32()
    rc = lib.image_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(kind))
    if rc != 0:
        raise IOError(f"cannot probe image {path}")
    return w.value, h.value, {1: "png", 2: "jpeg"}[kind.value]


def decode_depth_png16(path: Path | str, width: int, height: int) -> np.ndarray:
    """16-bit grayscale PNG -> (H, W) uint16 (raw millimeters)."""
    lib = _lib()
    out = np.empty((height, width), np.uint16)
    rc = lib.decode_depth_png16(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        width,
        height,
    )
    if rc != 0:
        raise IOError(f"native depth decode failed ({rc}) for {path}")
    return out


def decode_rgb8(path: Path | str, width: int, height: int) -> np.ndarray:
    """8-bit RGB JPEG/PNG -> (H, W, 3) uint8."""
    lib = _lib()
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.decode_rgb8(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width,
        height,
    )
    if rc != 0:
        raise IOError(f"native rgb decode failed ({rc}) for {path}")
    return out


def encode_png8(
    path: Path | str, image: np.ndarray, compress_level: int = 1
) -> None:
    """(H, W[, 3]) uint8 -> PNG file via libpng (GIL released during the
    encode — the artifact-export hot path)."""
    lib = _lib()
    if not hasattr(lib, "encode_png8"):
        raise NativeUnavailable("libsucre_native.so predates encode_png8; rebuild")
    image = np.ascontiguousarray(image, np.uint8)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    rc = lib.encode_png8(
        str(path).encode(),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, c, compress_level,
    )
    if rc != 0:
        raise IOError(f"native png encode failed ({rc}) for {path}")


def decode_batch(
    jobs: list[tuple[Path | str, str, int, int]], n_threads: int = 4
) -> list[np.ndarray]:
    """Decode a batch of files on a C++ thread pool.

    jobs: (path, kind, width, height) with kind in {'depth16', 'rgb8'}.
    Returns arrays in job order (uint16 (H,W) or uint8 (H,W,3)).
    """
    lib = _lib()
    if not hasattr(lib, "decode_batch"):
        raise NativeUnavailable(
            "libsucre_native.so predates decode_batch; rebuild with "
            "`make -C csrc`"
        )
    n = len(jobs)
    outs: list[np.ndarray] = []
    paths = (ctypes.c_char_p * n)()
    kinds = (ctypes.c_int32 * n)()
    p16 = (ctypes.POINTER(ctypes.c_uint16) * n)()
    p8 = (ctypes.POINTER(ctypes.c_uint8) * n)()
    widths = (ctypes.c_int32 * n)()
    heights = (ctypes.c_int32 * n)()
    statuses = (ctypes.c_int32 * n)()
    for i, (path, kind, w, h) in enumerate(jobs):
        paths[i] = str(path).encode()
        widths[i] = w
        heights[i] = h
        if kind == "depth16":
            arr = np.empty((h, w), np.uint16)
            kinds[i] = 1
            p16[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
        elif kind == "rgb8":
            arr = np.empty((h, w, 3), np.uint8)
            kinds[i] = 2
            p8[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        else:
            raise ValueError(f"unknown decode kind {kind!r}")
        outs.append(arr)
    failures = lib.decode_batch(paths, kinds, p16, p8, widths, heights, n, n_threads, statuses)
    if failures:
        bad = [(str(jobs[i][0]), statuses[i]) for i in range(n) if statuses[i] != 0]
        raise IOError(f"native batch decode: {failures} failures: {bad[:5]}")
    return outs


def raster_depth(
    verts_cam: np.ndarray,
    faces: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    znear: float = 0.05,
    n_threads: int = 4,
) -> np.ndarray:
    """Z-buffer rasterize camera-frame triangles to an (H, W) float32
    Z-depth map (0 = no hit) on the C++ thread pool
    (csrc/depth_raster.cpp). Pixel (u, v) samples the ray through
    (u + 0.5, v + 0.5); 1/z interpolates linearly in screen space."""
    lib = _lib()
    if not hasattr(lib, "sucre_raster_depth"):
        raise NativeUnavailable("libsucre_native.so predates the rasterizer; "
                                "rebuild with `make -C csrc`")
    verts_cam = np.ascontiguousarray(verts_cam, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty((height, width), np.float32)
    rc = lib.sucre_raster_depth(
        verts_cam.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(verts_cam),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(faces),
        fx,
        fy,
        cx,
        cy,
        width,
        height,
        znear,
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("sucre_raster_depth: bad arguments (face index out "
                         "of range, non-positive dims, or znear <= 0)")
    return out
