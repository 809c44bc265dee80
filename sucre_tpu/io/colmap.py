"""COLMAP sparse-reconstruction reader/writer (own implementation).

The reference delegates parsing to pycolmap's C++ binding
(sfm.py:186-238 via ``pycolmap.Reconstruction``). This framework owns
the format natively: the COLMAP binary layout is a small fixed
little-endian struct encoding, parsed here with numpy (a C++ fast path
for very large models lives in csrc/colmap_reader.cpp, used
transparently when the compiled library is present).

Supported: ``cameras.bin/.txt``, ``images.bin/.txt``,
``points3D.bin/.txt`` — read and write, so tests can round-trip models
and users can export.

Binary layout (little-endian):
  cameras.bin   u64 n; per camera: i32 camera_id, i32 model_id,
                u64 width, u64 height, f64 params[num_params(model)]
  images.bin    u64 n; per image: u32 image_id, f64 qw qx qy qz,
                f64 tx ty tz, u32 camera_id, name bytes + b'\\0',
                u64 n_pts2d; per point: f64 x, f64 y, u64 point3D_id
  points3D.bin  u64 n; per point: u64 id, f64 xyz[3], u8 rgb[3],
                f64 error, u64 track_len; per track el: u32 image_id,
                u32 point2D_idx
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

# model_id -> (name, num_params)
CAMERA_MODELS: dict[int, tuple[str, int]] = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS: dict[str, int] = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclasses.dataclass
class ColmapCamera:
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # (num_params,) float64


@dataclasses.dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray  # (4,) float64, (w, x, y, z), world->cam rotation
    tvec: np.ndarray  # (3,) float64, world->cam translation
    camera_id: int
    name: str
    xys: np.ndarray  # (n, 2) float64 2D keypoints
    point3D_ids: np.ndarray  # (n,) int64, -1 if unmatched


@dataclasses.dataclass
class ColmapPoint3D:
    point3D_id: int
    xyz: np.ndarray  # (3,) float64
    rgb: np.ndarray  # (3,) uint8
    error: float
    image_ids: np.ndarray  # (track_len,) int32
    point2D_idxs: np.ndarray  # (track_len,) int32


# ----------------------------------------------------------------------------
# Binary readers
# ----------------------------------------------------------------------------


def read_cameras_bin(path: Path | str) -> dict[int, ColmapCamera]:
    data = Path(path).read_bytes()
    off = 0
    (n,) = struct.unpack_from("<Q", data, off)
    off += 8
    cameras: dict[int, ColmapCamera] = {}
    for _ in range(n):
        camera_id, model_id, width, height = struct.unpack_from("<iiQQ", data, off)
        off += 24
        if model_id not in CAMERA_MODELS:
            raise ValueError(f"Unknown COLMAP camera model id {model_id}")
        name, num_params = CAMERA_MODELS[model_id]
        params = np.frombuffer(data, dtype="<f8", count=num_params, offset=off).copy()
        off += 8 * num_params
        cameras[camera_id] = ColmapCamera(camera_id, name, int(width), int(height), params)
    return cameras


def read_images_bin(path: Path | str) -> dict[int, ColmapImage]:
    data = Path(path).read_bytes()
    off = 0
    (n,) = struct.unpack_from("<Q", data, off)
    off += 8
    images: dict[int, ColmapImage] = {}
    for _ in range(n):
        image_id = struct.unpack_from("<I", data, off)[0]
        off += 4
        qt = np.frombuffer(data, dtype="<f8", count=7, offset=off).copy()
        off += 56
        camera_id = struct.unpack_from("<I", data, off)[0]
        off += 4
        end = data.index(b"\x00", off)
        name = data[off:end].decode("utf-8")
        off = end + 1
        (n_pts,) = struct.unpack_from("<Q", data, off)
        off += 8
        rec = np.dtype([("x", "<f8"), ("y", "<f8"), ("id", "<u8")])
        pts = np.frombuffer(data, dtype=rec, count=n_pts, offset=off)
        off += 24 * n_pts
        xys = np.stack([pts["x"], pts["y"]], axis=-1) if n_pts else np.zeros((0, 2))
        # uint64 max sentinel (no 3D point) -> -1 via signed reinterpretation
        point3D_ids = pts["id"].astype(np.uint64).view(np.int64).copy()
        images[image_id] = ColmapImage(
            image_id=int(image_id),
            qvec=qt[:4],
            tvec=qt[4:7],
            camera_id=int(camera_id),
            name=name,
            xys=xys,
            point3D_ids=point3D_ids,
        )
    return images


def read_points3D_bin(path: Path | str) -> dict[int, ColmapPoint3D]:
    data = Path(path).read_bytes()
    off = 0
    (n,) = struct.unpack_from("<Q", data, off)
    off += 8
    points: dict[int, ColmapPoint3D] = {}
    for _ in range(n):
        point3D_id = struct.unpack_from("<Q", data, off)[0]
        off += 8
        xyz = np.frombuffer(data, dtype="<f8", count=3, offset=off).copy()
        off += 24
        rgb = np.frombuffer(data, dtype="<u1", count=3, offset=off).copy()
        off += 3
        (error,) = struct.unpack_from("<d", data, off)
        off += 8
        (track_len,) = struct.unpack_from("<Q", data, off)
        off += 8
        track = np.frombuffer(data, dtype="<u4", count=2 * track_len, offset=off).reshape(
            track_len, 2
        )
        off += 8 * track_len
        points[int(point3D_id)] = ColmapPoint3D(
            point3D_id=int(point3D_id),
            xyz=xyz,
            rgb=rgb,
            error=float(error),
            image_ids=track[:, 0].astype(np.int32),
            point2D_idxs=track[:, 1].astype(np.int32),
        )
    return points


# ----------------------------------------------------------------------------
# Text readers
# ----------------------------------------------------------------------------


def _data_lines(path: Path | str):
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            yield line


def read_cameras_txt(path: Path | str) -> dict[int, ColmapCamera]:
    cameras: dict[int, ColmapCamera] = {}
    for line in _data_lines(path):
        parts = line.split()
        camera_id, model = int(parts[0]), parts[1]
        if model not in CAMERA_MODEL_IDS:
            raise ValueError(f"Unknown COLMAP camera model {model!r}")
        width, height = int(parts[2]), int(parts[3])
        params = np.array([float(p) for p in parts[4:]], dtype=np.float64)
        num_params = CAMERA_MODELS[CAMERA_MODEL_IDS[model]][1]
        if len(params) != num_params:
            raise ValueError(
                f"Camera {camera_id} ({model}) expects {num_params} params, got {len(params)}"
            )
        cameras[camera_id] = ColmapCamera(camera_id, model, width, height, params)
    return cameras


def read_images_txt(path: Path | str) -> dict[int, ColmapImage]:
    """Strict COLMAP pairing: every image is exactly TWO lines — the
    header and a POINTS2D line that may be empty. Empty lines are kept
    (filtering them made a zero-point image's next header get misread as
    its points; names may contain spaces, so token-count heuristics
    cannot disambiguate)."""
    images: dict[int, ColmapImage] = {}
    lines = [
        ln.strip()
        for ln in Path(path).read_text().splitlines()
        if not ln.strip().startswith("#")
    ]
    while lines and lines[-1] == "":
        lines.pop()
    i = 0
    while i < len(lines):
        if not lines[i]:  # stray blank while seeking a header (COLMAP's
            i += 1  # own reader skips these too)
            continue
        line = lines[i]
        parts = line.split()
        image_id = int(parts[0])
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        camera_id = int(parts[8])
        # COLMAP treats the name as the line remainder VERBATIM — it may
        # contain (even consecutive) spaces, which a split/rejoin would
        # collapse into one. Slice past the 9 numeric fields instead.
        pos = 0
        for _ in range(9):
            while pos < len(line) and line[pos].isspace():
                pos += 1
            while pos < len(line) and not line[pos].isspace():
                pos += 1
        name = line[pos:].lstrip()
        xys = np.zeros((0, 2))
        point3D_ids = np.zeros((0,), np.int64)
        if i + 1 < len(lines):
            pparts = lines[i + 1].split()
            if pparts:
                vals = np.array(pparts, dtype=np.float64).reshape(-1, 3)
                xys = vals[:, :2]
                point3D_ids = vals[:, 2].astype(np.int64)
        i += 2
        images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name, xys, point3D_ids)
    return images


def read_points3D_txt(path: Path | str) -> dict[int, ColmapPoint3D]:
    points: dict[int, ColmapPoint3D] = {}
    for line in _data_lines(path):
        parts = line.split()
        pid = int(parts[0])
        xyz = np.array(parts[1:4], dtype=np.float64)
        rgb = np.array(parts[4:7], dtype=np.uint8)
        error = float(parts[7])
        track = np.array(parts[8:], dtype=np.int64).reshape(-1, 2)
        points[pid] = ColmapPoint3D(
            pid, xyz, rgb, error, track[:, 0].astype(np.int32), track[:, 1].astype(np.int32)
        )
    return points


# ----------------------------------------------------------------------------
# Writers (for tests, synthetic scenes and export)
# ----------------------------------------------------------------------------


def write_cameras_bin(cameras: dict[int, ColmapCamera], path: Path | str) -> None:
    out = bytearray(struct.pack("<Q", len(cameras)))
    for cam in cameras.values():
        model_id = CAMERA_MODEL_IDS[cam.model]
        out += struct.pack("<iiQQ", cam.camera_id, model_id, cam.width, cam.height)
        out += np.asarray(cam.params, dtype="<f8").tobytes()
    Path(path).write_bytes(bytes(out))


def write_images_bin(images: dict[int, ColmapImage], path: Path | str) -> None:
    out = bytearray(struct.pack("<Q", len(images)))
    for im in images.values():
        out += struct.pack("<I", im.image_id)
        out += np.asarray(np.concatenate([im.qvec, im.tvec]), dtype="<f8").tobytes()
        out += struct.pack("<I", im.camera_id)
        out += im.name.encode("utf-8") + b"\x00"
        n = len(im.point3D_ids)
        out += struct.pack("<Q", n)
        if n:
            rec = np.dtype([("x", "<f8"), ("y", "<f8"), ("id", "<u8")])
            pts = np.empty(n, dtype=rec)
            pts["x"] = np.asarray(im.xys)[:, 0]
            pts["y"] = np.asarray(im.xys)[:, 1]
            # -1 (no 3D point) round-trips to the uint64 max sentinel
            pts["id"] = np.asarray(im.point3D_ids, np.int64).view(np.uint64)
            out += pts.tobytes()
    Path(path).write_bytes(bytes(out))


def write_points3D_bin(points: dict[int, ColmapPoint3D], path: Path | str) -> None:
    out = bytearray(struct.pack("<Q", len(points)))
    for p in points.values():
        out += struct.pack("<Q", p.point3D_id)
        out += np.asarray(p.xyz, dtype="<f8").tobytes()
        out += np.asarray(p.rgb, dtype="<u1").tobytes()
        out += struct.pack("<d", p.error)
        out += struct.pack("<Q", len(p.image_ids))
        track = np.empty((len(p.image_ids), 2), dtype="<u4")
        track[:, 0] = p.image_ids
        track[:, 1] = p.point2D_idxs
        out += track.tobytes()
    Path(path).write_bytes(bytes(out))


def write_cameras_txt(cameras: dict[int, ColmapCamera], path: Path | str) -> None:
    lines = ["# Camera list with one line of data per camera:",
             "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]"]
    for cam in cameras.values():
        params = " ".join(repr(float(p)) for p in cam.params)
        lines.append(f"{cam.camera_id} {cam.model} {cam.width} {cam.height} {params}")
    Path(path).write_text("\n".join(lines) + "\n")


def write_images_txt(images: dict[int, ColmapImage], path: Path | str) -> None:
    lines = ["# Image list with two lines of data per image:",
             "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME",
             "#   POINTS2D[] as (X, Y, POINT3D_ID)"]
    for im in images.values():
        q = " ".join(repr(float(x)) for x in im.qvec)
        t = " ".join(repr(float(x)) for x in im.tvec)
        lines.append(f"{im.image_id} {q} {t} {im.camera_id} {im.name}")
        pts = " ".join(
            f"{repr(float(x))} {repr(float(y))} {int(pid)}"
            for (x, y), pid in zip(im.xys, im.point3D_ids)
        )
        lines.append(pts)
    Path(path).write_text("\n".join(lines) + "\n")


def write_points3D_txt(points: dict[int, ColmapPoint3D], path: Path | str) -> None:
    lines = ["# 3D point list with one line of data per point:",
             "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as (IMAGE_ID, POINT2D_IDX)"]
    for p in points.values():
        xyz = " ".join(repr(float(x)) for x in p.xyz)
        rgb = " ".join(str(int(x)) for x in p.rgb)
        track = " ".join(
            f"{int(i)} {int(j)}" for i, j in zip(p.image_ids, p.point2D_idxs)
        )
        lines.append(f"{p.point3D_id} {xyz} {rgb} {repr(float(p.error))} {track}")
    Path(path).write_text("\n".join(lines) + "\n")


# ----------------------------------------------------------------------------
# Model-level entry point
# ----------------------------------------------------------------------------


def read_model(
    model_dir: Path | str, *, with_points3D: bool = False
) -> tuple[dict[int, ColmapCamera], dict[int, ColmapImage], dict[int, ColmapPoint3D] | None]:
    """Read a COLMAP model directory, preferring binary over text.

    Parity: pycolmap.Reconstruction(model_dir) at sfm.py:188 auto-detects
    the format the same way.
    """
    model_dir = Path(model_dir)
    if (model_dir / "cameras.bin").exists():
        cameras = read_cameras_bin(model_dir / "cameras.bin")
        images = read_images_bin(model_dir / "images.bin")
        points = (
            read_points3D_bin(model_dir / "points3D.bin")
            if with_points3D and (model_dir / "points3D.bin").exists()
            else None
        )
    elif (model_dir / "cameras.txt").exists():
        cameras = read_cameras_txt(model_dir / "cameras.txt")
        images = read_images_txt(model_dir / "images.txt")
        points = (
            read_points3D_txt(model_dir / "points3D.txt")
            if with_points3D and (model_dir / "points3D.txt").exists()
            else None
        )
    else:
        raise FileNotFoundError(f"No COLMAP model (cameras.bin/.txt) found in {model_dir}")
    return cameras, images, points
