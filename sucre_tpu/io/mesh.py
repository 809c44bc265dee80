"""Triangle-mesh I/O (PLY / OBJ) for depth-map generation.

The reference's data-processing pipeline (README.md "Data processing
pipeline", steps 3-4) ends outside the reference itself: users build a
dense mesh with OpenMVS and run a third-party ray tracer
(ferreram/depth_map_2_mesh_ray_tracer) to produce the depth_<stem>.png
inputs. ``sucre_tpu.depth_from_mesh`` replaces that external step; this
module reads the meshes those tools produce — OpenMVS/COLMAP emit
binary little-endian PLY; OBJ is the common interchange fallback.

Only geometry is read (vertex positions + triangulated faces); colors,
normals and texture coordinates are skipped. Polygon faces triangulate
as fans (PLY quads from Poisson meshing, OBJ polygons).
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


@dataclasses.dataclass
class Mesh:
    vertices: np.ndarray  # (N, 3) float64, world coordinates
    faces: np.ndarray  # (M, 3) int32 vertex indices

    def __repr__(self) -> str:
        return f"Mesh({len(self.vertices)} vertices, {len(self.faces)} triangles)"


def _fan_triangulate(indices: list[list[int]]) -> np.ndarray:
    tris = []
    for poly in indices:
        for k in range(1, len(poly) - 1):
            tris.append((poly[0], poly[k], poly[k + 1]))
    return np.asarray(tris, np.int32).reshape(-1, 3)


def _read_uniform_list(f, endian: str, prop, count: int) -> np.ndarray | None:
    """Vectorized read of a binary PLY list element whose rows all share
    the first row's count (the layout every mesher emits for triangle
    faces). Returns the (count, n0) index array, or None — with the file
    position restored — when the layout is variable-count (the caller
    falls back to the per-row walk)."""
    if count == 0:
        return np.zeros((0, 3), np.int64)
    start = f.tell()
    cdt = np.dtype(endian + _PLY_DTYPES[prop[1]])
    idt = np.dtype(endian + _PLY_DTYPES[prop[2]])
    n0 = int(np.frombuffer(f.read(cdt.itemsize), dtype=cdt)[0])
    f.seek(start)
    if n0 < 3:
        return None
    row = np.dtype([("n", cdt), ("v", idt, (n0,))])
    data = np.fromfile(f, dtype=row, count=count)
    if len(data) != count or not (data["n"] == n0).all():
        f.seek(start)
        return None
    return data["v"].astype(np.int64, copy=False)


def _triangulate_uniform(polys: np.ndarray) -> np.ndarray:
    """Fan-triangulate a uniform (M, n) polygon index array (vectorized
    form of ``_fan_triangulate``; n == 3 is the identity)."""
    n = polys.shape[1]
    if n == 3:
        return np.ascontiguousarray(polys, np.int32)
    tris = [
        np.stack([polys[:, 0], polys[:, k], polys[:, k + 1]], axis=-1)
        for k in range(1, n - 1)
    ]
    # poly-major order, matching _fan_triangulate exactly
    return np.stack(tris, axis=1).reshape(-1, 3).astype(np.int32)


def read_ply(path: Path | str) -> Mesh:
    """Read a PLY mesh (ascii / binary little- or big-endian)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements: list[tuple[str, int, list]] = []  # (name, count, props)
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: PLY header without end_header")
            tokens = line.decode("ascii", "replace").split()
            if not tokens or tokens[0] == "comment" or tokens[0] == "obj_info":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                elements.append((tokens[1], int(tokens[2]), []))
            elif tokens[0] == "property":
                if not elements:
                    raise ValueError(f"{path}: PLY property before element")
                if tokens[1] == "list":
                    elements[-1][2].append(("list", tokens[2], tokens[3], tokens[4]))
                else:
                    elements[-1][2].append(("scalar", tokens[1], tokens[2]))
            elif tokens[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian", "binary_big_endian"):
            raise ValueError(f"{path}: unsupported PLY format {fmt!r}")

        vertices = None
        faces = None
        endian = ">" if fmt == "binary_big_endian" else "<"
        for name, count, props in elements:
            want_vertex = name == "vertex"
            want_face = name == "face" and faces is None
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if want_vertex:
                    names = [p[2] for p in props if p[0] == "scalar"]
                    ix, iy, iz = (names.index(a) for a in ("x", "y", "z"))
                    vertices = np.array(
                        [[r[ix], r[iy], r[iz]] for r in rows], np.float64
                    )
                elif want_face:
                    # the (sole meaningful) list property leads each row
                    faces = _fan_triangulate(
                        [[int(v) for v in r[1 : 1 + int(r[0])]] for r in rows]
                    )
                continue
            if all(p[0] == "scalar" for p in props):
                dtype = np.dtype(
                    [(f"p{i}", endian + _PLY_DTYPES[p[1]]) for i, p in enumerate(props)]
                )
                data = np.fromfile(f, dtype=dtype, count=count)
                if len(data) != count:
                    raise ValueError(f"{path}: truncated PLY element {name!r}")
                if want_vertex:
                    names = [p[2] for p in props]
                    cols = {n: f"p{i}" for i, n in enumerate(names)}
                    vertices = np.stack(
                        [data[cols[a]].astype(np.float64) for a in ("x", "y", "z")],
                        axis=-1,
                    )
            else:
                # The canonical OpenMVS/COLMAP layout (a sole
                # 'property list uchar int vertex_indices' with a uniform
                # per-row count) reads as ONE vectorized np.fromfile —
                # dense meshes routinely carry 10M+ faces, and the
                # per-row walk below costs minutes and gigabytes there.
                if len(props) == 1:
                    uniform = _read_uniform_list(f, endian, props[0], count)
                    if uniform is not None:
                        if want_face:
                            faces = _triangulate_uniform(uniform)
                        continue
                # list property: per-row variable length — walk the rows.
                count_fmt = {"i1": "b", "u1": "B", "i2": "h", "u2": "H",
                             "i4": "i", "u4": "I"}
                polys = []
                for _ in range(count):
                    row_polys = None
                    for p in props:
                        if p[0] == "list":
                            cdt = np.dtype(_PLY_DTYPES[p[1]])
                            raw = f.read(cdt.itemsize)
                            if len(raw) < cdt.itemsize:
                                raise ValueError(
                                    f"{path}: truncated PLY element"
                                )
                            (n,) = struct.unpack(
                                endian + count_fmt[_PLY_DTYPES[p[1]]], raw
                            )
                            item = np.dtype(_PLY_DTYPES[p[2]])
                            raw = f.read(n * item.itemsize)
                            if len(raw) < n * item.itemsize:
                                # a short-but-aligned read would silently
                                # drop vertices from the polygon
                                raise ValueError(
                                    f"{path}: truncated PLY element"
                                )
                            vals = np.frombuffer(
                                raw, dtype=endian + _PLY_DTYPES[p[2]]
                            )
                            if row_polys is None:
                                row_polys = vals.astype(np.int64).tolist()
                        else:
                            f.read(np.dtype(_PLY_DTYPES[p[1]]).itemsize)
                    polys.append(row_polys or [])
                if want_face:
                    faces = _fan_triangulate([p for p in polys if len(p) >= 3])

    if vertices is None:
        raise ValueError(f"{path}: PLY has no vertex element with x/y/z")
    if faces is None or len(faces) == 0:
        raise ValueError(f"{path}: PLY has no faces (a point cloud cannot "
                         f"be ray-traced; mesh it first, e.g. OpenMVS "
                         f"ReconstructMesh)")
    _check_faces(path, faces, len(vertices))
    return Mesh(vertices=vertices, faces=faces)


def read_obj(path: Path | str) -> Mesh:
    """Read an ASCII OBJ mesh (v/f records; polygons fan-triangulate,
    negative indices resolve from the end per the OBJ spec)."""
    verts: list[tuple[float, float, float]] = []
    polys: list[list[int]] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v" and len(t) >= 4:
                verts.append((float(t[1]), float(t[2]), float(t[3])))
            elif t[0] == "f" and len(t) >= 4:
                idx = []
                for w in t[1:]:
                    v = w.split("/")[0]
                    if not v:
                        continue
                    i = int(v)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                if len(idx) >= 3:
                    polys.append(idx)
    if not verts:
        raise ValueError(f"{path}: OBJ has no vertices")
    if not polys:
        raise ValueError(f"{path}: OBJ has no faces")
    faces = _fan_triangulate(polys)
    _check_faces(path, faces, len(verts))
    return Mesh(vertices=np.asarray(verts, np.float64), faces=faces)


def _check_faces(path, faces: np.ndarray, n_verts: int) -> None:
    if faces.size and (faces.min() < 0 or faces.max() >= n_verts):
        raise ValueError(
            f"{path}: face indices outside [0, {n_verts}) — corrupt mesh"
        )


def write_ply(path: Path | str, mesh: Mesh) -> None:
    """Write a binary little-endian PLY (float vertices, int32 faces) —
    the layout OpenMVS/COLMAP emit."""
    v = np.ascontiguousarray(mesh.vertices, dtype="<f4")
    f32 = np.ascontiguousarray(mesh.faces, dtype="<i4")
    with open(path, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            + f"element vertex {len(v)}\n".encode()
            + b"property float x\nproperty float y\nproperty float z\n"
            + f"element face {len(f32)}\n".encode()
            + b"property list uchar int vertex_indices\n"
            + b"end_header\n"
        )
        v.tofile(f)
        counts = np.full((len(f32), 1), 3, "u1")
        rows = np.empty((len(f32), 13), "u1")
        rows[:, :1] = counts
        rows[:, 1:] = f32.view("u1").reshape(len(f32), 12)
        rows.tofile(f)


def read_mesh(path: Path | str) -> Mesh:
    """Read a mesh by extension (.ply / .obj)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".ply":
        return read_ply(path)
    if suffix == ".obj":
        return read_obj(path)
    raise ValueError(f"Unsupported mesh format {suffix!r} (expected .ply or .obj)")
