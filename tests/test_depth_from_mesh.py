"""Mesh I/O + z-buffer depth rasterization (sucre_tpu.depth_from_mesh):
the in-framework replacement for the reference pipeline's external mesh
ray tracer (reference README.md "Data processing pipeline" steps 3-4).

Oracle: the synthetic scene's analytic tilted plane — its depth PNGs are
computed in closed form, and a 2-triangle mesh of the same plane must
rasterize to identical depth (1/z screen-linear interpolation is exact
for planes)."""

import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

from sucre_tpu.depth_from_mesh import (
    generate_depth_maps,
    main,
    rasterize_depth_numpy,
    render_view_depth,
)
from sucre_tpu.io.mesh import Mesh, read_mesh, read_obj, read_ply, write_ply
from sucre_tpu.pipeline import RestoreConfig, restore_image
from sucre_tpu.scene import Scene
from tests.synthetic import make_scene


def _native_raster():
    try:
        from sucre_tpu.io import native

        if native.available():
            return lambda *a, **k: native.raster_depth(*a, **k)
    except Exception:
        pass
    return None


BACKENDS = ["numpy"] + (["native"] if _native_raster() else [])


def _raster(backend, verts, faces, fx, fy, cx, cy, w, h, znear=0.05):
    if backend == "native":
        return _native_raster()(verts, faces, fx, fy, cx, cy, w, h, znear=znear)
    return rasterize_depth_numpy(verts, faces, fx, fy, cx, cy, w, h, znear=znear)


def plane_mesh(plane_z, slope, x0=-5.0, x1=5.0, y0=-4.0, y1=4.0, nx=1, ny=1):
    """Triangulated grid on the synth plane Z = plane_z + slope * X."""
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys)
    verts = np.stack([X, Y, plane_z + slope * X], axis=-1).reshape(-1, 3)
    faces = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + nx + 1
            d = c + 1
            faces.append((a, b, d))
            faces.append((a, d, c))
    return Mesh(vertices=verts, faces=np.asarray(faces, np.int32))


class TestMeshIO:
    def test_ply_roundtrip_binary(self, tmp_path):
        mesh = plane_mesh(3.0, 0.2, nx=3, ny=2)
        p = tmp_path / "m.ply"
        write_ply(p, mesh)
        got = read_ply(p)
        np.testing.assert_allclose(got.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(got.faces, mesh.faces)

    def test_ply_ascii_with_extras_and_quads(self, tmp_path):
        p = tmp_path / "a.ply"
        p.write_text(
            "ply\nformat ascii 1.0\ncomment made by hand\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 1 255 0 0\n1 0 1 0 255 0\n1 1 1 0 0 255\n0 1 1 9 9 9\n"
            "4 0 1 2 3\n"
        )
        mesh = read_ply(p)
        assert len(mesh.vertices) == 4
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])

    def test_ply_binary_with_vertex_normals(self, tmp_path):
        # OpenMVS-style layout: vertex props beyond x/y/z are skipped.
        p = tmp_path / "n.ply"
        verts = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property float nx\nproperty float ny\nproperty float nz\n"
                b"element face 1\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n"
            )
            for v in verts:
                np.concatenate([v, [0, 0, 1]]).astype("<f4").tofile(f)
            f.write(bytes([3]) + np.array([0, 1, 2], "<i4").tobytes())
        mesh = read_ply(p)
        np.testing.assert_allclose(mesh.vertices, verts)
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])

    def test_obj_with_slashes_and_negative_indices(self, tmp_path):
        p = tmp_path / "m.obj"
        p.write_text(
            "# comment\nv 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1\n"
            "vt 0 0\nvn 0 0 1\n"
            "f 1/1/1 2/1/1 3/1/1\n"
            "f -4 -2 -1\n"  # 1 3 4
        )
        mesh = read_obj(p)
        np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])

    def test_point_cloud_rejected(self, tmp_path):
        p = tmp_path / "pc.ply"
        p.write_text(
            "ply\nformat ascii 1.0\nelement vertex 1\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n0 0 0\n"
        )
        with pytest.raises(ValueError, match="point cloud"):
            read_ply(p)

    def test_bad_face_index_rejected(self, tmp_path):
        p = tmp_path / "bad.obj"
        p.write_text("v 0 0 1\nv 1 0 1\nv 0 1 1\nf 1 2 9\n")
        with pytest.raises(ValueError, match="face indices"):
            read_obj(p)

    def test_ply_binary_uniform_quads_fast_path(self, tmp_path):
        """The vectorized uniform-list read handles non-triangle counts
        (fan order identical to the row walk's _fan_triangulate)."""
        p = tmp_path / "q.ply"
        verts = np.array(
            [[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1], [2, 0, 1], [2, 1, 1]],
            np.float32,
        )
        quads = np.array([[0, 1, 2, 3], [1, 4, 5, 2]], "<i4")
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 6\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 2\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n"
            )
            verts.astype("<f4").tofile(f)
            for q in quads:
                f.write(bytes([4]) + q.tobytes())
        mesh = read_ply(p)
        from sucre_tpu.io.mesh import _fan_triangulate

        np.testing.assert_array_equal(
            mesh.faces, _fan_triangulate(quads.tolist())
        )

    def test_ply_binary_variable_counts_fallback(self, tmp_path):
        """Mixed tri+quad rows defeat the vectorized fast path; the
        per-row walk (after the fast path's seek-back) must still parse
        the element correctly."""
        p = tmp_path / "v.ply"
        verts = np.array(
            [[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1], [2, 0, 1]], np.float32
        )
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 5\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 2\n"
                b"property list uchar int vertex_indices\n"
                b"end_header\n"
            )
            verts.astype("<f4").tofile(f)
            f.write(bytes([3]) + np.array([0, 1, 2], "<i4").tobytes())
            f.write(bytes([4]) + np.array([0, 2, 3, 4], "<i4").tobytes())
        mesh = read_ply(p)
        np.testing.assert_array_equal(
            mesh.faces, [[0, 1, 2], [0, 2, 3], [0, 3, 4]]
        )

    def test_read_mesh_dispatch(self, tmp_path):
        mesh = plane_mesh(2.0, 0.0)
        write_ply(tmp_path / "m.ply", mesh)
        assert len(read_mesh(tmp_path / "m.ply").faces) == 2
        with pytest.raises(ValueError, match="Unsupported mesh"):
            read_mesh(tmp_path / "m.stl")


def test_broken_native_rasterizer_warns_once(monkeypatch, capsys):
    """A stale/broken libsucre_native.so must not silently turn survey
    renders into hours of numpy rasterization: the fallback warns (once)
    with the caught exception."""
    import sucre_tpu.depth_from_mesh as dfm
    from sucre_tpu.io import native

    monkeypatch.setattr(native, "available", lambda: True)

    def boom(*a, **k):
        raise OSError("stale .so")

    monkeypatch.setattr(native, "raster_depth", boom)
    monkeypatch.setattr(dfm, "_native_fallback_warned", False)
    mesh = plane_mesh(3.0, 0.0)
    verts = mesh.vertices.astype(np.float32)
    out = dfm._rasterize(verts, mesh.faces, 51.2, 51.2, 32.0, 24.0,
                         64, 48, 0.05, 1)
    assert out.shape == (48, 64) and (out > 0).any()
    err = capsys.readouterr().err
    assert "stale .so" in err and "numpy" in err
    # second call: no duplicate warning
    dfm._rasterize(verts, mesh.faces, 51.2, 51.2, 32.0, 24.0, 64, 48, 0.05, 1)
    assert capsys.readouterr().err == ""


@pytest.mark.parametrize("backend", BACKENDS)
class TestRasterizer:
    fx = fy = 51.2
    cx, cy = 32.0, 24.0
    W, H = 64, 48

    def test_frontal_plane_exact(self, backend):
        mesh = plane_mesh(2.0, 0.0)
        z = _raster(
            backend, mesh.vertices, mesh.faces,
            self.fx, self.fy, self.cx, self.cy, self.W, self.H,
        )
        assert z.shape == (self.H, self.W)
        np.testing.assert_allclose(z, 2.0, atol=1e-5)

    def test_tilted_plane_matches_analytic(self, backend):
        plane_z, slope = 3.0, 0.35
        mesh = plane_mesh(plane_z, slope)
        z = _raster(
            backend, mesh.vertices, mesh.faces,
            self.fx, self.fy, self.cx, self.cy, self.W, self.H,
        )
        uu, vv = np.meshgrid(np.arange(self.W), np.arange(self.H))
        xr = (uu + 0.5 - self.cx) / self.fx
        expected = plane_z / (1.0 - slope * xr)
        np.testing.assert_allclose(z, expected, rtol=1e-5)

    def test_occlusion_near_wins(self, backend):
        near = plane_mesh(1.0, 0.0, x0=-2, x1=0.0, y0=-2, y1=2)
        far = plane_mesh(4.0, 0.0)
        verts = np.vstack([far.vertices, near.vertices])
        faces = np.vstack([far.faces, near.faces + len(far.vertices)])
        z = _raster(
            backend, verts, faces,
            self.fx, self.fy, self.cx, self.cy, self.W, self.H,
        )
        # left half sees the near plane, right half the far one
        assert np.allclose(z[:, : self.W // 4], 1.0, atol=1e-5)
        assert np.allclose(z[:, self.W // 2 + 2 :], 4.0, atol=1e-5)

    def test_near_clip_no_wraparound(self, backend):
        # A ground plane extending from behind the camera: unclipped
        # projection would wrap behind-camera vertices into the image.
        verts = np.array(
            [[-5, 0.5, -2.0], [5, 0.5, -2.0], [5, 0.5, 8.0], [-5, 0.5, 8.0]],
            np.float64,
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        z = _raster(
            backend, verts, faces,
            self.fx, self.fy, self.cx, self.cy, self.W, self.H, znear=0.05,
        )
        valid = z > 0
        assert valid.any()
        assert (z[valid] >= 0.05 - 1e-6).all()
        # The plane y=0.5 seen from origin: z = 0.5 / yr along each ray.
        uu, vv = np.meshgrid(np.arange(self.W), np.arange(self.H))
        yr = (vv + 0.5 - self.cy) / self.fy
        with np.errstate(divide="ignore"):
            expected = np.where(yr > 0, 0.5 / yr, 0.0)
        hit = valid & (expected > 0.05) & (expected < 7.5)
        np.testing.assert_allclose(z[hit], expected[hit], rtol=1e-4)

    def test_empty_mesh_all_invalid(self, backend):
        z = _raster(
            backend,
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
            self.fx, self.fy, self.cx, self.cy, self.W, self.H,
        )
        assert (z == 0).all()


@pytest.mark.skipif(not _native_raster(), reason="native library not built")
def test_native_equals_numpy_random_mesh():
    rng = np.random.default_rng(7)
    verts = rng.uniform([-3, -3, 0.2], [3, 3, 6.0], size=(60, 3))
    faces = rng.integers(0, 60, size=(80, 3)).astype(np.int32)
    args = (verts, faces, 51.2, 51.2, 32.0, 24.0, 64, 48)
    z_np = rasterize_depth_numpy(*args)
    z_cc = _native_raster()(*args)
    same_valid = (z_np > 0) == (z_cc > 0)
    assert same_valid.mean() > 0.999
    both = (z_np > 0) & (z_cc > 0)
    np.testing.assert_allclose(z_np[both], z_cc[both], rtol=1e-5)


class TestAgainstSyntheticScene:
    def test_pinhole_depths_match_rendered_pngs(self, tmp_path):
        sd = make_scene(tmp_path / "scene", n_views=4, width=64, height=48)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        mesh = plane_mesh(sd.plane_z, 0.35)
        for name in sd.names:
            view = scene[name]
            z = render_view_depth(view, mesh)
            mm = np.round(z.astype(np.float64) * 1000.0).astype(np.uint16)
            ref = cv2.imread(
                str(sd.depth_dir / f"depth_{Path(name).stem}.png"),
                cv2.IMREAD_UNCHANGED,
            )
            diff = np.abs(mm.astype(np.int64) - ref.astype(np.int64))
            assert diff.max() <= 1, f"{name}: max depth diff {diff.max()} mm"

    def test_distorted_camera_via_supersampled_remap(self, tmp_path):
        sd = make_scene(
            tmp_path / "scene", n_views=2, width=64, height=48,
            camera_model="OPENCV",
        )
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        view = scene[sd.names[0]]
        assert view.dist_model != "none"
        z = render_view_depth(view, plane_mesh(sd.plane_z, 0.35), supersample=3.0)
        ref = cv2.imread(
            str(sd.depth_dir / f"depth_{Path(sd.names[0]).stem}.png"),
            cv2.IMREAD_UNCHANGED,
        ).astype(np.float64) / 1000.0
        both = (z > 0) & (ref > 0)
        assert both.mean() > 0.95
        err = np.abs(z[both] - ref[both])
        # nearest-ray sampling on the supersampled grid: bounded by the
        # plane's depth change across ~1/3 distorted pixel (~7 mm here)
        assert np.percentile(err, 99) < 0.02, np.percentile(err, 99)
        assert err.mean() < 0.01

    def test_end_to_end_mesh_to_restoration(self, tmp_path):
        """COLMAP model + mesh -> depth maps -> restoration: the full
        reference data pipeline with zero external tools."""
        sd = make_scene(tmp_path / "scene", n_views=4, width=64, height=48)
        depth_out = tmp_path / "mesh_depths"
        mesh_path = tmp_path / "plane.ply"
        write_ply(mesh_path, plane_mesh(sd.plane_z, 0.35))
        rc = main([
            "--mesh", str(mesh_path),
            "--model-dir", str(sd.model_dir),
            "--output-dir", str(depth_out),
            "--num-workers", "2",
            "--quiet",
        ])
        assert rc == 0
        assert sorted(p.name for p in depth_out.glob("depth_*.png")) == sorted(
            f"depth_{Path(n).stem}.png" for n in sd.names
        )
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, depth_out)
        res = restore_image(
            scene, sd.names[1], tmp_path / "out",
            RestoreConfig(num_iter=2, verbose=False),
        )
        assert res.n_obs > 0

    def test_bin_format_output(self, tmp_path):
        sd = make_scene(tmp_path / "scene", n_views=2, width=48, height=36)
        depth_out = tmp_path / "bin_depths"
        mesh = plane_mesh(sd.plane_z, 0.35)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        stats = generate_depth_maps(
            [scene[n] for n in sd.names], mesh, depth_out, fmt="bin",
            verbose=False,
        )
        assert all(s["coverage"] > 0.9 for s in stats)
        from sucre_tpu.io.depth_formats import read_depth_any

        got = read_depth_any(depth_out / f"depth_{Path(sd.names[0]).stem}.bin")
        ref = cv2.imread(
            str(sd.depth_dir / f"depth_{Path(sd.names[0]).stem}.png"),
            cv2.IMREAD_UNCHANGED,
        )
        assert np.abs(got.astype(np.int64) - ref.astype(np.int64)).max() <= 1
