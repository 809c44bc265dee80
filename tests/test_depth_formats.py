"""Alternative depth-map input formats (COLMAP dense .bin, .npy, float
TIFF/EXR): decode semantics, depth-path resolution, validator findings,
and end-to-end equality with the reference 16-bit-PNG pipeline.

The reference reads only depth_<stem>.png in uint16 millimeters
(loader.py:166-170); these formats are a capability extension letting
--depth-dir point straight at a COLMAP dense workspace."""

import shutil
from pathlib import Path

import cv2
import numpy as np
import pytest

from sucre_tpu.io.depth_formats import (
    read_colmap_array,
    read_colmap_array_header,
    read_depth_any,
    write_colmap_array,
)
from sucre_tpu.io.images import load_depth_map, load_depth_raw
from sucre_tpu.pipeline import RestoreConfig, restore_image
from sucre_tpu.scene import Scene, resolve_depth_path
from sucre_tpu.validate import validate
from tests.synthetic import make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_scene(tmp_path_factory.mktemp("scene"), n_views=4, width=48, height=36)


def _png_depths(scene_def):
    """[(image_name, depth_png_path, u16 mm array)] of the scene."""
    out = []
    for png in sorted(scene_def.depth_dir.rglob("depth_*.png")):
        name = png.stem[len("depth_"):] + ".png"
        mm = cv2.imread(str(png), cv2.IMREAD_UNCHANGED)
        out.append((name, png, mm))
    return out


class TestColmapArray:
    def test_roundtrip_2d(self, tmp_path):
        rng = np.random.default_rng(0)
        arr = rng.uniform(0, 10, size=(7, 11)).astype(np.float32)
        p = tmp_path / "d.bin"
        write_colmap_array(p, arr)
        w, h, c, _ = read_colmap_array_header(p)
        assert (w, h, c) == (11, 7, 1)
        np.testing.assert_array_equal(read_colmap_array(p), arr)

    def test_roundtrip_3channel(self, tmp_path):
        rng = np.random.default_rng(1)
        arr = rng.normal(size=(5, 4, 3)).astype(np.float32)
        p = tmp_path / "n.bin"
        write_colmap_array(p, arr)
        np.testing.assert_array_equal(read_colmap_array(p), arr)

    def test_layout_matches_colmap_read_array(self, tmp_path):
        # Oracle: COLMAP's scripts/python/read_write_dense.py read_array
        # reshapes F-order (w, h, c) then transposes (1, 0, 2).
        arr = np.arange(2 * 3 * 2, dtype=np.float32).reshape(3, 2, 2)  # (H, W, C)
        p = tmp_path / "x.bin"
        write_colmap_array(p, arr)
        with open(p, "rb") as f:
            header = b""
            while header.count(b"&") < 3:
                header += f.read(1)
            data = np.fromfile(f, np.float32)
        w, h, c = (int(v) for v in header.split(b"&")[:3])
        oracle = np.transpose(data.reshape((w, h, c), order="F"), (1, 0, 2))
        np.testing.assert_array_equal(oracle, arr)

    def test_bad_header_raises(self, tmp_path):
        p = tmp_path / "bad.bin"
        p.write_bytes(b"\x00\x01\x02\x03" * 8)
        with pytest.raises(ValueError, match="COLMAP dense array"):
            read_colmap_array(p)

    def test_truncated_payload_raises(self, tmp_path):
        p = tmp_path / "t.bin"
        write_colmap_array(p, np.ones((4, 4), np.float32))
        p.write_bytes(p.read_bytes()[:-8])
        with pytest.raises(ValueError, match="payload"):
            read_colmap_array(p)

    def test_normal_map_rejected_as_depth(self, tmp_path):
        p = tmp_path / "img.png.geometric.bin"
        write_colmap_array(p, np.ones((4, 4, 3), np.float32))
        with pytest.raises(ValueError, match="normal map"):
            read_depth_any(p)


class TestReadDepthAny:
    def test_float_meters_quantize_to_reference_mm(self, tmp_path):
        mm = np.array([[0, 1, 999], [1000, 12345, 65535]], np.uint16)
        p = tmp_path / "d.bin"
        write_colmap_array(p, mm.astype(np.float32) / 1000.0)
        got = read_depth_any(p)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, mm)

    def test_nonfinite_and_negative_become_invalid(self, tmp_path):
        d = np.array([[np.nan, np.inf], [-2.0, 1.5]], np.float32)
        p = tmp_path / "d.bin"
        write_colmap_array(p, d)
        got = read_depth_any(p)
        np.testing.assert_array_equal(got, np.array([[0, 0], [0, 1500]], np.uint16))

    def test_beyond_u16_range_stays_float_meters(self, tmp_path):
        d = np.array([[1.0, 70.0]], np.float32)  # 70 m > 65.535 m
        p = tmp_path / "d.bin"
        write_colmap_array(p, d)
        got = read_depth_any(p)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, d)

    def test_npy_integer_is_millimeters(self, tmp_path):
        mm = np.array([[5, 70000]], np.int32)  # 70 m in mm, beyond u16
        p = tmp_path / "d.npy"
        np.save(p, mm)
        got = read_depth_any(p)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, [[0.005, 70.0]])
        np.save(p, mm.clip(0, 60000))
        got = read_depth_any(p)
        assert got.dtype == np.uint16

    def test_npy_float_is_meters(self, tmp_path):
        p = tmp_path / "d.npy"
        np.save(p, np.array([[1.2344999]], np.float64))
        np.testing.assert_array_equal(read_depth_any(p), [[1234]])

    def test_float_tiff(self, tmp_path):
        d = np.array([[0.5, 2.25]], np.float32)
        p = tmp_path / "d.tif"
        assert cv2.imwrite(str(p), d)
        got = read_depth_any(p)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, [[500, 2250]])

    def test_three_channel_replicated(self, tmp_path):
        d = np.array([[0.5, 2.25]], np.float32)
        p = tmp_path / "r.tif"
        assert cv2.imwrite(str(p), np.repeat(d[..., None], 3, axis=-1))
        np.testing.assert_array_equal(read_depth_any(p), [[500, 2250]])

    def test_three_channel_depth_in_red_plane(self, tmp_path, capsys):
        """EXR-style exporters write depth into R with zero G/B; cv2
        loads BGR, so a fixed channel-0 pick would decode the zero Blue
        plane — the decoder must find the carrying channel (and warn)."""
        d = np.array([[0.5, 2.25]], np.float32)
        bgr = np.zeros((1, 2, 3), np.float32)
        bgr[..., 2] = d  # R in BGR order
        p = tmp_path / "red.tif"
        assert cv2.imwrite(str(p), bgr)
        np.testing.assert_array_equal(read_depth_any(p), [[500, 2250]])
        assert "channel 2" in capsys.readouterr().err

    def test_three_channel_conflicting_raises(self, tmp_path):
        bgr = np.zeros((1, 2, 3), np.float32)
        bgr[..., 0] = 1.0
        bgr[..., 2] = 2.0
        p = tmp_path / "conflict.tif"
        assert cv2.imwrite(str(p), bgr)
        with pytest.raises(ValueError, match="differing non-zero"):
            read_depth_any(p)

    def test_gray_alpha_picks_depth_plane(self, capsys):
        """Gray+alpha exports pair the depth plane with a CONSTANT alpha;
        the constant plane is padding, not a conflicting channel."""
        from sucre_tpu.io.depth_formats import _collapse_channels

        d = np.array([[0.5, 2.25]], np.float32)
        ga = np.stack([d, np.ones_like(d)], axis=-1)
        np.testing.assert_array_equal(_collapse_channels("ga", ga), d)
        assert "channel 0" in capsys.readouterr().err

    def test_rgba_depth_in_alpha(self, tmp_path, capsys):
        """Depth written into the ALPHA channel of an RGBA image (RGB
        zero) must decode to the alpha plane, not a silent zero map."""
        d = np.array([[0.5, 2.25], [1.0, 3.0]], np.float32)
        bgra = np.zeros((2, 2, 4), np.float32)
        bgra[..., 3] = d
        p = tmp_path / "alpha.tif"
        assert cv2.imwrite(str(p), bgra)
        np.testing.assert_array_equal(
            read_depth_any(p), (d * 1000).astype(np.uint16)
        )
        assert "channel 3" in capsys.readouterr().err

    def test_rgba_replicated_with_constant_alpha(self, tmp_path):
        d = np.array([[0.5, 2.25], [1.0, 3.0]], np.float32)
        bgra = np.repeat(d[..., None], 4, axis=-1)
        bgra[..., 3] = 1.0  # opaque alpha
        p = tmp_path / "rgba.tif"
        assert cv2.imwrite(str(p), bgra)
        np.testing.assert_array_equal(
            read_depth_any(p), (d * 1000).astype(np.uint16)
        )

    def test_flat_depth_with_constant_alpha(self, capsys):
        """A genuinely FLAT depth plane paired with a constant alpha has
        no varying plane at all — the alpha must still be recognized as
        padding, not a conflict (gray+alpha and RGBA-replicated forms)."""
        from sucre_tpu.io.depth_formats import _collapse_channels

        d = np.full((2, 3), 1.5, np.float32)
        ga = np.stack([d, np.ones_like(d)], axis=-1)
        np.testing.assert_array_equal(_collapse_channels("ga", ga), d)
        rgba = np.repeat(d[..., None], 4, axis=-1)
        rgba[..., 3] = 0.25
        np.testing.assert_array_equal(_collapse_channels("rgba", rgba), d)
        capsys.readouterr()

    def test_flat_depth_replicated_all_constant(self):
        """All non-zero planes equal (replicated flat depth, opaque alpha
        sharing the value) -> that value, silently or with a warning but
        never a raise."""
        from sucre_tpu.io.depth_formats import _collapse_channels

        d = np.full((2, 2), 2.0, np.float32)
        arr = np.repeat(d[..., None], 3, axis=-1)
        np.testing.assert_array_equal(_collapse_channels("rep", arr), d)

    def test_rgba_conflicting_still_raises(self, tmp_path):
        bgra = np.zeros((1, 2, 4), np.float32)
        bgra[..., 0] = np.array([1.0, 2.0])
        bgra[..., 2] = np.array([3.0, 4.0])
        bgra[..., 3] = 1.0
        p = tmp_path / "conflict4.tif"
        assert cv2.imwrite(str(p), bgra)
        with pytest.raises(ValueError, match="differing non-zero"):
            read_depth_any(p)

    def test_source_dtype(self, tmp_path):
        from sucre_tpu.io.depth_formats import source_dtype

        np.save(tmp_path / "u8.npy", np.ones((2, 2), np.uint8))
        assert source_dtype(tmp_path / "u8.npy") == np.uint8
        np.save(tmp_path / "f32.npy", np.ones((2, 2), np.float32))
        assert source_dtype(tmp_path / "f32.npy") == np.float32
        write_colmap_array(tmp_path / "d.bin", np.ones((2, 2), np.float32))
        assert source_dtype(tmp_path / "d.bin") == np.float32

    def test_source_dtype_tiff_header_only(self, tmp_path):
        """TIFF dtype comes from the header tags (BitsPerSample +
        SampleFormat), not a second full decode."""
        from sucre_tpu.io.depth_formats import _tiff_stored_dtype, source_dtype

        pf = tmp_path / "f32.tif"
        assert cv2.imwrite(str(pf), np.ones((3, 4), np.float32))
        assert _tiff_stored_dtype(pf) == np.float32
        assert source_dtype(pf) == np.float32
        pu = tmp_path / "u16.tif"
        assert cv2.imwrite(str(pu), np.ones((3, 4), np.uint16))
        assert source_dtype(pu) == np.uint16
        pb = tmp_path / "u8.tif"
        assert cv2.imwrite(str(pb), np.ones((3, 4), np.uint8))
        assert source_dtype(pb) == np.uint8

    def test_tiff_long_typed_bits_rejected_not_crash(self, tmp_path):
        """A big-endian TIFF whose BitsPerSample is written with a 4-byte
        LONG type reads 0 from the inline half-word; that must raise
        ValueError (caught by source_dtype's fallback), never reach
        np.dtype('u0') and TypeError."""
        import struct

        from sucre_tpu.io.depth_formats import _tiff_stored_dtype

        en = ">"
        ifd = struct.pack(en + "H", 1)
        # tag 258 BitsPerSample, type 4 (LONG), count 1, value 32:
        # inline bytes 00 00 00 20 -> the SHORT read sees 0
        ifd += struct.pack(en + "HHI", 258, 4, 1) + struct.pack(en + "I", 32)
        ifd += struct.pack(en + "I", 0)
        p = tmp_path / "long_bits.tif"
        p.write_bytes(b"MM" + struct.pack(en + "HI", 42, 8) + ifd)
        with pytest.raises(ValueError, match="unsupported TIFF sample"):
            _tiff_stored_dtype(p)

    def test_source_dtype_exr_header_only(self, tmp_path):
        """EXR pixel type parses from the chlist header; HALF reports the
        true 16-bit stored width (a cv2 decode would widen to f32). The
        probe never needs the (possibly absent) cv2 EXR codec, so the
        fixture is a handcrafted header with no pixel payload."""
        import struct

        from sucre_tpu.io.depth_formats import _exr_stored_dtype

        def exr_header(ptype: int) -> bytes:
            chan = b"Z\x00" + struct.pack("<i", ptype) + b"\x00" * 4
            chan += struct.pack("<ii", 1, 1)
            payload = chan + b"\x00"  # empty name terminates the list
            return (
                b"\x76\x2f\x31\x01" + struct.pack("<I", 2)
                + b"channels\x00chlist\x00" + struct.pack("<I", len(payload))
                + payload
            )

        for ptype, want in [(0, np.uint32), (1, np.float16), (2, np.float32)]:
            p = tmp_path / f"t{ptype}.exr"
            p.write_bytes(exr_header(ptype))
            assert _exr_stored_dtype(p) == want


class TestResolutionAndLoaders:
    def test_png_wins_over_alternatives(self, tmp_path):
        (tmp_path / "depth_img.png").write_bytes(b"")
        np.save(tmp_path / "depth_img.npy", np.ones((2, 2)))
        assert resolve_depth_path(tmp_path, "img.jpg").name == "depth_img.png"

    def test_alt_stem_resolution(self, tmp_path):
        np.save(tmp_path / "depth_img.npy", np.ones((2, 2)))
        assert resolve_depth_path(tmp_path, "img.jpg").suffix == ".npy"

    def test_colmap_dense_naming(self, tmp_path):
        write_colmap_array(tmp_path / "img.jpg.geometric.bin", np.ones((2, 2), np.float32))
        assert resolve_depth_path(tmp_path, "img.jpg").name == "img.jpg.geometric.bin"

    def test_nested_names(self, tmp_path):
        (tmp_path / "cam0").mkdir()
        np.save(tmp_path / "cam0" / "depth_img.npy", np.ones((2, 2)))
        got = resolve_depth_path(tmp_path, "cam0/img.jpg")
        assert got == tmp_path / "cam0" / "depth_img.npy"

    def test_missing_falls_back_to_reference_path(self, tmp_path):
        got = resolve_depth_path(tmp_path, "img.jpg")
        assert got.name == "depth_img.png"
        assert not got.exists()

    def test_loaders_agree_with_png(self, scene_dir, tmp_path):
        name, png, mm = _png_depths(scene_dir)[0]
        p = tmp_path / "d.bin"
        write_colmap_array(p, mm.astype(np.float32) / 1000.0)
        h, w = mm.shape
        np.testing.assert_array_equal(
            load_depth_raw(p, w, h), load_depth_raw(png, w, h)
        )
        np.testing.assert_array_equal(
            load_depth_map(p, w, h), load_depth_map(png, w, h)
        )
        # resize path (INTER_NEAREST) agrees too
        np.testing.assert_array_equal(
            load_depth_map(p, w // 2, h // 2), load_depth_map(png, w // 2, h // 2)
        )


class TestEndToEnd:
    def _scene_with_bin_depths(self, scene_dir, tmp_path):
        ddir = tmp_path / "dense_depths"
        ddir.mkdir()
        for name, _, mm in _png_depths(scene_dir):
            write_colmap_array(
                ddir / f"{name}.geometric.bin", mm.astype(np.float32) / 1000.0
            )
        return Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, ddir)

    def test_bin_pipeline_bit_identical_to_png(self, scene_dir, tmp_path):
        scene_png = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
        )
        scene_bin = self._scene_with_bin_depths(scene_dir, tmp_path)
        assert scene_bin["img_001.png"].depth_path.name == "img_001.png.geometric.bin"

        cfg = RestoreConfig(num_iter=3, verbose=False)
        res_png = restore_image(scene_png, "img_001.png", tmp_path / "a", cfg)
        res_bin = restore_image(scene_bin, "img_001.png", tmp_path / "b", cfg)
        assert res_bin.n_obs == res_png.n_obs
        np.testing.assert_array_equal(
            np.asarray(res_bin.params.beta), np.asarray(res_png.params.beta)
        )
        np.testing.assert_array_equal(
            np.asarray(res_bin.J), np.asarray(res_png.J)
        )

    def test_validator_reports_info_not_error(self, scene_dir, tmp_path):
        scene_bin = self._scene_with_bin_depths(scene_dir, tmp_path)
        ddir = scene_bin["img_000.png"].depth_path.parent
        findings, summary = validate(
            scene_dir.model_dir, scene_dir.image_dir, ddir, deep=True
        )
        errors = [f for f in findings if f.level == "ERROR"]
        assert errors == []
        codes = {f.code for f in findings}
        assert "depth-format" in codes
        assert all(f.level == "INFO" for f in findings if f.code == "depth-format")

    def test_validator_warns_narrow_integer(self, scene_dir, tmp_path):
        """A uint8 .npy depth map (caps at 0.255 m — a unit mistake) gets
        the same depth-bitdepth WARN an 8-bit PNG triggers; read_depth_any
        widens it to u16 so only the STORED dtype can tell."""
        ddir = tmp_path / "narrow"
        ddir.mkdir()
        for name, _, mm in _png_depths(scene_dir):
            np.save(
                ddir / f"depth_{Path(name).stem}.npy",
                np.minimum(mm, 255).astype(np.uint8),
            )
        findings, _ = validate(
            scene_dir.model_dir, scene_dir.image_dir, ddir, deep=True
        )
        assert any(
            f.code == "depth-bitdepth" and f.level == "WARN" for f in findings
        )

    def test_validator_warns_beyond_u16_range(self, scene_dir, tmp_path):
        ddir = tmp_path / "deep"
        ddir.mkdir()
        for name, _, mm in _png_depths(scene_dir):
            d = mm.astype(np.float32) / 1000.0
            d[d > 0] += 100.0  # push past 65.535 m
            write_colmap_array(ddir / f"{name}.geometric.bin", d)
        findings, _ = validate(
            scene_dir.model_dir, scene_dir.image_dir, ddir, deep=True
        )
        assert any(f.code == "depth-range" and f.level == "WARN" for f in findings)
        assert not any(f.level == "ERROR" for f in findings)

    def test_stack_depths_converts_mixed_units(self):
        """np.stack would promote u16 MILLIMETERS to float32 unconverted
        next to a float32 METERS map — _stack_depths converts first."""
        from sucre_tpu.pipeline import _stack_depths

        mm = np.array([[2000, 3000]], np.uint16)
        m = np.array([[66.0, 70.0]], np.float32)
        out = _stack_depths([mm, m])
        assert out.dtype == np.float32
        np.testing.assert_allclose(out[0], [[2.0, 3.0]])  # meters, not 2000
        np.testing.assert_allclose(out[1], m)
        # uniform input keeps the raw dtype (packed fast path)
        assert _stack_depths([mm, mm]).dtype == np.uint16

    def test_mixed_u16_and_float_views_keep_units(self, scene_dir, tmp_path):
        """A single beyond-u16 view must not corrupt its bucket-mates'
        units when the view stack mixes dtypes (regression: a bare
        np.stack read their millimeters as meters — 1000x depths)."""
        ddir = tmp_path / "mixed"
        ddir.mkdir()
        for i, (name, _, mm) in enumerate(_png_depths(scene_dir)):
            d = mm.astype(np.float32) / 1000.0
            if i == 0:
                d[0, 0] = 70.0  # only view 0 exceeds uint16 range
            write_colmap_array(ddir / f"{name}.geometric.bin", d)
        scene_mix = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, ddir
        )
        scene_png = Scene.from_colmap(
            scene_dir.model_dir, scene_dir.image_dir, scene_dir.depth_dir
        )
        cfg = RestoreConfig(num_iter=3, verbose=False)
        res_png = restore_image(scene_png, "img_001.png", tmp_path / "a", cfg)
        res_mix = restore_image(scene_mix, "img_001.png", tmp_path / "b", cfg)
        # only view 0's single poisoned corner pixel may drop out
        assert abs(res_mix.n_obs - res_png.n_obs) <= 1
        np.testing.assert_allclose(
            np.asarray(res_mix.params.beta),
            np.asarray(res_png.params.beta),
            atol=1e-4,
        )

    def test_deep_survey_restores_via_float_path(self, scene_dir, tmp_path):
        # Depths beyond u16 keep float32 and must still restore correctly
        # through the generic matching path. Shift the whole scene 100 m
        # away is not possible without re-rendering; instead just check
        # the float stack loads and matches: scale depths by 1 (float
        # passthrough) via a >65.535 m sentinel in one corner pixel.
        ddir = tmp_path / "float_depths"
        ddir.mkdir()
        for name, _, mm in _png_depths(scene_dir):
            d = mm.astype(np.float32) / 1000.0
            d[0, 0] = 70.0  # force the float path; corner is texture edge
            write_colmap_array(ddir / f"{name}.geometric.bin", d)
        scene = Scene.from_colmap(scene_dir.model_dir, scene_dir.image_dir, ddir)
        cfg = RestoreConfig(num_iter=3, verbose=False)
        res = restore_image(scene, "img_001.png", tmp_path / "out", cfg)
        assert res.n_obs > 0


def test_nan_replicated_channels_collapse(tmp_path):
    """Geometric-filtered float maps carry NaN at no-depth pixels; a
    3-channel replicated export must still collapse (equal_nan) instead
    of raising 'differing non-zero channels'."""
    import cv2

    from sucre_tpu.io.depth_formats import read_depth_any

    d = np.full((16, 20), 2.5, np.float32)
    d[0, :2] = np.nan
    cv2.imwrite(str(tmp_path / "d.tif"), np.repeat(d[..., None], 3, axis=2))
    out = read_depth_any(tmp_path / "d.tif")
    assert out.shape == (16, 20)
    # NaN pixels become invalid (0) under the u16-mm quantization
    assert out[0, 0] == 0 and out[1, 0] == 2500


def test_source_dtype_gray_alpha_tiff(tmp_path):
    """Gray+alpha TIFF stores its two BitsPerSample SHORTs INLINE in the
    tag value field; treating them as a file offset crashed (or silently
    misread) the stored-dtype probe."""
    PIL = pytest.importorskip("PIL.Image")

    from sucre_tpu.io.depth_formats import source_dtype

    la = np.zeros((16, 20, 2), np.uint8)
    la[..., 0] = np.arange(20, dtype=np.uint8)[None]
    la[..., 1] = 255
    PIL.fromarray(la, mode="LA").save(tmp_path / "t.tif")
    assert source_dtype(tmp_path / "t.tif") == np.uint8
