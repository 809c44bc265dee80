"""Native C++ layer tests: COLMAP reader parity with the Python parser,
libpng/libjpeg decode parity with cv2, threaded batch decode."""

import cv2
import numpy as np
import pytest

from sucre_tpu.io import colmap as cio
from tests.synthetic import make_scene

native = pytest.importorskip("sucre_tpu.io.native")
if not native.available():
    pytest.skip("libsucre_native.so not built (make -C csrc)", allow_module_level=True)


class TestColmapNative:
    def test_parity_with_python_parser(self, tmp_path):
        sd = make_scene(tmp_path, n_views=4)
        py_cams, py_imgs, _ = cio.read_model(sd.model_dir)
        nat_cams, nat_imgs = native.read_model_native(sd.model_dir)
        assert set(nat_cams) == set(py_cams)
        for cid in py_cams:
            assert nat_cams[cid].model == py_cams[cid].model
            assert nat_cams[cid].width == py_cams[cid].width
            np.testing.assert_allclose(nat_cams[cid].params, py_cams[cid].params)
        assert set(nat_imgs) == set(py_imgs)
        for iid in py_imgs:
            np.testing.assert_allclose(nat_imgs[iid].qvec, py_imgs[iid].qvec)
            np.testing.assert_allclose(nat_imgs[iid].tvec, py_imgs[iid].tvec)
            assert nat_imgs[iid].name == py_imgs[iid].name
            assert nat_imgs[iid].camera_id == py_imgs[iid].camera_id

    def test_missing_file_error(self, tmp_path):
        with pytest.raises(ValueError, match="cannot read"):
            native.read_model_native(tmp_path)


class TestDecodeNative:
    def test_depth16_parity(self, tmp_path):
        depth = np.arange(48, dtype=np.uint16).reshape(6, 8) * 997
        cv2.imwrite(str(tmp_path / "d.png"), depth)
        got = native.decode_depth_png16(tmp_path / "d.png", 8, 6)
        np.testing.assert_array_equal(got, depth)

    def test_rgb8_png_parity(self, tmp_path, rng):
        img = rng.integers(0, 256, (6, 8, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "a.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        got = native.decode_rgb8(tmp_path / "a.png", 8, 6)
        np.testing.assert_array_equal(got, img)

    def test_rgb8_jpeg_close_to_cv2(self, tmp_path, rng):
        img = rng.integers(0, 256, (32, 40, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "a.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        got = native.decode_rgb8(tmp_path / "a.jpg", 40, 32)
        ref = cv2.cvtColor(cv2.imread(str(tmp_path / "a.jpg")), cv2.COLOR_BGR2RGB)
        # Different IDCT implementations may differ by a couple of LSBs.
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2

    def test_probe(self, tmp_path):
        depth = np.zeros((6, 8), np.uint16)
        cv2.imwrite(str(tmp_path / "d.png"), depth)
        assert native.probe(tmp_path / "d.png") == (8, 6, "png")

    @pytest.mark.parametrize("tag", [2, 3, 4, 5, 6, 7, 8])
    def test_exif_orientation_matches_cv2(self, tmp_path, tag):
        """EXIF-tagged JPEGs (common from survey camera rigs) must decode
        IDENTICALLY to cv2.imread, which applies the orientation tag by
        default (the reference's decode, loader.py:157) — including the
        width/height swap for tags 5-8. Probe reports displayed dims."""
        from PIL import Image

        a = (np.arange(20 * 12 * 3) % 251).astype(np.uint8).reshape(12, 20, 3)
        e = Image.Exif()
        e[274] = tag
        p = tmp_path / f"o{tag}.jpg"
        Image.fromarray(a).save(p, exif=e, quality=95)

        ref = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        w, h, kind = native.probe(p)
        assert kind == "jpeg" and (w, h) == (ref.shape[1], ref.shape[0])
        got = native.decode_rgb8(p, w, h)
        # same libjpeg underneath -> the orientation remap must be exact
        np.testing.assert_array_equal(got, ref)

    def test_exif_orientation_dim_mismatch_rejected(self, tmp_path):
        """Passing pre-orientation (sensor) dims for a 90-degree-rotated
        JPEG must fail the displayed-frame dims check, not decode into a
        transposed buffer."""
        from PIL import Image

        a = np.zeros((12, 20, 3), np.uint8)
        e = Image.Exif()
        e[274] = 6
        p = tmp_path / "rot.jpg"
        Image.fromarray(a).save(p, exif=e, quality=95)
        with pytest.raises(IOError):
            native.decode_rgb8(p, 20, 12)  # sensor frame: wrong
        assert native.decode_rgb8(p, 12, 20).shape == (20, 12, 3)

    def test_batch_decode(self, tmp_path, rng):
        paths = []
        for i in range(5):
            img = rng.integers(0, 256, (6, 8, 3), np.uint8)
            cv2.imwrite(str(tmp_path / f"i{i}.png"), img)
            depth = rng.integers(0, 65535, (6, 8), np.uint16)
            cv2.imwrite(str(tmp_path / f"d{i}.png"), depth)
            paths.append((img, depth))
        jobs = []
        for i in range(5):
            jobs.append((tmp_path / f"i{i}.png", "rgb8", 8, 6))
            jobs.append((tmp_path / f"d{i}.png", "depth16", 8, 6))
        outs = native.decode_batch(jobs, n_threads=3)
        for i in range(5):
            ref_rgb = cv2.cvtColor(cv2.imread(str(tmp_path / f"i{i}.png")), cv2.COLOR_BGR2RGB)
            np.testing.assert_array_equal(outs[2 * i], ref_rgb)
            ref_d = cv2.imread(str(tmp_path / f"d{i}.png"), cv2.IMREAD_UNCHANGED)
            np.testing.assert_array_equal(outs[2 * i + 1], ref_d)

    def test_batch_decode_failure(self, tmp_path):
        with pytest.raises(IOError, match="failures"):
            native.decode_batch([(tmp_path / "missing.png", "rgb8", 4, 4)])

    def test_corrupt_jpeg_fails_per_item(self, tmp_path, rng):
        """A truncated/corrupt JPEG must surface as a per-item decode
        failure, not kill the process (libjpeg's default error_exit calls
        exit(); the codec installs a longjmp handler instead)."""
        img = rng.integers(0, 256, (32, 40, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "ok.jpg"), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        data = (tmp_path / "ok.jpg").read_bytes()
        # hard corruption: JPEG magic followed by garbage (invalid marker
        # => error_exit; mere truncation is only a libjpeg warning)
        (tmp_path / "bad.jpg").write_bytes(data[:2] + b"\x00" * 64)
        with pytest.raises(IOError, match="failures"):
            native.decode_batch(
                [
                    (tmp_path / "bad.jpg", "rgb8", 40, 32),
                    (tmp_path / "ok.jpg", "rgb8", 40, 32),
                ],
                n_threads=2,
            )
        # the process survives and can still decode good files afterwards
        got = native.decode_rgb8(tmp_path / "ok.jpg", 40, 32)
        assert got.shape == (32, 40, 3)


class TestCachePrefillNative:
    def test_prefill_uses_native(self, tmp_path):
        from sucre_tpu.pipeline import ViewCache
        from sucre_tpu.scene import Scene

        sd = make_scene(tmp_path, n_views=3)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        cache = ViewCache()
        cache.prefill(scene.view_list(), num_workers=2)
        rgb, depth = cache.get(scene["img_001.png"])
        assert rgb.dtype == np.uint8 and depth.dtype == np.uint16
        ref = cv2.cvtColor(cv2.imread(str(scene["img_001.png"].rgb_path)), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(rgb, ref)


def test_encode_png8_roundtrip(tmp_path):
    """Native PNG encoder round-trips exactly through the native decoder
    and through PIL (lossless)."""
    from sucre_tpu.io import native
    from PIL import Image

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    native.encode_png8(p, img)
    back = native.decode_rgb8(p, 53, 37)
    np.testing.assert_array_equal(back, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)

    gray = rng.integers(0, 256, size=(20, 31), dtype=np.uint8)
    p2 = tmp_path / "g.png"
    native.encode_png8(p2, gray)
    np.testing.assert_array_equal(np.asarray(Image.open(p2)), gray)


class TestCorruptColmapBin:
    def test_huge_count_is_error_not_crash(self, tmp_path):
        """A corrupt cameras.bin whose count field decodes to a garbage
        size must surface as a parse error (counts are bounded by the
        file size before sizing any allocation)."""
        from sucre_tpu.io import native

        if not native.available():
            pytest.skip("native library not built")
        import struct

        (tmp_path / "cameras.bin").write_bytes(
            struct.pack("<Q", 0xFFFFFFFFFFFFFFFF) + b"\x00" * 64
        )
        (tmp_path / "images.bin").write_bytes(struct.pack("<Q", 0))
        with pytest.raises(ValueError, match="corrupt cameras.bin"):
            native.read_model_native(tmp_path)

    def test_overflowing_point_count_is_error(self, tmp_path):
        """A corrupt per-image point count that would wrap npts*24 past
        the buffer must fail the parse, not silently misread."""
        from sucre_tpu.io import native

        if not native.available():
            pytest.skip("native library not built")
        import struct

        # one valid PINHOLE camera
        (tmp_path / "cameras.bin").write_bytes(
            struct.pack("<Q", 1)
            + struct.pack("<ii", 1, 1)
            + struct.pack("<QQ", 8, 6)
            + struct.pack("<4d", 10.0, 10.0, 4.0, 3.0)
        )
        (tmp_path / "images.bin").write_bytes(
            struct.pack("<Q", 1)
            + struct.pack("<I", 1)
            + struct.pack("<4d", 1, 0, 0, 0)
            + struct.pack("<3d", 0, 0, 0)
            + struct.pack("<I", 1)
            + b"a.png\x00"
            + struct.pack("<Q", 0x0FFFFFFFFFFFFFFF)  # npts*24 wraps u64
        )
        with pytest.raises(ValueError, match="truncated images.bin"):
            native.read_model_native(tmp_path)


def test_decode_rgb8_palette_trns_png(tmp_path, rng):
    """Paletted PNGs with tRNS transparency (a valid variant some tools
    emit) decode natively instead of falling back to cv2."""
    from PIL import Image

    from sucre_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    w, h = 16, 12
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    im = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    im.info["transparency"] = 0  # adds a tRNS chunk on save
    p = tmp_path / "pal.png"
    im.save(p, transparency=0)
    out = native.decode_rgb8(p, w, h)
    expected = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, expected)


def test_cmyk_jpeg_falls_back_to_cv2_parity(tmp_path, rng):
    """CMYK/YCCK JPEGs are not a libjpeg-convertible RGB source: the
    native decode must FAIL CLEANLY (no crash, no wrong colors) and the
    load_rgb_raw fallback must produce exactly what cv2 — the reference's
    decoder — produces."""
    import cv2
    from PIL import Image

    from sucre_tpu.io import native
    from sucre_tpu.io.images import load_rgb_raw

    w, h = 48, 32
    arr = rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8)
    p = tmp_path / "cmyk.jpg"
    Image.fromarray(arr, mode="CMYK").save(p)
    if native.available():
        with pytest.raises(IOError):
            native.decode_rgb8(p, w, h)
    got = load_rgb_raw(p, w, h)
    expected = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(got, expected)


def test_grayscale_jpeg_native_matches_cv2(tmp_path, rng):
    """Grayscale JPEGs decode natively (libjpeg gray->RGB replicate) and
    must match cv2's 3-channel load byte for byte."""
    import cv2
    from PIL import Image

    from sucre_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    w, h = 48, 32
    arr = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
    p = tmp_path / "gray.jpg"
    Image.fromarray(arr, mode="L").save(p)
    out = native.decode_rgb8(p, w, h)
    expected = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(out, expected)


def test_prefill_with_cmyk_jpeg_degrades_to_cv2(tmp_path, rng):
    """One CMYK file in a survey demotes the batch prefill to the cv2
    path but every view still loads, with cv2-identical pixels."""
    import cv2
    from PIL import Image

    from sucre_tpu.pipeline import ViewCache

    w, h = 48, 32

    class _V:
        def __init__(self, name, rgb, depth, width, height):
            self.name, self.rgb_path, self.depth_path = name, rgb, depth
            self.width, self.height = width, height

    views = []
    for i in range(3):
        rp = tmp_path / f"v{i}.jpg"
        dp = tmp_path / f"v{i}.png"
        if i == 1:
            Image.fromarray(
                rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8), mode="CMYK"
            ).save(rp)
        else:
            cv2.imwrite(str(rp), rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
        cv2.imwrite(str(dp), rng.integers(1, 5000, size=(h, w)).astype(np.uint16))
        views.append(_V(f"v{i}.jpg", rp, dp, w, h))

    cache = ViewCache()
    cache.prefill(views, num_workers=2)
    for v in views:
        rgb, depth = cache.get(v)
        expected = cv2.cvtColor(cv2.imread(str(v.rgb_path)), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(rgb, expected)
        assert depth.shape == (h, w)
