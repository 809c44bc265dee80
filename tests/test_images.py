"""Decode/resize parity tests for io.images."""

import cv2
import numpy as np
import pytest

from sucre_tpu.io.images import batched, load_depth_map, load_rgb, prefetch_views
from sucre_tpu.scene import Scene
from tests.synthetic import make_scene


def test_load_rgb_values(tmp_path):
    img = np.zeros((4, 6, 3), np.uint8)
    img[0, 0] = [255, 0, 0]  # BGR on disk
    img[1, 2] = [0, 128, 0]
    cv2.imwrite(str(tmp_path / "a.png"), img)
    rgb = load_rgb(tmp_path / "a.png", width=6, height=4)
    assert rgb.shape == (4, 6, 3) and rgb.dtype == np.float32
    np.testing.assert_allclose(rgb[0, 0], [0, 0, 1.0])  # BGR -> RGB swap
    np.testing.assert_allclose(rgb[1, 2], [0, 128 / 255, 0])


def test_load_rgb_resize_modes(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "a.png"), img)
    ref_float = cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255
    down = load_rgb(tmp_path / "a.png", width=20, height=16)
    ref_down = cv2.resize(ref_float, (20, 16), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(down, ref_down.astype(np.float32), atol=1e-6)
    up = load_rgb(tmp_path / "a.png", width=80, height=64)
    ref_up = cv2.resize(ref_float, (80, 64), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(up, ref_up.astype(np.float32), atol=1e-6)


def test_load_depth_16bit(tmp_path):
    depth = np.array([[0, 1500], [65535, 2750]], np.uint16)
    cv2.imwrite(str(tmp_path / "d.png"), depth)
    d = load_depth_map(tmp_path / "d.png", width=2, height=2)
    assert d.dtype == np.float32
    np.testing.assert_allclose(d, [[0, 1.5], [65.535, 2.75]], rtol=1e-6)


def test_load_depth_resize_nearest(tmp_path):
    depth = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
    cv2.imwrite(str(tmp_path / "d.png"), depth)
    d = load_depth_map(tmp_path / "d.png", width=2, height=3)
    ref = cv2.resize(depth / 1000, (2, 3), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_allclose(d, ref.astype(np.float32))


@pytest.mark.parametrize("num_workers", [0, 2])
def test_prefetch_views(tmp_path, num_workers):
    scene_def = make_scene(tmp_path, n_views=4)
    scene = Scene.from_colmap(scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir)
    views = scene.view_list()
    seen = []
    for i, rgb, depth in prefetch_views(views, num_workers=num_workers):
        assert rgb.shape == (scene_def.height, scene_def.width, 3)
        assert depth.shape == (scene_def.height, scene_def.width)
        assert np.all(depth > 0)
        seen.append(i)
    assert seen == [0, 1, 2, 3]  # order preserved


def test_prefetch_views_processes_match_threads(tmp_path):
    """Worker-process decode (the reference's DataLoader model,
    loader.py:173-180) yields byte-identical arrays in the same order as
    the default thread pool."""
    scene_def = make_scene(tmp_path, n_views=3)
    scene = Scene.from_colmap(
        scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir
    )
    views = scene.view_list()
    threaded = list(prefetch_views(views, num_workers=2, raw=True))
    procs = list(
        prefetch_views(views, num_workers=1, raw=True, processes=True)
    )
    assert [i for i, _, _ in procs] == [0, 1, 2]
    for (ti, tr, td), (pi, pr, pd) in zip(threaded, procs):
        assert ti == pi
        np.testing.assert_array_equal(tr, pr)
        np.testing.assert_array_equal(td, pd)


def test_prefetch_depth_only(tmp_path):
    scene_def = make_scene(tmp_path, n_views=2)
    scene = Scene.from_colmap(scene_def.model_dir, scene_def.image_dir, scene_def.depth_dir)
    for _, rgb, depth in prefetch_views(scene.view_list(), rgb=False, num_workers=1):
        assert rgb is None and depth is not None


def test_batched():
    assert list(batched(range(5), 2)) == [[0, 1], [2, 3], [4]]


def test_rgb_raw_scaled_stays_u8_and_close_to_float_path(tmp_path):
    """image_scale != 1: the raw decode resamples in the uint8 domain
    (keeping the packed matching path); values stay within ~1 LSB of the
    reference's float-domain resize."""
    from sucre_tpu.io.images import load_rgb, load_rgb_raw

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "a.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    raw = load_rgb_raw(tmp_path / "a.png", 32, 24)  # downscale: u8 AREA
    assert raw.dtype == np.uint8 and raw.shape == (24, 32, 3)
    ref = load_rgb(tmp_path / "a.png", 32, 24)
    assert np.abs(raw.astype(np.float32) / 255 - ref).max() <= 1.5 / 255
    # upscale keeps the float path: the reference's float-domain CUBIC
    # overshoots outside [0,1] and those values are real observations
    up = load_rgb_raw(tmp_path / "a.png", 96, 72)
    assert up.dtype == np.float32
    np.testing.assert_array_equal(up, load_rgb(tmp_path / "a.png", 96, 72))


def test_scaled_scene_keeps_packed_path(tmp_path):
    """A whole image_scale=0.5 pipeline keeps raw integer dtypes through
    the view cache, so matching takes the packed single-gather path."""
    from sucre_tpu.ops.matching import _is_raw_views
    from sucre_tpu.pipeline import ViewCache

    sd = make_scene(tmp_path, n_views=2, width=64, height=48)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir, image_scale=0.5)
    cache = ViewCache()
    cache.prefill(scene.view_list())
    rgb, depth = cache.get(scene["img_000.png"])
    assert rgb.dtype == np.uint8 and rgb.shape == (24, 32, 3)
    assert depth.dtype == np.uint16 and depth.shape == (24, 32)
    import jax.numpy as jnp

    assert _is_raw_views(jnp.asarray(depth[None]), jnp.asarray(rgb[None]))


def test_multichannel_png_depth_collapses(tmp_path):
    """A 16-bit RGB depth PNG (editor/exporter artifact, all channels
    equal) must decode to a single (H, W) plane like the TIFF/EXR path,
    on both the f32 and the raw decode."""
    from sucre_tpu.io.images import load_depth_raw

    d = (np.arange(6 * 8, dtype=np.uint16).reshape(6, 8) * 100) + 500
    cv2.imwrite(str(tmp_path / "d.png"), np.repeat(d[..., None], 3, axis=2))
    out = load_depth_map(tmp_path / "d.png", 8, 6)
    assert out.shape == (6, 8)
    np.testing.assert_allclose(out, d / 1000, atol=1e-6)
    raw = load_depth_raw(tmp_path / "d.png", 8, 6)
    assert raw.shape == (6, 8)
    np.testing.assert_array_equal(raw, d)


def test_rgb_raw_upscale_matches_float_path(tmp_path):
    """The upscale fallback decodes once and must still be byte-identical
    to load_rgb (float-domain INTER_CUBIC, unclipped overshoots)."""
    from sucre_tpu.io.images import load_rgb_raw

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (12, 16, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "i.png"), img[..., ::-1])
    a = load_rgb_raw(tmp_path / "i.png", 32, 24)
    b = load_rgb(tmp_path / "i.png", 32, 24)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
