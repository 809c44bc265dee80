"""Surface-overlap culling: AABB math, overlap logic, end-to-end
equivalence (culling never changes results — it only skips pairs with
zero possible matches)."""

import numpy as np
import pytest

from sucre_tpu.ops.culling import aabb_overlap, cull_views, surface_aabb
from sucre_tpu.pipeline import RestoreConfig, restore_image
from sucre_tpu.scene import Scene
from tests.synthetic import make_scene


def test_surface_aabb_plane():
    H, W = 48, 64
    depth = np.full((H, W), 3000, np.uint16)  # 3 m
    intr = np.array([51.2, 51.2, 32.0, 24.0])
    R = np.eye(3)
    t = np.zeros(3)
    box = surface_aabb(depth, intr, R, t, stride=4, margin=0.0)
    lo, hi = box
    # plane at z=3: the raw box spans z=[3,3] inflated by exactly the
    # match-tolerance pad (pixel footprint + depth quantization —
    # required for culling to stay lossless; see _match_tolerance),
    # x in +-3*(32/51.2)
    from sucre_tpu.ops.culling import _match_tolerance

    tol = _match_tolerance(depth, intr)
    assert 0 < tol < 0.2
    np.testing.assert_allclose(lo[2], 3.0 - tol, atol=1e-6)
    np.testing.assert_allclose(hi[2], 3.0 + tol, atol=1e-6)
    assert lo[0] < -1.5 and hi[0] > 1.5


def test_surface_aabb_invalid_depth():
    assert surface_aabb(np.zeros((8, 8), np.uint16), np.ones(4), np.eye(3), np.zeros(3)) is None


def test_aabb_overlap():
    a = (np.zeros(3), np.ones(3))
    b = (np.ones(3) * 0.5, np.ones(3) * 2)
    c = (np.ones(3) * 1.5, np.ones(3) * 2)
    assert aabb_overlap(a, b)
    assert not aabb_overlap(a, c)
    assert not aabb_overlap(a, None)
    keep = cull_views([a], [b, c, None])
    np.testing.assert_array_equal(keep, [True, False, False])


class TestCullEndToEnd:
    def test_disjoint_view_culled_same_result(self, tmp_path):
        """Add a far-away view: culling must drop it and leave the restored
        result identical."""
        sd = make_scene(tmp_path, n_views=4)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        # fabricate a distant view by reusing view 3's files with a far pose
        import dataclasses

        far = dataclasses.replace(scene["img_003.png"], image_id=99,
                                  name="far.png", t=np.array([500.0, 0, 0], np.float32))
        image_list = scene.view_list() + [far]
        cfg_on = RestoreConfig(num_iter=5, verbose=False, store="memory", frustum_cull=True)
        cfg_off = RestoreConfig(num_iter=5, verbose=False, store="memory", frustum_cull=False)
        a = restore_image(scene, "img_001.png", tmp_path / "a", cfg_on, image_list=image_list)
        b = restore_image(scene, "img_001.png", tmp_path / "b", cfg_off, image_list=image_list)
        assert a.n_obs == b.n_obs
        np.testing.assert_allclose(np.nan_to_num(a.J), np.nan_to_num(b.J), atol=1e-6)

    def test_survey_path_culling(self, tmp_path):
        from sucre_tpu.pipeline import DeviceViews, ViewCache, restore_many
        import dataclasses

        sd = make_scene(tmp_path, n_views=4)
        scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
        far = dataclasses.replace(scene["img_003.png"], image_id=99,
                                  name="far.png", t=np.array([500.0, 0, 0], np.float32))
        image_list = scene.view_list() + [far]
        cache = ViewCache()
        cache.prefill(image_list)
        dv = DeviceViews(image_list, cache)
        cfg = RestoreConfig(num_iter=5, verbose=False, store="memory")
        a = restore_many(scene, ["img_001.png"], tmp_path / "a", cfg,
                         image_list=image_list, cache=cache, device_views=dv)
        cfg_off = dataclasses.replace(cfg, frustum_cull=False)
        b = restore_many(scene, ["img_001.png"], tmp_path / "b", cfg_off,
                         image_list=image_list, cache=cache, device_views=dv)
        assert a[0].n_obs == b[0].n_obs
        np.testing.assert_allclose(np.nan_to_num(a[0].J), np.nan_to_num(b[0].J), atol=1e-6)


def test_transect_survey_culling_equivalence(tmp_path):
    """A long-transect survey (cameras spread so far views share no
    surface): the survey path must cull most pairings for each batch and
    produce results identical to culling disabled."""
    import dataclasses

    from sucre_tpu.pipeline import restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path, n_views=12, width=64, height=48, spread=40.0)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)

    # sanity: distant views cannot overlap img_000's surface
    from sucre_tpu.pipeline import ViewCache
    from sucre_tpu.ops.culling import cull_views

    cache = ViewCache()
    keep = cull_views(
        [cache.aabb(scene["img_000.png"])],
        [cache.aabb(v) for v in scene.view_list()],
    )
    assert keep.sum() < len(scene.view_list()) // 2

    names = ["img_000.png", "img_001.png"]
    cfg = RestoreConfig(num_iter=4, verbose=False, store="memory")
    a = restore_survey(scene, names, tmp_path / "on", cfg, batch_targets=2)
    cfg_off = dataclasses.replace(cfg, frustum_cull=False)
    b = restore_survey(scene, names, tmp_path / "off", cfg_off, batch_targets=2)
    for ra, rb in zip(a, b):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(
            np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-6
        )
        np.testing.assert_allclose(ra.telemetry.cost, rb.telemetry.cost, rtol=1e-5)


def test_surface_tile_aabbs_partition_plane():
    """Tile AABBs partition the observed surface: their union covers the
    whole-view box, each tile's x-extent tracks its column band."""
    from sucre_tpu.ops.culling import surface_tile_aabbs

    H, W = 48, 64
    depth = np.full((H, W), 3000, np.uint16)  # 3 m plane
    intr = np.array([51.2, 51.2, 32.0, 24.0])
    tiles = surface_tile_aabbs(depth, intr, np.eye(3), np.zeros(3),
                               n_tiles=4, stride=4, margin=0.0)
    assert len(tiles) == 16 and all(t is not None for t in tiles)
    whole = surface_aabb(depth, intr, np.eye(3), np.zeros(3), stride=4, margin=0.0)
    lo = np.min([t[0] for t in tiles], axis=0)
    hi = np.max([t[1] for t in tiles], axis=0)
    np.testing.assert_allclose(lo, whole[0], atol=1e-9)
    np.testing.assert_allclose(hi, whole[1], atol=1e-9)
    # column band j=0 lies strictly left of j=3 (same row band)
    assert tiles[0][1][0] < tiles[3][0][0]
    # row band i=0 lies strictly above i=3 in Y
    assert tiles[0][1][1] < tiles[12][0][1]


def test_tile_view_rects_envelope():
    from sucre_tpu.ops.culling import surface_tile_aabbs, tile_view_rects

    H, W = 48, 64
    depth = np.full((H, W), 3000, np.uint16)
    intr = np.array([51.2, 51.2, 32.0, 24.0])
    tiles = surface_tile_aabbs(depth, intr, np.eye(3), np.zeros(3),
                               n_tiles=4, stride=4, margin=0.0)
    # a view box covering only the left half of the surface
    whole = surface_aabb(depth, intr, np.eye(3), np.zeros(3), stride=4, margin=0.0)
    mid_x = 0.5 * (whole[0][0] + whole[1][0])
    left = (whole[0], np.array([mid_x, whole[1][1], whole[1][2]]))
    far = (whole[0] + 1000.0, whole[1] + 1000.0)
    rects = tile_view_rects(tiles, [left, far, whole, None], H, W, n_tiles=4)
    r0, r1, c0, c1 = rects[0]
    assert (r0, r1) == (0, 48) and c0 == 0 and c1 <= 48  # <= 3 column tiles
    assert rects[1] == (0, 0, 0, 0)  # disjoint: fully culled
    assert rects[2] == (0, 48, 0, 64)  # full coverage
    assert rects[3] == (0, 0, 0, 0)  # empty view


def test_tile_cull_transect_equivalence_and_engagement(tmp_path):
    """On a spread transect, tile culling restricts matching to partial
    target rectangles (engagement asserted via tile_view_rects) while the
    restored result stays IDENTICAL to no culling at all — a culled tile's
    surface cannot contain a two-way-consistent match."""
    import dataclasses

    from sucre_tpu.ops.culling import (surface_aabb, surface_tile_aabbs,
                                       tile_view_rects)
    from sucre_tpu.pipeline import ViewCache

    sd = make_scene(tmp_path, n_views=10, width=64, height=48, spread=12.0)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    target = scene["img_004.png"]
    cache = ViewCache()
    depth = cache.get(target)[1]
    tiles = surface_tile_aabbs(depth, target.intrinsics, target.R, target.t)
    rects = tile_view_rects(
        tiles, [cache.aabb(v) for v in scene.view_list()],
        target.height, target.width,
    )
    partial = [
        r for r in rects
        if r[1] > r[0] and (r[3] - r[2]) * (r[1] - r[0]) < 48 * 64
    ]
    assert partial, "transect produced no partial-rectangle views"

    cfg_tiles = RestoreConfig(num_iter=5, verbose=False, store="memory")
    cfg_whole = dataclasses.replace(cfg_tiles, cull_tiles=0)
    cfg_off = dataclasses.replace(cfg_tiles, frustum_cull=False)
    a = restore_image(scene, "img_004.png", tmp_path / "a", cfg_tiles)
    b = restore_image(scene, "img_004.png", tmp_path / "b", cfg_whole)
    c = restore_image(scene, "img_004.png", tmp_path / "c", cfg_off)
    assert a.n_obs == b.n_obs == c.n_obs
    np.testing.assert_allclose(np.nan_to_num(a.J), np.nan_to_num(c.J), atol=1e-6)
    np.testing.assert_allclose(np.nan_to_num(b.J), np.nan_to_num(c.J), atol=1e-6)


def test_tile_cull_survey_chunked_equivalence(tmp_path, monkeypatch):
    """Multi-target chunked matching (the oversized-survey fallback) with
    tile rectangles: per-(target, view) pairings with no reachable tile
    are skipped entirely, and results equal both whole-view culling and
    no culling."""
    import dataclasses

    from sucre_tpu.pipeline import restore_many

    sd = make_scene(tmp_path, n_views=10, width=64, height=48, spread=12.0)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = ["img_002.png", "img_007.png"]  # far apart on the transect
    # force the chunked path (the tile rectangles' consumer)
    monkeypatch.setenv("SUCRE_SURVEY_MAX_PAIRS", "1")
    cfg_tiles = RestoreConfig(num_iter=4, verbose=False, store="memory")
    cfg_whole = dataclasses.replace(cfg_tiles, cull_tiles=0)
    cfg_off = dataclasses.replace(cfg_tiles, frustum_cull=False)
    a = restore_many(scene, names, tmp_path / "a", cfg_tiles)
    b = restore_many(scene, names, tmp_path / "b", cfg_whole)
    c = restore_many(scene, names, tmp_path / "c", cfg_off)
    for ra, rb, rc in zip(a, b, c):
        assert ra.n_obs == rb.n_obs == rc.n_obs
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rc.J), atol=1e-6)
        np.testing.assert_allclose(np.nan_to_num(rb.J), np.nan_to_num(rc.J), atol=1e-6)


def test_tile_cull_never_drops_observations_any_target(tmp_path):
    """Regression (caught live in CLI verification): disjoint per-tile
    sample sets left boundary gap strips in NO tile's AABB, and the
    per-tile-diagonal pad was ~4x smaller than the whole-view slack — an
    8-view spread-12 transect falsely culled a view carrying 188 real
    observations. Sweep EVERY target: tile-culled n_obs must equal
    culling-off n_obs exactly."""
    import dataclasses

    sd = make_scene(tmp_path, n_views=8, width=64, height=48, spread=12.0)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    cfg = RestoreConfig(num_iter=2, verbose=False, store="memory")
    cfg_off = dataclasses.replace(cfg, frustum_cull=False)
    for name in sd.names:
        a = restore_image(scene, name, tmp_path / "a" / name, cfg)
        c = restore_image(scene, name, tmp_path / "c" / name, cfg_off)
        assert a.n_obs == c.n_obs, f"{name}: {a.n_obs} != {c.n_obs}"


def test_surface_tile_aabbs_small_image_every_tile_sampled():
    """On images smaller than n_tiles*stride the sampling stride must
    shrink so every tile still gets samples — an unsampled tile reads as
    'unreachable' and silently drops real matches (caught at
    image_scale=0.5)."""
    from sucre_tpu.ops.culling import surface_tile_aabbs

    depth = np.full((24, 32), 3000, np.uint16)
    intr = np.array([25.6, 25.6, 16.0, 12.0])
    tiles = surface_tile_aabbs(depth, intr, np.eye(3), np.zeros(3),
                               n_tiles=4, stride=8)
    assert all(t is not None for t in tiles)


def test_device_views_subset_on_device_compaction(tmp_path):
    """DeviceViews.subset compacts resident stacks on device: kept views
    (any bucket mix) keep their arrays bit-identical, untouched buckets
    are shared (no copy), empty buckets drop, and the culled chunked
    survey path built on a subset equals the host-streamed result."""
    import jax.numpy as jnp

    from sucre_tpu.pipeline import DeviceViews, ViewCache

    sd = make_scene(tmp_path, n_views=6, width=64, height=48, two_cameras=True)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    cache = ViewCache()
    dv = DeviceViews(scene.view_list(), cache, match_chunk=4)
    assert len(dv.buckets) == 2

    # full keep: no-op, same object
    assert dv.subset(scene.view_list()) is dv

    # drop every odd view (the whole second camera bucket disappears)
    kept = [v for i, v in enumerate(scene.view_list()) if i % 2 == 0]
    sub = dv.subset(kept)
    assert len(sub.buckets) == 1
    names = [v.name for b in sub.buckets for v in b["views"]]
    assert names == [v.name for v in kept]
    b_full = dv.buckets[0]
    b_sub = sub.buckets[0]
    for k in ("depths", "rgbs"):
        idx = [i for i, v in enumerate(b_full["views"]) if v.name in set(names)]
        np.testing.assert_array_equal(
            np.asarray(b_sub[k]), np.asarray(jnp.take(b_full[k], jnp.asarray(idx), axis=0))
        )

    # partial drop inside one bucket: untouched bucket object is SHARED
    kept2 = [v for v in scene.view_list() if v.name != kept[0].name]
    sub2 = dv.subset(kept2)
    assert any(b is dv.buckets[1] for b in sub2.buckets)
