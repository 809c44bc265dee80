"""Round-5 probe: projection-footprint match prefilter (VERDICT r4 #4).

The r4 verdict asked for a stride-subsampled prematch pass to cut
matching gather volume below the AABB tile-rectangle granularity. A
stride prematch cannot be lossless (samples miss matches), so this
probe evaluates the EXACT variant instead: a projection-only footprint
test — forward-project every valid target pixel into each candidate
view (pure VPU math, NO gather — the gather is matching's entire cost)
and keep the pair iff any projection lands in-bounds. Every two-way
match requires exactly that, so dropping empty-footprint pairs is
provably lossless; it is strictly tighter than the AABB overlap test
(which bounds the surfaces, not the projected footprint).

Measured questions, on the chip, bench-transect shape (48 views
spread-40, 8 targets, 544x960, batches of 4):

  1. kept views per target: AABB tile rects vs forward footprint vs
     forward+reverse footprint vs TRUE (pairs with any two-way match)
  2. cost of the footprint program itself (T x V_all pairs)
  3. matching-only device time: AABB lists vs footprint lists through
     the SAME match_survey_indexed program, outputs asserted equal

Promotion rule (VERDICT): only if it beats the current route at equal
output. Run: python scripts/probe_prefilter_r5.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from bench import Workload, log
    from sucre_tpu.ops.culling import surface_tile_aabbs, tile_view_rects
    from sucre_tpu.ops.matching import (
        match_survey,
        match_survey_indexed,
        to_f32_depth,
    )
    from sucre_tpu.ops.pinhole import pixel_grid
    from sucre_tpu.ops.se3 import pose_inverse, transform_points

    twl = Workload("transect", 48, 960, 544, 8, 4, 200, spread=40.0)
    scene, cache = twl.scene, twl.cache
    views = scene.view_list()
    b = twl.device_views.buckets[0]
    V = len(b["views"])
    pos = {v.name: i for i, v in enumerate(b["views"])}

    @partial(jax.jit, static_argnames=())
    def footprints(t_depths, t_intrs, t_Rs, t_ts, v_intrs, v_Rs, v_ts,
                   v_dims):
        """(T, V) forward footprint-nonempty + (T, V) reverse."""
        t_depths = to_f32_depth(t_depths)
        H, W = t_depths.shape[1:]

        def fwd_one(d1, intr1, R1, t1, intr2, R2, t2, dims2):
            u1, v1 = pixel_grid(H, W)
            fx, fy, cx, cy = intr1[0], intr1[1], intr1[2], intr1[3]
            x = (u1.astype(jnp.float32) + 0.5 - cx) / fx
            y = (v1.astype(jnp.float32) + 0.5 - cy) / fy
            cP = jnp.stack([x * d1, y * d1, d1], axis=-1)
            wP = transform_points(R1, t1, cP)
            R2i, t2i = pose_inverse(R2, t2)
            q = transform_points(R2i, t2i, wP)
            gx = intr2[0] * q[..., 0] / q[..., 2] + intr2[2]
            gy = intr2[1] * q[..., 1] / q[..., 2] + intr2[3]
            inb = (
                (d1 > 0) & (q[..., 2] > 0)
                & (gx >= 0) & (gx < dims2[0]) & (gy >= 0) & (gy < dims2[1])
            )
            return inb.any()

        def per_target(d1, intr1, R1, t1):
            f = jax.vmap(
                lambda i2, R2, t2, dd: fwd_one(d1, intr1, R1, t1, i2, R2, t2, dd)
            )(v_intrs, v_Rs, v_ts, v_dims)
            return f

        fwdm = jax.vmap(per_target)(t_depths, t_intrs, t_Rs, t_ts)
        return fwdm

    names = twl.targets
    tb = [scene[n] for n in names]
    j = jnp.asarray
    t_depths = j(np.stack([cache.get(t)[1] for t in tb]))
    t_intrs = j(np.stack([t.intrinsics for t in tb]).astype(np.float32))
    t_Rs = j(np.stack([t.R for t in tb]).astype(np.float32))
    t_ts = j(np.stack([t.t for t in tb]).astype(np.float32))
    v_dims = j(np.stack([[v.width, v.height] for v in b["views"]]).astype(np.float32))

    # --- 1. kept counts: AABB vs footprint vs true ---------------------
    v_aabbs = [cache.aabb(v) for v in views]
    aabb_kept = []
    for t in tb:
        tiles = surface_tile_aabbs(
            cache.get(t)[1], t.intrinsics, t.R, t.t, n_tiles=4,
            dist=t.dist, dist_model=t.dist_model,
        )
        rl = tile_view_rects(tiles, v_aabbs, t.height, t.width, n_tiles=4)
        aabb_kept.append([v.name for v, r in zip(views, rl) if r[1] > r[0]])

    t0 = time.perf_counter()
    fwd = footprints(t_depths, t_intrs, t_Rs, t_ts,
                     b["intrs"], b["Rs"], b["ts"], v_dims)
    fwd = np.asarray(jax.device_get(fwd))
    t_fwd_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    fwd = np.asarray(jax.device_get(footprints(
        t_depths, t_intrs, t_Rs, t_ts, b["intrs"], b["Rs"], b["ts"], v_dims
    )))
    t_fwd = time.perf_counter() - t0
    # reverse direction: view pixels projecting into the target — the
    # same program with roles swapped gives the (V, T) transpose in one
    # call (views as "targets", the T real targets as the view table)
    t_dims = j(np.stack([[t.width, t.height] for t in tb]).astype(np.float32))
    t0 = time.perf_counter()
    rev = np.asarray(jax.device_get(footprints(
        b["depths"], b["intrs"], b["Rs"], b["ts"],
        t_intrs, t_Rs, t_ts, t_dims,
    ))).T
    t_rev = time.perf_counter() - t0

    # true per-pair match counts (shared program over all views)
    obs = match_survey(
        t_depths, t_intrs, t_Rs, t_ts,
        b["depths"], b["rgbs"], b["intrs"], b["Rs"], b["ts"],
        jnp.float32(twl.cfg.min_cover),
    )
    true_counts = np.asarray(jax.device_get(obs.valid.sum(axis=(2, 3))))

    fwd_kept = [[views[i].name for i in range(V) if fwd[ti, i]]
                for ti in range(len(tb))]
    both_kept = [[views[i].name for i in range(V) if fwd[ti, i] and rev[ti, i]]
                 for ti in range(len(tb))]
    true_kept = [[views[i].name for i in range(V) if true_counts[ti, i] > 0]
                 for ti in range(len(tb))]
    # exactness: every true-match view must survive every filter
    for ti in range(len(tb)):
        assert set(true_kept[ti]) <= set(fwd_kept[ti]), (ti, "fwd")
        assert set(true_kept[ti]) <= set(both_kept[ti]), (ti, "both")
    counts = {
        "aabb": [len(k) for k in aabb_kept],
        "fwd_footprint": [len(k) for k in fwd_kept],
        "fwd_and_rev": [len(k) for k in both_kept],
        "true": [len(k) for k in true_kept],
    }
    log(f"kept/target: {counts}")

    # --- 3. matching time: AABB lists vs footprint lists ---------------
    def make_idx(kept_lists):
        S = max(2, -(-max(len(k) for k in kept_lists) // 2) * 2)
        idx_np = np.full((len(tb), S), V, np.int32)
        for ti, ks in enumerate(kept_lists):
            for s, n in enumerate(ks):
                idx_np[ti, s] = pos[n]
        return idx_np

    def run_indexed(idx_np, label, pbase, reps=4):
        walls = []
        for rep in range(reps):
            twl.perturb(pbase + rep)
            t0 = time.perf_counter()
            o = match_survey_indexed(
                jnp.where(t_depths > 0,
                          t_depths + jnp.uint16(pbase + rep), t_depths),
                t_intrs, t_Rs, t_ts,
                b["depths"], b["rgbs"], b["intrs"], b["Rs"], b["ts"],
                j(idx_np), jnp.float32(twl.cfg.min_cover),
            )
            n = int(np.asarray(jax.device_get(o.n_obs)))
            walls.append(time.perf_counter() - t0)
            log(f"[{label}] rep {rep}: {walls[-1]:.3f}s n_obs={n}")
        return min(walls[1:]) if len(walls) > 1 else walls[0]

    idx_aabb, idx_fp = make_idx(aabb_kept), make_idx(both_kept)
    t_aabb = run_indexed(idx_aabb, "aabb-lists", 10)
    t_both = run_indexed(idx_fp, "footprint-lists", 20)

    # equal output at ONE shared input: per-(target, view-name) counts
    twl.perturb(30)
    per_name = []
    for idx_np, kept in ((idx_aabb, aabb_kept), (idx_fp, both_kept)):
        o = match_survey_indexed(
            jnp.where(t_depths > 0, t_depths + jnp.uint16(30), t_depths),
            t_intrs, t_Rs, t_ts,
            b["depths"], b["rgbs"], b["intrs"], b["Rs"], b["ts"],
            j(idx_np), jnp.float32(twl.cfg.min_cover),
        )
        c = np.asarray(jax.device_get(o.valid.sum(axis=(2, 3))))
        per_name.append([
            {n: int(c[ti, s]) for s, n in enumerate(ks)}
            for ti, ks in enumerate(kept)
        ])
    for ti, (da, df) in enumerate(zip(*per_name)):
        nza = {k: v for k, v in da.items() if v}
        nzf = {k: v for k, v in df.items() if v}
        assert nza == nzf, (ti, nza, nzf)

    print(json.dumps({
        "kept_counts": counts,
        "footprint_fwd_s": round(t_fwd, 3),
        "footprint_fwd_first_s": round(t_fwd_first, 3),
        "footprint_rev_s_total": round(t_rev, 3),
        "match_aabb_lists_s": round(t_aabb, 3),
        "match_footprint_lists_s": round(t_both, 3),
    }))


if __name__ == "__main__":
    main()
