"""Sharding tests on the virtual 8-device CPU mesh: sharded fit ==
unsharded fit; batched multi-target fit == per-target fits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sucre_tpu.models import init_params
from sucre_tpu.parallel import (
    fit_many,
    fit_sharded,
    make_mesh,
    pad_obs_to_mesh,
    shard_obs,
    stack_obs,
    stack_params,
)
from sucre_tpu.solve import FitConfig, fit
from tests.test_solve import _synthetic_obs


def test_mesh_shapes():
    mesh = make_mesh(2, 4)
    assert mesh.shape == {"view": 2, "row": 4}
    with pytest.raises(ValueError):
        make_mesh(4, 4)


def test_pad_and_shard(rng):
    obs, _ = _synthetic_obs(rng, V=5, H=6, W=7)
    mesh = make_mesh(2, 4)
    padded = pad_obs_to_mesh(obs, mesh)
    assert padded.valid.shape == (6, 8, 7)  # V 5->6, H 6->8
    assert int(padded.valid.sum()) == int(obs.valid.sum())
    sharded = shard_obs(padded, mesh)
    assert sharded.cP.sharding.spec == jax.sharding.PartitionSpec("view", "row", None, None)


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_sharded_equals_unsharded(rng, closed_form):
    obs, J_true = _synthetic_obs(rng, V=8, H=8, W=7)
    image = None if closed_form else np.zeros((8, 7, 3), np.float32)
    params = init_params(image=image, use_closed_form=closed_form)
    cfg = FitConfig(num_iter=5, use_closed_form=closed_form)
    ref = fit(params, obs, cfg)
    mesh = make_mesh(2, 4)
    got = fit_sharded(params, obs, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got.params.B), np.asarray(ref.params.B), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.J), np.asarray(ref.J), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-4
    )
    assert got.J.shape == (8, 7, 3)


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_many_equals_individual(rng, closed_form):
    T = 3
    obs_list, params_list, refs = [], [], []
    cfg = FitConfig(num_iter=4, use_closed_form=closed_form)
    for t in range(T):
        obs, _ = _synthetic_obs(rng, V=4 + t, H=6, W=7)  # ragged V: exercises padding
        image = None if closed_form else np.full((6, 7, 3), 0.1 * t, np.float32)
        p = init_params(image=image, use_closed_form=closed_form)
        obs_list.append(obs)
        params_list.append(p)
        refs.append(fit(p, obs, cfg))
    params, J, observed, tel = fit_many(
        stack_params(params_list), stack_obs(obs_list), cfg
    )
    assert J.shape == (T, 6, 7, 3)
    assert tel.cost.shape == (4, T)
    for t in range(T):
        np.testing.assert_allclose(
            np.asarray(params.B[t]), np.asarray(refs[t].params.B), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(J[t]), np.asarray(refs[t].J), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(tel.cost[:, t]), np.asarray(refs[t].telemetry.cost), rtol=1e-4
        )


def test_stack_obs_mixed_color_dtypes(rng):
    """A batch mixing raw-u8 colors (fresh matching) with f32 [0,1]
    colors (h5 cache loads) must normalize to one convention — stacking
    as-is would promote u8 0-255 into the f32 [0,1] pipeline."""
    obs_u8, _ = _synthetic_obs(rng, V=3, H=6, W=7)
    obs_u8 = obs_u8._replace(
        I=(np.clip(np.asarray(obs_u8.I), 0, 1) * 255).astype(np.uint8)
    )
    obs_f32, _ = _synthetic_obs(rng, V=3, H=6, W=7)
    stacked = stack_obs([obs_u8, obs_f32])
    assert stacked.I.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(stacked.I[0]), np.asarray(obs_u8.I).astype(np.float32) / 255
    )
    np.testing.assert_allclose(np.asarray(stacked.I[1]), np.asarray(obs_f32.I))


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_many_view_chunk_equals_full(rng, closed_form):
    """The --batch-size grad-accum knob on the batched path: chunked
    view accumulation is the exact full-batch gradient."""
    T = 2
    cfg_full = FitConfig(num_iter=4, use_closed_form=closed_form)
    cfg_chunk = FitConfig(num_iter=4, use_closed_form=closed_form, view_chunk=2)
    obs_list = [_synthetic_obs(rng, V=5, H=6, W=7)[0] for _ in range(T)]
    image = None if closed_form else np.zeros((6, 7, 3), np.float32)
    params_list = [init_params(image=image, use_closed_form=closed_form) for _ in range(T)]
    pa, Ja, oa, ta = fit_many(stack_params(params_list), stack_obs(obs_list), cfg_full)
    pb, Jb, ob, tb = fit_many(stack_params(params_list), stack_obs(obs_list), cfg_chunk)
    np.testing.assert_allclose(np.asarray(pa.B), np.asarray(pb.B), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jb), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    np.testing.assert_allclose(np.asarray(ta.cost), np.asarray(tb.cost), rtol=1e-5)


def test_fit_many_sharded_batch(rng):
    T = 8
    cfg = FitConfig(num_iter=3, use_closed_form=True)
    obs_list = [_synthetic_obs(rng, V=4, H=6, W=7)[0] for _ in range(T)]
    params_list = [init_params(use_closed_form=True) for _ in range(T)]
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), axis_names=("batch",))
    params, J, observed, tel = fit_many(
        stack_params(params_list), stack_obs(obs_list), cfg, mesh=mesh
    )
    assert J.shape == (T, 6, 7, 3)
    # all targets actually optimized
    assert np.all(np.asarray(tel.cost[-1]) < np.asarray(tel.cost[0]))


def test_shard_targets():
    from sucre_tpu.parallel.multihost import shard_targets

    targets = [f"img_{i}" for i in range(10)]
    shards = [shard_targets(targets, process_id=p, num_processes=3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(targets)
    assert shards[0] == ["img_0", "img_3", "img_6", "img_9"]
    # single process = everything
    assert shard_targets(targets, process_id=0, num_processes=1) == targets


def _scene_view_stack(scene_dir, n_views, width, height,
                      camera_model="PINHOLE"):
    """Build a synthetic scene and its stacked device view arrays
    (v_depths, v_rgbs, v_intrs, v_Rs, v_ts) — shared by the
    sharded-matching tests."""
    from sucre_tpu.io.images import load_view_arrays
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(scene_dir, n_views=n_views, width=width, height=height,
                    camera_model=camera_model)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    views = scene.view_list()
    arrays = [load_view_arrays(v, raw=True) for v in views]
    stack = (
        jnp.asarray(np.stack([a[1] for a in arrays])),
        jnp.asarray(np.stack([a[0] for a in arrays])),
        jnp.asarray(np.stack([v.intrinsics for v in views]).astype(np.float32)),
        jnp.asarray(np.stack([v.R for v in views]).astype(np.float32)),
        jnp.asarray(np.stack([v.t for v in views]).astype(np.float32)),
    )
    return scene, stack


def test_match_survey_sharded_equals_unsharded(tmp_path):
    """Sharded survey matching (views over 'view', target rows over
    'row') must equal the single-device program, and its output must
    feed fit_sharded directly (end-to-end multi-chip pipeline)."""
    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import match_survey_sharded

    # height 50 is NOT divisible by the 4 row shards: exercises target-row
    # padding, including the min-cover area correction (true H*W, not padded)
    scene, (v_depths, v_rgbs, v_intrs, v_Rs, v_ts) = _scene_view_stack(
        tmp_path, n_views=5, width=64, height=50
    )
    tidx = [1, 2]
    t_depths = v_depths[jnp.asarray(tidx)]
    t_intrs, t_Rs, t_ts = v_intrs[jnp.asarray(tidx)], v_Rs[jnp.asarray(tidx)], v_ts[jnp.asarray(tidx)]

    ref = match_survey(
        t_depths, t_intrs, t_Rs, t_ts,
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        jnp.float32(1e-6), compact=True,
    )
    mesh = make_mesh(2, 4)
    out = match_survey_sharded(
        mesh, t_depths, t_intrs, t_Rs, t_ts,
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
    )
    V, H = v_depths.shape[0], t_depths.shape[1]
    assert out.valid.shape[1] % 2 == 0 and out.valid.shape[2] % 4 == 0
    np.testing.assert_array_equal(np.asarray(out.valid[:, :V, :H]), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(out.z[:, :V, :H]), np.asarray(ref.z), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.I[:, :V, :H]), np.asarray(ref.I))
    assert int(np.asarray(out.valid[:, V:]).sum()) == 0  # padded views empty

    # Compose with the sharded fit: one target's (view, row)-sharded
    # stack goes straight into fit_sharded.
    obs_t = jax.tree.map(lambda x: x[0], out)
    img = jnp.zeros((obs_t.valid.shape[1], obs_t.valid.shape[2], 3), jnp.float32)
    res = fit_sharded(init_params(image=img), obs_t, FitConfig(num_iter=2), mesh)
    assert np.isfinite(float(res.telemetry.cost[-1]))


def test_match_survey_sharded_distorted_equals_unsharded(tmp_path):
    """Distorted-camera survey matching under the (view x row) mesh: the
    distortion vectors shard alongside the intrinsics and the sharded
    program equals the single-device one."""
    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import match_survey_sharded
    from sucre_tpu.scene import Scene

    scene, (v_depths, v_rgbs, v_intrs, v_Rs, v_ts) = _scene_view_stack(
        tmp_path, n_views=5, width=64, height=50, camera_model="OPENCV"
    )
    views = scene.view_list()
    v_dists = jnp.asarray(np.stack([v.dist for v in views]).astype(np.float32))
    tidx = jnp.asarray([1, 2])
    t_depths = v_depths[tidx]
    t_intrs, t_Rs, t_ts = v_intrs[tidx], v_Rs[tidx], v_ts[tidx]
    t_dists = v_dists[tidx]

    ref = match_survey(
        t_depths, t_intrs, t_Rs, t_ts,
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        jnp.float32(1e-6), compact=True,
        t_dists=t_dists, v_dists=v_dists, dist_model="rational",
    )
    assert int(np.asarray(ref.valid).sum()) > 0
    mesh = make_mesh(2, 4)
    out = match_survey_sharded(
        mesh, t_depths, t_intrs, t_Rs, t_ts,
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        t_dists=t_dists, v_dists=v_dists, dist_model="rational",
    )
    V, H = v_depths.shape[0], t_depths.shape[1]
    np.testing.assert_array_equal(
        np.asarray(out.valid[:, :V, :H]), np.asarray(ref.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out.z[:, :V, :H]), np.asarray(ref.z), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out.I[:, :V, :H]), np.asarray(ref.I)
    )


def test_fit_sharded_pallas_equals_fit(rng):
    """The shard_map'd Pallas fit (per-shard kernel + psum'd gradients)
    must match the plain single-device fit."""
    from sucre_tpu.parallel.mesh import fit_sharded_pallas

    obs, image = _synthetic_obs(rng, V=4, H=8, W=16)
    obs = obs.compact()
    params = init_params(image=image)
    cfg = FitConfig(num_iter=5)
    ref = fit(params, obs, cfg)
    mesh = make_mesh(2, 4)
    out = fit_sharded_pallas(params, obs, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out.params.B), np.asarray(ref.params.B), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.beta), np.asarray(ref.params.beta), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.gamma), np.asarray(ref.params.gamma), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.J), np.asarray(ref.J), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-5)


def test_restore_survey_with_batch_mesh(tmp_path):
    """restore_survey with a ('batch',) mesh shards each batch's fit one
    image per device and must equal the meshless run."""
    from sucre_tpu.pipeline import RestoreConfig, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path, n_views=8, width=48, height=32)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = sd.names
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory", export_dtype="f32")
    bmesh = jax.sharding.Mesh(np.asarray(jax.devices()), axis_names=("batch",))
    a = restore_survey(scene, names, tmp_path / "m", cfg, batch_targets=8, mesh=bmesh)
    b = restore_survey(scene, names, tmp_path / "n", cfg, batch_targets=8)
    assert len(a) == 8
    for ra, rb in zip(a, b):
        assert ra.n_obs == rb.n_obs
        np.testing.assert_allclose(np.asarray(ra.params.B), np.asarray(rb.params.B), atol=1e-5)
        np.testing.assert_allclose(np.nan_to_num(ra.J), np.nan_to_num(rb.J), atol=1e-4)


def test_match_survey_sharded_bilinear(tmp_path):
    """--bilinear-colors composes with the sharded survey matching: the
    four-neighbor color gathers stay chip-local and equal the
    single-device bilinear program."""
    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import match_survey_sharded

    _, (v_depths, v_rgbs, v_intrs, v_Rs, v_ts) = _scene_view_stack(
        tmp_path, n_views=4, width=64, height=48
    )
    tidx = jnp.asarray([1, 2])
    ref = match_survey(
        v_depths[tidx], v_intrs[tidx], v_Rs[tidx], v_ts[tidx],
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        jnp.float32(1e-6), compact=True, bilinear=True,
    )
    mesh = make_mesh(2, 4)
    out = match_survey_sharded(
        mesh, v_depths[tidx], v_intrs[tidx], v_Rs[tidx], v_ts[tidx],
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts, bilinear=True,
    )
    V, H = 4, 48
    assert out.I.dtype == jnp.float32  # bilinear colors are interpolated
    np.testing.assert_array_equal(np.asarray(out.valid[:, :V, :H]), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(out.I[:, :V, :H]), np.asarray(ref.I), atol=1e-6)


def test_fit_joint_mesh_equals_unsharded(rng):
    """fit_joint over a ('batch',) mesh (targets sharded, shared globals
    replicated + psum'd) equals the single-device joint fit."""
    from sucre_tpu.parallel.joint import JointParams, fit_joint

    T = 8
    obs_list = [_synthetic_obs(rng, V=4, H=6, W=7)[0] for _ in range(T)]
    so = stack_obs(obs_list)
    jp = JointParams(
        B=jnp.full((3,), 0.1), beta=jnp.full((3,), 0.1), gamma=jnp.full((3,), 0.1),
        J=jnp.zeros((T, 6, 7, 3), jnp.float32),
    )
    cfg = FitConfig(num_iter=4)
    p_ref, J_ref, o_ref, t_ref = fit_joint(jp, so, cfg)
    bmesh = jax.sharding.Mesh(np.asarray(jax.devices()), axis_names=("batch",))
    p_m, J_m, o_m, t_m = fit_joint(jp, so, cfg, mesh=bmesh)
    np.testing.assert_allclose(np.asarray(p_m.B), np.asarray(p_ref.B), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m.beta), np.asarray(p_ref.beta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(J_m), np.asarray(J_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_m.cost), np.asarray(t_ref.cost), rtol=1e-4)


@pytest.mark.parametrize("closed_form", [False, True])
def test_fit_joint_view_chunk_equals_full(rng, closed_form):
    """The --batch-size grad-accum knob on the joint fit."""
    from sucre_tpu.parallel.joint import JointParams, fit_joint

    T = 2
    obs_list = [_synthetic_obs(rng, V=5, H=6, W=7)[0] for _ in range(T)]
    so = stack_obs(obs_list)
    jp = JointParams(
        B=jnp.full((3,), 0.1), beta=jnp.full((3,), 0.1), gamma=jnp.full((3,), 0.1),
        J=None if closed_form else jnp.zeros((T, 6, 7, 3), jnp.float32),
    )
    pa, Ja, oa, ta = fit_joint(jp, so, FitConfig(num_iter=4, use_closed_form=closed_form))
    pb, Jb, ob, tb = fit_joint(
        jp, so, FitConfig(num_iter=4, use_closed_form=closed_form, view_chunk=2)
    )
    np.testing.assert_allclose(np.asarray(pa.B), np.asarray(pb.B), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ta.cost), np.asarray(tb.cost), rtol=1e-5)


def test_match_survey_sharded_100_views_bounded_blocks(tmp_path):
    """The views-axis HBM scaling story (SURVEY §5): a 100+ view survey
    matches as ONE sharded program on the 8-device mesh — view tables
    V/vs per chip, observation stack sharded over (view, row) — with
    results identical to the single-device program."""
    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import match_survey_sharded

    V = 104
    _, (v_depths, v_rgbs, v_intrs, v_Rs, v_ts) = _scene_view_stack(
        tmp_path, n_views=V, width=48, height=32
    )
    tidx = jnp.asarray([10, 60])
    ref = match_survey(
        v_depths[tidx], v_intrs[tidx], v_Rs[tidx], v_ts[tidx],
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
        jnp.float32(1e-6), compact=True,
    )
    mesh = make_mesh(2, 4)
    out = match_survey_sharded(
        mesh, v_depths[tidx], v_intrs[tidx], v_Rs[tidx], v_ts[tidx],
        v_depths, v_rgbs, v_intrs, v_Rs, v_ts,
    )
    np.testing.assert_array_equal(
        np.asarray(out.valid[:, :V, :32]), np.asarray(ref.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out.z[:, :V, :32]), np.asarray(ref.z), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out.I[:, :V, :32]), np.asarray(ref.I))
    # per-chip block memory is bounded: each device holds a (V/2, H/4)
    # slice of the stack, not the whole thing
    shard_shapes = {s.data.shape for s in out.valid.addressable_shards}
    T, Vp, Hp, W = out.valid.shape
    assert shard_shapes == {(T, Vp // 2, Hp // 4, W)}


def test_match_survey_sharded_is_communication_free():
    """HLO-level proof of the locality claim (SURVEY §5 scaling story):
    the compiled sharded matching program moves NO view tables and NO
    observation blocks between chips — each (view, row) chip matches its
    resident view slice against its resident target rows. The only
    collective GSPMD may insert is the tiny per-pair min-cover count
    psum (a (T, V)-shaped all-reduce)."""
    import functools
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from sucre_tpu.ops.matching import match_survey

    mesh = make_mesh(2, 4)
    V, T, H, W = 8, 2, 64, 128
    rng = np.random.default_rng(0)
    depths = (
        rng.uniform(1500, 2500, (V, H, W)) * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    intrs = np.tile(np.array([40.0, 40.0, W / 2, H / 2], np.float32), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack([np.array([0.05 * k, 0, 0], np.float32) for k in range(V)])

    va = lambda x: NamedSharding(mesh, P("view", *([None] * (x.ndim - 1))))
    ra = lambda x: NamedSharding(mesh, P(None, "row", *([None] * (x.ndim - 2))))
    repl = NamedSharding(mesh, P())
    v_args = [
        jax.device_put(jnp.asarray(x), va(x)) for x in (depths, rgbs, intrs, Rs, ts)
    ]
    td = jax.device_put(jnp.asarray(depths[:T]), ra(depths[:T]))
    t_args = [
        jax.device_put(jnp.asarray(x), repl) for x in (intrs[:T], Rs[:T], ts[:T])
    ]
    f = jax.jit(
        functools.partial(
            match_survey, compact=True, bilinear=False, area=jnp.float32(H * W)
        )
    )
    hlo = f.lower(td, *t_args, *v_args, jnp.float32(1e-6)).compile().as_text()

    for op in ("all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        assert f" {op}(" not in hlo, f"unexpected {op} in sharded matching HLO"
    # every all-reduce is the tiny count psum, never a table/stack-sized one
    shapes = re.findall(r"=\s*\w+\[([\d,]*)\][^ ]*\s+all-reduce\(", hlo)
    assert shapes, "expected the min-cover count all-reduce"
    for s in shapes:
        n = np.prod([int(d) for d in s.split(",")]) if s else 1
        assert n <= T * V, f"all-reduce of {n} elements — data is moving: [{s}]"


def test_restore_survey_view_row_mesh_oversized(tmp_path, monkeypatch):
    """Pipeline wiring of the views-axis scaling: a survey pushed past
    SUCRE_SURVEY_MAX_PAIRS with a (view x row) mesh runs the SHARDED
    survey program (budget scales by mesh size) and reproduces the
    unsharded restore."""
    from sucre_tpu.pipeline import RestoreConfig, restore_survey
    from sucre_tpu.scene import Scene
    from tests.synthetic import make_scene

    sd = make_scene(tmp_path / "s", n_views=6, width=48, height=32)
    scene = Scene.from_colmap(sd.model_dir, sd.image_dir, sd.depth_dir)
    names = sd.names[:2]
    cfg = RestoreConfig(num_iter=3, verbose=False, store="memory")
    ref = restore_survey(scene, names, tmp_path / "plain", cfg, batch_targets=2)

    # cap below this survey's 2 * 8 * 48 * 32 pairs, but within 8x of it:
    # single-chip budget fails, the 8-chip sharded budget passes
    monkeypatch.setenv("SUCRE_SURVEY_MAX_PAIRS", str(2 * 8 * 48 * 32 - 1))
    mesh = make_mesh(2, 4)
    got = restore_survey(
        scene, names, tmp_path / "sharded", cfg, batch_targets=2, mesh=mesh
    )
    for r, g in zip(ref, got):
        assert r.n_obs == g.n_obs
        np.testing.assert_allclose(
            np.asarray(g.params.B), np.asarray(r.params.B), atol=1e-5
        )
        np.testing.assert_allclose(
            np.nan_to_num(g.J), np.nan_to_num(r.J), atol=1e-4
        )


def test_fit_sharded_snapshot_unpadded(rng):
    """Mid-fit snapshot callbacks under a row-padding mesh must see the
    caller's UNPADDED row count (the padding is an internal layout)."""
    obs, _ = _synthetic_obs(rng, V=4, H=6, W=7)  # H=6 pads to 8 on 4 row shards
    params = init_params(image=np.zeros((6, 7, 3), np.float32))
    seen = []

    def snapshot_fn(iteration, p, J_snap, observed_snap):
        seen.append((iteration, J_snap.shape, observed_snap.shape, p.J.shape))

    fit_sharded(
        params, obs, FitConfig(num_iter=4, save_interval=2),
        make_mesh(2, 4), snapshot_fn=snapshot_fn,
    )
    assert [s[0] for s in seen] == [0, 2]
    for _, J_shape, o_shape, pJ_shape in seen:
        assert J_shape == (6, 7, 3)
        assert o_shape == (6, 7)
        assert pJ_shape == (6, 7, 3)


def test_fit_many_light_kernel_equals_xla(rng):
    """The batched light-model fit through the fused kernel (interpret
    mode off-TPU) must match the XLA autodiff path."""
    T, V, H, W = 2, 3, 8, 16
    obs_list = []
    for t in range(T):
        r = np.random.default_rng(t)
        valid = r.uniform(size=(V, H, W)) < 0.8
        dirs = r.normal(size=(V, H, W, 3)) * 0.1 + np.array([0, 0, 1.0])
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        cP = np.where(
            valid[..., None],
            (dirs * r.uniform(1.5, 4.0, size=(V, H, W, 1))).astype(np.float32),
            0.0,
        ).astype(np.float32)
        I = r.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
        from sucre_tpu.ops.matching import DenseObs

        obs_list.append(
            DenseObs(valid=jnp.asarray(valid), cP=jnp.asarray(cP), I=jnp.asarray(I))
        )
    so = stack_obs(obs_list)
    img = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
    sp = stack_params(
        [init_params(image=img, light_model=True) for _ in range(T)]
    )
    import dataclasses

    cfg = FitConfig(num_iter=4)
    pa, Ja, oa, ta = fit_many(sp, so, dataclasses.replace(cfg, use_pallas=True))
    # kernel-vs-kernel: the batched run must track per-target single fits
    # through the same fused kernel step for step
    for t in range(2):
        ref = fit(
            jax.tree.map(lambda x: x[t], sp),
            jax.tree.map(lambda x: x[t], so),
            dataclasses.replace(cfg, use_pallas=True),
        )
        np.testing.assert_allclose(
            np.asarray(Ja[t]), np.asarray(ref.J), atol=1e-5
        )
        # pose axes with ~1e-11 gradients are eps-dominated in Adam
        # (update ~ lr*g/eps): any last-bit difference drifts ~1e-4/step
        np.testing.assert_allclose(
            np.asarray(pa.cam2light[t]), np.asarray(ref.params.cam2light),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(pa.sigma[t]), np.asarray(ref.params.sigma), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(ta.cost[:, t]), np.asarray(ref.telemetry.cost), rtol=1e-5
        )
    # vs XLA autodiff: same costs (parameter trajectories can drift in
    # Adam's eps-dominated near-zero-gradient directions — float noise
    # amplified to ~1e-4 steps — so compare the physical quantities)
    pb, Jb, ob, tb = fit_many(sp, so, dataclasses.replace(cfg, use_pallas=False))
    np.testing.assert_allclose(np.asarray(ta.cost), np.asarray(tb.cost), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pa.B), np.asarray(pb.B), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jb), atol=1e-3)


def test_fit_sharded_pallas_light_equals_fit(rng):
    """The shard_map'd LIGHT-model kernel fit (raw R/t/Sigma partial
    sums psum'd, chains closed outside the mesh) must match the
    single-device light-kernel fit."""
    from sucre_tpu.parallel.mesh import fit_sharded_pallas

    V, H, W = 4, 8, 16
    valid = rng.uniform(size=(V, H, W)) < 0.8
    dirs = rng.normal(size=(V, H, W, 3)) * 0.1 + np.array([0, 0, 1.0])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cP = np.where(
        valid[..., None],
        (dirs * rng.uniform(1.5, 4.0, size=(V, H, W, 1))).astype(np.float32),
        0.0,
    ).astype(np.float32)
    I = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    from sucre_tpu.ops.matching import DenseObs

    obs = DenseObs(valid=jnp.asarray(valid), cP=jnp.asarray(cP), I=jnp.asarray(I))
    img = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
    params = init_params(image=img, light_model=True)
    import dataclasses

    cfg = FitConfig(num_iter=4, use_pallas=True)
    ref = fit(params, obs, cfg)
    mesh = make_mesh(2, 4)
    out = fit_sharded_pallas(params, obs, cfg, mesh)
    np.testing.assert_allclose(
        np.asarray(out.params.B), np.asarray(ref.params.B), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out.J), np.asarray(ref.J), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.params.cam2light), np.asarray(ref.params.cam2light),
        atol=2e-3,  # eps-dominated pose axes drift (see light fit_many test)
    )
    np.testing.assert_allclose(
        np.asarray(out.params.sigma), np.asarray(ref.params.sigma), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-5
    )
    # the whole-path router reaches the light kernel too
    res = fit_sharded(params, obs, dataclasses.replace(cfg, use_pallas=True), mesh)
    np.testing.assert_allclose(
        np.asarray(res.telemetry.cost), np.asarray(ref.telemetry.cost), rtol=1e-5
    )


@pytest.mark.parametrize("light", [False, True])
def test_fit_many_sharded_pallas_equals_unsharded(rng, light):
    """The batched (view x row)-sharded kernel fit — the oversized-survey
    route at fused-kernel speed — must match the meshless batched fit,
    in both the no-light and light-model variants."""
    from sucre_tpu.ops.matching import DenseObs

    T, V, H, W = 2, 4, 8, 16
    obs_list = []
    for t in range(T):
        r = np.random.default_rng(t)
        valid = r.uniform(size=(V, H, W)) < 0.8
        dirs = r.normal(size=(V, H, W, 3)) * 0.1 + np.array([0, 0, 1.0])
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        cP = np.where(
            valid[..., None],
            (dirs * r.uniform(1.5, 4.0, size=(V, H, W, 1))).astype(np.float32),
            0.0,
        ).astype(np.float32)
        I = r.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
        obs = DenseObs(valid=jnp.asarray(valid), cP=jnp.asarray(cP), I=jnp.asarray(I))
        obs_list.append(obs if light else obs.compact())
    so = stack_obs(obs_list)
    img = rng.uniform(0, 1, size=(H, W, 3)).astype(np.float32)
    sp = stack_params([init_params(image=img, light_model=light) for _ in range(T)])
    cfg = FitConfig(num_iter=4, use_pallas=True)
    mesh = make_mesh(2, 4)
    pa, Ja, oa, ta = fit_many(sp, so, cfg, mesh=mesh)  # kernel, sharded
    pb, Jb, ob, tb = fit_many(sp, so, cfg)  # kernel, meshless
    np.testing.assert_allclose(np.asarray(ta.cost), np.asarray(tb.cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pa.B), np.asarray(pb.B), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jb), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    if light:
        # eps-dominated pose axes drift; physical quantities above are tight
        np.testing.assert_allclose(
            np.asarray(pa.cam2light), np.asarray(pb.cam2light), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pa.sigma), np.asarray(pb.sigma), atol=2e-3
        )


def _collective_inventory(hlo: str):
    """Every collective in a compiled HLO as (op, n_elements, group_size).

    group_size == 1 means singleton replica groups — the op moves NOTHING
    between devices (GSPMD keeps a trivial psum as a no-op all-reduce).
    Handles both replica-group syntaxes ({{0,4},{1,5}} and the iota form
    [groups,size]<=[...]).
    """
    import re

    out = []
    for m in re.finditer(
        r"= \S*?\[([\d,]*)\][^\n]*?\b(all-reduce|all-gather|all-to-all|"
        r"collective-permute|reduce-scatter)(?:-start)?\([^\n]*",
        hlo,
    ):
        line, shape = m.group(0), m.group(1)
        n = int(np.prod([int(d) for d in shape.split(",")])) if shape else 1
        gsz = 0
        g = re.search(r"replica_groups=\{\{(.*?)\}\}", line)
        if g:
            gsz = max(len(grp.split(",")) for grp in g.group(1).split("},{"))
        else:
            g = re.search(r"replica_groups=\[\d+,(\d+)\]<=", line)
            if g:
                gsz = int(g.group(1))
        out.append((m.group(2), n, gsz))
    return out


@pytest.mark.parametrize("light", [False, True])
@pytest.mark.parametrize("vs,rs", [(1, 8), (2, 4)])
def test_fit_sharded_kernel_collective_inventory(rng, vs, rs, light):
    """HLO-level communication model of the sharded fused-kernel fit
    (the matching counterpart is test_match_survey_sharded_is_
    communication_free): the compiled 200-iteration program contains NO
    all-gather / all-to-all / collective-permute / reduce-scatter, and
    its only per-iteration all-reduces are

      - O(T) scalars (cost + global-parameter gradients) over the whole
        mesh, and
      - the dJ view-axis psum of ONE local J row-block
        (T x Hp/rs x Wp x 3), which on the default 1xN mesh compiles to
        singleton replica groups — zero bytes moved.

    This is the strongest multi-chip scaling evidence available without
    multi-chip hardware: the program structure itself. The numbers are
    documented in BASELINE.md ("Sharded-fit communication model").
    """
    from sucre_tpu.parallel.mesh import (
        _run_sharded_kernel,
        prepare_sharded_kernel_inputs,
    )

    mesh = make_mesh(vs, rs)
    T, V, H, W = 2, 4, 16, 16
    obs_list = []
    for t in range(T):
        obs, _ = _synthetic_obs(np.random.default_rng(t), V=V, H=H, W=W)
        obs_list.append(obs if light else obs.compact())
    so = stack_obs(obs_list)
    img = np.zeros((H, W, 3), np.float32)
    sp = stack_params([init_params(image=img, light_model=light) for _ in range(T)])
    p, X, It, occ, n_obs = prepare_sharded_kernel_inputs(sp, so, mesh, light)
    hlo = (
        _run_sharded_kernel.lower(
            p, X, It, occ, n_obs, mesh=mesh, light=light, lr=0.05,
            num_iter=200, interpret=True,
        )
        .compile()
        .as_text()
    )

    inv = _collective_inventory(hlo)
    assert inv, "expected at least the scalar gradient psum"
    T_, Hp, Wp, _ = p.J.shape
    dj_elems = T_ * (Hp // rs) * Wp * 3
    # light partials: _NPART(32) scalars per target; no-light: cost+3x(T,3)
    small = T_ * 40
    for op, n, gsz in inv:
        assert op == "all-reduce", f"data-moving collective {op} in fit HLO"
        if gsz <= 1:
            continue  # singleton groups: moves nothing
        assert n <= small or (n == dj_elems and gsz == vs), (
            f"unexpected all-reduce of {n} elements over groups of {gsz}"
        )
    if vs == 1:
        # the dJ psum over the 1-member 'view' axis must compile away
        assert not any(n == dj_elems and gsz > 1 for _, n, gsz in inv)
    else:
        assert any(n == dj_elems and gsz == vs for _, n, gsz in inv), (
            "expected the dJ view-axis all-reduce on a multi-view-shard mesh"
        )


@pytest.mark.parametrize("closed_form", [False, True])
@pytest.mark.parametrize("vs,rs", [(1, 8), (2, 4)])
def test_fit_gspmd_collective_inventory(rng, vs, rs, closed_form):
    """Same HLO communication inventory for the GSPMD autodiff fallback
    (fit_sharded without the fused kernel: light/closed-form/chunked
    routes). Direct mode is collective-lean on EVERY mesh: the only
    all-reduces are the (3,)-shaped global-parameter gradient psums —
    GSPMD row-shards the J update automatically. Closed-form mode adds
    the inherent per-iteration view-axis reduction of the local J
    row-block (the closed-form J numerator/denominator sums over views).
    """
    import optax

    from sucre_tpu.parallel.mesh import pad_obs_to_mesh, replicate, shard_obs
    from sucre_tpu.solve import _run_segment

    mesh = make_mesh(vs, rs)
    V, H, W = 8, 16, 16
    obs, _ = _synthetic_obs(rng, V=V, H=H, W=W)
    obs = obs.compact()
    image = None if closed_form else np.zeros((H, W, 3), np.float32)
    params = init_params(image=image, use_closed_form=closed_form)
    obs_s = shard_obs(pad_obs_to_mesh(obs, mesh), mesh)
    params = replicate(params, mesh)
    opt_state = replicate(optax.adam(0.05).init(params), mesh)
    n_obs = jnp.float32(float(np.asarray(obs.valid).sum()))
    hlo = (
        _run_segment.lower(
            params, opt_state, obs_s, n_obs, n_steps=200,
            use_closed_form=closed_form, chunked=False, lr=0.05,
            pallas_mode="off", light=False,
        )
        .compile()
        .as_text()
    )

    inv = _collective_inventory(hlo)
    assert inv
    jblock_elems = (H // rs) * W * 3  # the row-local J block
    for op, n, gsz in inv:
        assert op == "all-reduce", f"data-moving collective {op} in fit HLO"
        if gsz <= 1:
            continue
        ok_scalar = n <= 4
        ok_closed = closed_form and n == jblock_elems and gsz == vs
        assert ok_scalar or ok_closed, (
            f"unexpected all-reduce of {n} elements over groups of {gsz}"
        )


def test_make_mesh_oversubscribed_view_shards_raises():
    """n_view_shards > device count used to floor n_row_shards to 0 and
    build an EMPTY mesh that failed much later with a cryptic error."""
    n = len(jax.devices())
    with pytest.raises(ValueError, match="empty"):
        make_mesh(n * 2)
    with pytest.raises(ValueError, match="empty"):
        make_mesh(0)


def test_fit_sharded_explicit_none_callbacks_keep_kernel_route(rng):
    """Passing snapshot_fn=None / telemetry_fn=None explicitly must not
    disqualify the fused-kernel route (presence-of-kwarg is not a
    request for callbacks)."""
    import dataclasses

    obs, image = _synthetic_obs(rng, V=4, H=8, W=16)
    obs = obs.compact()
    params = init_params(image=image)
    mesh = make_mesh(2, 4)
    cfg = FitConfig(num_iter=3, use_pallas=True)
    # use_pallas=True raises if the kernel route is disqualified
    res = fit_sharded(
        params, obs, cfg, mesh, snapshot_fn=None, telemetry_fn=None
    )
    ref = fit(params, obs, dataclasses.replace(cfg, use_pallas=None))
    np.testing.assert_allclose(
        np.asarray(res.params.B), np.asarray(ref.params.B), atol=1e-5
    )


def test_fit_sharded_checkpoint_dir_disqualifies_kernel_route(rng, tmp_path):
    """checkpoint_dir means 'resume if a checkpoint exists'; the fused
    kernel route cannot, so forcing it must refuse rather than silently
    restart from iteration 0."""
    obs, image = _synthetic_obs(rng, V=4, H=8, W=16)
    obs = obs.compact()
    params = init_params(image=image)
    mesh = make_mesh(2, 4)
    cfg = FitConfig(num_iter=3, use_pallas=True, checkpoint_dir=tmp_path)
    with pytest.raises(ValueError, match="use_pallas"):
        fit_sharded(params, obs, cfg, mesh)


def test_init_joint_params_validates_batch_size():
    from sucre_tpu.parallel.joint import init_joint_params

    imgs = [np.zeros((4, 6, 3), np.float32)] * 2
    with pytest.raises(ValueError, match="T=3"):
        init_joint_params(images=imgs, T=3)
    init_joint_params(images=imgs, T=2)  # consistent sizes pass
