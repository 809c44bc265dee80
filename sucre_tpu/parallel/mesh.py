"""Mesh construction + observation-stack sharding.

The workload's parallel axes (SURVEY.md §2.3):

  - ``view``  — data parallelism over the observation stack's view axis:
    each device holds a slice of views; gradient reductions for the
    global params (B/beta/gamma/light) and the closed-form J
    numerator/denominator become psums that GSPMD inserts automatically.
  - ``row``   — spatial parallelism over pixel rows: J, the stack and
    all per-pixel state shard by rows with *zero* communication in the
    fit (every reduction over views is row-local); this is the
    TP/SP analog for this workload.
  - target batching (``fit_many`` / the CLI --image-list path) is the
    outer data parallelism: different chips restore different images.

Everything is expressed as NamedSharding annotations on jit inputs —
XLA GSPMD partitions the fit loop and inserts ICI collectives; the
solver code itself is mesh-agnostic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sucre_tpu.ops.matching import DenseObs


def make_mesh(
    n_view_shards: int = 1,
    n_row_shards: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a ('view', 'row') mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    if n_view_shards < 1:
        raise ValueError(
            f"mesh would be empty: n_view_shards must be >= 1, "
            f"got {n_view_shards}"
        )
    if n_row_shards is None:
        n_row_shards = len(devices) // n_view_shards
    n = n_view_shards * n_row_shards
    if n_row_shards < 1:
        raise ValueError(
            f"mesh {n_view_shards}x{n_row_shards} is empty: n_row_shards "
            f"must be >= 1 (explicitly, or {len(devices)} devices // "
            f"n_view_shards must be)"
        )
    if n > len(devices):
        raise ValueError(
            f"mesh {n_view_shards}x{n_row_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(n_view_shards, n_row_shards)
    return Mesh(dev, axis_names=("view", "row"))


def pad_obs_to_mesh(obs: DenseObs, mesh: Mesh) -> DenseObs:
    """Pad the view axis and the row axis to multiples of their mesh axis
    sizes (padding is invalid/zero => contributes nothing to the fit).

    Note: row padding changes J's padded height; ``fit_sharded`` crops
    the result back.
    """
    vs = mesh.shape["view"]
    rs = mesh.shape["row"]
    V, H, W = obs.valid.shape
    pad_v = (-V) % vs
    pad_h = (-H) % rs
    if pad_v == 0 and pad_h == 0:
        return obs
    return jax.tree.map(
        lambda x: jnp.pad(
            x, [(0, pad_v), (0, pad_h)] + [(0, 0)] * (x.ndim - 2)
        ),
        obs,
    )


def shard_obs(obs: DenseObs, mesh: Mesh) -> DenseObs:
    """Place the stack with (view, row) sharding on the mesh."""

    def put(x):
        spec = P("view", "row", *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, obs)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def fit_sharded(params, obs: DenseObs, cfg, mesh: Mesh, **kwargs):
    """Run the solver with the stack sharded over the mesh.

    J stays replicated (its per-view gradient reduction becomes a psum
    over the 'view' axis); the stack shards over (view, row). Rows are
    padded as needed and the restored image is cropped back.

    On TPU (or with ``cfg.use_pallas=True``), eligible fits route to
    ``fit_sharded_pallas`` — the per-shard fused kernel — when no
    telemetry/snapshot callbacks are requested.
    """
    from sucre_tpu.solve import fit

    forced = getattr(cfg, "use_pallas", None) is True
    want_pallas = forced or (
        getattr(cfg, "use_pallas", None) is None and jax.default_backend() == "tpu"
    )
    routable = (
        all(v is None for v in kwargs.values())  # presence of an
        # explicit telemetry_fn=None/snapshot_fn=None must not disable
        # the fused route
        and _pallas_sharded_eligible(params, obs, cfg)
        and cfg.view_chunk is None  # the memory knob bounds per-step
        # activations; the kernel route materializes the full stack
        and cfg.save_interval is None
        and cfg.checkpoint_interval is None
        and cfg.checkpoint_dir is None  # solve.fit resumes from it;
        # the kernel route would silently restart at iteration 0
    )
    if want_pallas and routable:
        return fit_sharded_pallas(params, obs, cfg, mesh)
    if forced:
        # the XLA fallback below would hit solve.fit's own use_pallas
        # eligibility raise (multi-device stack) with a confusing message
        raise ValueError(
            "use_pallas=True on a sharded fit requires: direct mode, "
            "compact z layout (full cP with the light model), no "
            "view_chunk, no snapshot/checkpoint settings (interval, "
            "dir, or callbacks); use use_pallas=None for auto-selection"
        )

    H = obs.valid.shape[1]
    obs = shard_obs(pad_obs_to_mesh(obs, mesh), mesh)
    Hp = obs.valid.shape[1]
    if params.J is not None and Hp != H:
        params = params._replace(J=jnp.pad(params.J, [(0, Hp - H), (0, 0), (0, 0)]))
    if Hp != H and kwargs.get("snapshot_fn") is not None:
        # snapshot callbacks see the caller's unpadded row count (the
        # final result is cropped below; mid-fit snapshots must match)
        inner = kwargs["snapshot_fn"]

        def _cropped_snapshot(iteration, p, J_snap, observed_snap):
            inner(
                iteration,
                p._replace(J=None if p.J is None else p.J[:H]),
                J_snap[:H],
                observed_snap[:H],
            )

        kwargs = {**kwargs, "snapshot_fn": _cropped_snapshot}
    params = replicate(params, mesh)
    result = fit(params, obs, cfg, **kwargs)
    if result.J.shape[0] != H:
        result = result._replace(
            J=result.J[:H],
            observed=result.observed[:H],
            params=result.params._replace(
                J=None if result.params.J is None else result.params.J[:H]
            ),
        )
    return result


def match_survey_sharded(
    mesh: Mesh,
    t_depths,  # (T, H, W) target depths (f32 m or u16 mm)
    t_intrs,  # (T, 4)
    t_Rs,  # (T, 3, 3)
    t_ts,  # (T, 3)
    v_depths,  # (V, H2, W2) view stack (f32 m or u16 mm)
    v_rgbs,  # (V, H2, W2, 3)
    v_intrs,  # (V, 4)
    v_Rs,  # (V, 3, 3)
    v_ts,  # (V, 3)
    min_cover=0.000001,
    compact: bool = True,
    bilinear: bool = False,
    t_dists=None,  # (T, 8) canonical distortion vectors (ops/distortion.py)
    v_dists=None,  # (V, 8)
    # static tag, or a per-camera (target_tag, view_tag) tuple for mixed
    # rigs (see ops.matching._split_tags)
    dist_model: str | tuple[str, str] = "none",
) -> DenseObs:
    """The survey matching stage partitioned over the mesh: view stacks
    shard over the 'view' axis (each chip matches ITS views — every
    random gather stays chip-local; ``bilinear`` color sampling gathers
    the four neighbors from the same chip-local view block) and the
    target pixel grid shards over the 'row' axis. The output observation stack comes back sharded
    (view, row) on its (V, H) axes — exactly the layout ``fit_sharded``
    consumes, so matching + fit run multi-chip end to end with the
    observations never leaving their chip. The only collective GSPMD
    inserts is the tiny per-pair min-cover count psum over 'row'.

    View/row counts are padded to mesh-axis multiples (padded views have
    zero depth => no matches; padded target rows have zero depth => no
    valid pixels).
    """
    from sucre_tpu.ops.matching import match_survey

    vs = mesh.shape["view"]
    rs = mesh.shape["row"]
    V = v_depths.shape[0]
    H = t_depths.shape[1]
    pad_v = (-V) % vs
    pad_h = (-H) % rs

    def padv(x):
        return jnp.pad(x, [(0, pad_v)] + [(0, 0)] * (x.ndim - 1)) if pad_v else x

    def padh(x):
        return (
            jnp.pad(x, [(0, 0), (0, pad_h)] + [(0, 0)] * (x.ndim - 2))
            if pad_h
            else x
        )

    view_axis = lambda x: NamedSharding(mesh, P("view", *([None] * (x.ndim - 1))))
    row_axis = lambda x: NamedSharding(mesh, P(None, "row", *([None] * (x.ndim - 2))))
    repl = NamedSharding(mesh, P())

    v_arrays = [
        jax.device_put(padv(x), view_axis(x))
        for x in (v_depths, v_rgbs, v_intrs, v_Rs, v_ts)
    ]
    t_depths = jax.device_put(padh(t_depths), row_axis(t_depths))
    t_intrs, t_Rs, t_ts = (
        jax.device_put(x, repl) for x in (t_intrs, t_Rs, t_ts)
    )
    from sucre_tpu.ops.matching import _split_tags

    tag1, tag2 = _split_tags(dist_model)
    # distortion vectors shard exactly like the intrinsics they extend;
    # each side rides only when that side's camera is distorted
    if tag2 != "none":
        v_dists = jax.device_put(padv(v_dists), view_axis(v_dists))
    if tag1 != "none":
        t_dists = jax.device_put(t_dists, repl)
    W = t_depths.shape[2]
    return match_survey(
        t_depths, t_intrs, t_Rs, t_ts, *v_arrays,
        jnp.float32(min_cover), compact=compact, bilinear=bilinear,
        t_dists=None if tag1 == "none" else t_dists,
        v_dists=None if tag2 == "none" else v_dists,
        dist_model=dist_model,
        # the UNPADDED pixel count: padded rows have no valid matches but
        # would otherwise inflate the min-cover denominator, silently
        # dropping borderline pairs that the unsharded program keeps
        area=jnp.float32(H * W),
    )


def _pallas_sharded_eligible(params, obs: DenseObs, cfg) -> bool:
    from sucre_tpu.ops.pallas.fit_kernel import kernel_supported
    from sucre_tpu.ops.pallas.light_kernel import light_kernel_supported

    if cfg.use_closed_form or params.J is None:
        return False
    if params.cam2light is not None:
        return obs.cP is not None and light_kernel_supported(obs.valid.shape[-1])
    return obs.z is not None and kernel_supported(obs.valid.shape[-1])



def fit_sharded_pallas(params, obs: DenseObs, cfg, mesh: Mesh):
    """The single-target sharded fit at fused-kernel speed: a T=1
    wrapper over ``fit_many_sharded_pallas`` (one implementation of the
    per-shard kernel + psum'd gradient scheme for both fit modes).
    Mathematically identical to the single-device kernel: every
    reduction is a sum.

    Requirements: direct mode; compact z layout without the light model,
    full cP layout with it.
    """
    from sucre_tpu.solve import FitResult

    if not _pallas_sharded_eligible(params, obs, cfg):
        raise ValueError(
            "fit_sharded_pallas needs direct mode and the compact z layout "
            "(full cP layout with the light model)"
        )
    paramsT = jax.tree.map(lambda x: x[None], params)
    obsT = jax.tree.map(lambda x: x[None], obs)
    pT, J, observed, tel = fit_many_sharded_pallas(paramsT, obsT, cfg, mesh)
    return FitResult(
        params=jax.tree.map(lambda x: x[0], pT),
        J=J[0],
        observed=observed[0],
        telemetry=jax.tree.map(lambda x: x[:, 0], tel),
    )


@partial(jax.jit, static_argnames=("mesh", "light", "lr", "num_iter", "interpret"))
def _run_sharded_kernel(params, X, It, occ, n_obs, opt_state=None, *, mesh,
                        light, lr, num_iter, interpret):
    """The batched per-shard-kernel Adam program, jitted ONCE per
    (mesh, mode, lr, num_iter, platform, shapes) — repeated survey
    batches reuse the compiled program instead of retracing per call.

    Inputs are already padded to the kernel tiling and placed on the
    mesh (see ``fit_many_sharded_pallas``): X is the z stack
    (T, Vp, Hp, Wp) or the cP stack (T, 3, Vp, Hp, Wp) with the light
    model; params.J is (T, Hp, Wp, 3) row-sharded, everything else
    replicated.
    """
    from jax import shard_map

    from sucre_tpu.ops.pallas import fit_kernel as fk
    from sucre_tpu.ops.pallas import light_kernel as lk
    from sucre_tpu.solve import FitTelemetry

    if light:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, "row", None, None),  # J rows (T leading)
                P(), P(),  # BBG, aux replicated
                P(None, None, "view", "row", None),  # cP block
                P(None, None, "view", "row", None),  # I block
                P(None, "row", "view"),  # occupancy table (light_occupancy)
            ),
            out_specs=(P(None, "row", None, None), P()),
            check_vma=False,
        )
        def shard_grads_light(Jl, BBG, aux, cPl, Il, occl):
            Jt = jnp.moveaxis(Jl, -1, 1)  # (T, 3, Hl, Wp)
            dJt, parts = lk._light_pallas(BBG, aux, cPl, Il, Jt, interpret, occ=occl)
            parts = jax.lax.psum(parts, ("view", "row"))
            dJt = jax.lax.psum(dJt, "view")  # complete grad for local rows
            return jnp.moveaxis(dJt, 1, -1), parts
    else:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(None, "row", None, None),  # J rows (T leading)
                P(), P(), P(),  # B, beta, gamma (T, 3) replicated
                P(None, "view", "row", None),  # z block
                P(None, None, "view", "row", None),  # I block
                P(None, "row", "view"),  # occupancy table (see fit_kernel)
            ),
            out_specs=(P(), P(None, "row", None, None), P(), P(), P()),
            check_vma=False,
        )
        def shard_grads(Jl, B, beta, gamma, zl, Il, occl):
            cost, dJ, dB, dbeta, dgamma = fk.fused_fit_grads_prepared(
                Jl, B, beta, gamma, zl, Il, occ=occl, interpret=interpret
            )
            cost = jax.lax.psum(cost, ("view", "row"))
            dB = jax.lax.psum(dB, ("view", "row"))
            dbeta = jax.lax.psum(dbeta, ("view", "row"))
            dgamma = jax.lax.psum(dgamma, ("view", "row"))
            dJ = jax.lax.psum(dJ, "view")
            return cost, dJ, dB, dbeta, dgamma

    opt = optax.adam(lr)
    if opt_state is None:
        opt_state = jax.vmap(opt.init)(params)

    def step(carry, _):
        p, s = carry
        k = (1.0 / (jnp.maximum(n_obs, 1) * 3.0))[:, None]
        if light:
            # packed-operand assembly + partials decode live in
            # light_kernel.py (shared with the unsharded batched fit);
            # the only sharded-path difference is the psum'd kernel call
            BBG, aux, vjp_se3, vjp_sig = lk.assemble_light_inputs_batched(
                p.B, p.beta, p.gamma, p.cam2light, p.sigma
            )
            dJ_raw, parts = shard_grads_light(p.J, BBG, aux, X, It, occ)
            cost, dB, dbeta, dgamma, dc2l, dsig = (
                lk.decode_light_partials_batched(parts, vjp_se3, vjp_sig)
            )
            grads = p._replace(
                J=jnp.float32(-2.0) * dJ_raw * k[..., None, None],
                B=dB * k,
                beta=dbeta * k,
                gamma=dgamma * k,
                cam2light=dc2l * k,
                sigma=dsig * k[..., None],
            )
        else:
            cost, dJ, dB, dbeta, dgamma = shard_grads(
                p.J, p.B, p.beta, p.gamma, X, It, occ
            )
            grads = p._replace(
                J=dJ * k[..., None, None], B=dB * k, beta=dbeta * k,
                gamma=dgamma * k,
            )
        updates, s = jax.vmap(opt.update)(grads, s, p)
        p = jax.vmap(optax.apply_updates)(p, updates)
        return (p, s), (cost, p.B, p.beta, p.gamma)

    (params, opt_state), ys = jax.lax.scan(
        step, (params, opt_state), None, length=num_iter
    )
    return params, opt_state, FitTelemetry(*ys)


def prepare_sharded_kernel_inputs(params, obs: DenseObs, mesh: Mesh,
                                  light: bool):
    """Pad the stack to the kernel tiling and place everything on the
    mesh in the layout ``_run_sharded_kernel`` expects: X/I blocks over
    (view, row), J rows over 'row', globals replicated. Shared by
    ``fit_many_sharded_pallas`` and the HLO communication-inventory
    tests (which lower the exact production program)."""
    from sucre_tpu.ops.pallas import fit_kernel as fk
    from sucre_tpu.ops.pallas import light_kernel as lk

    vs = mesh.shape["view"]
    rs = mesh.shape["row"]
    T, V, H, W = obs.valid.shape
    mod = lk if light else fk
    Wp = -(-W // mod.LANES) * mod.LANES
    th = lk.light_row_tile(Wp) if light else fk.row_tile(Wp)
    Vp = -(-V // (vs * mod.VB)) * (vs * mod.VB)
    Hp = -(-H // (rs * th)) * (rs * th)
    pad = [(0, Vp - V), (0, Hp - H), (0, Wp - W)]

    if light:
        X = jnp.pad(jnp.moveaxis(obs.cP, -1, 1), [(0, 0), (0, 0)] + pad)
        x_spec = P(None, None, "view", "row", None)
    else:
        X = jnp.pad(obs.z, [(0, 0)] + pad)
        x_spec = P(None, "view", "row", None)
    It = jnp.pad(jnp.moveaxis(obs.I, -1, 1), [(0, 0), (0, 0)] + pad)
    J0 = jnp.pad(params.J, [(0, 0), (0, Hp - H), (0, Wp - W), (0, 0)])
    n_obs = jnp.sum(obs.valid, axis=(1, 2, 3)).astype(jnp.float32)

    # Per-fit block-occupancy table (the tile skip; fit_kernel.occupancy
    # for the z stack, light_kernel.light_occupancy for the cP stack):
    # computed ONCE here — never inside the iteration loop — and sharded
    # like the grid it indexes (row tiles over 'row', view blocks over
    # 'view').
    occ = jax.device_put(
        (lk.light_occupancy if light else fk.occupancy)(X),
        NamedSharding(mesh, P(None, "row", "view")),
    )
    X = jax.device_put(X, NamedSharding(mesh, x_spec))
    It = jax.device_put(It, NamedSharding(mesh, P(None, None, "view", "row", None)))
    J0 = jax.device_put(J0, NamedSharding(mesh, P(None, "row", None, None)))
    params = replicate(params._replace(J=None), mesh)._replace(J=J0)
    n_obs = jax.device_put(n_obs, NamedSharding(mesh, P()))
    return params, X, It, occ, n_obs


def fit_many_sharded_pallas(params, obs: DenseObs, cfg, mesh: Mesh):
    """Batched T-target fit on a (view x row) mesh at fused-kernel speed —
    the oversized-survey route (`fit_many(mesh=view-row)`) without
    falling back to XLA autodiff. Each shard runs the BATCHED kernel
    (grid leading axis = targets) on its local (T, view-slice,
    row-slice) block; cost and the per-target global-parameter gradients
    psum over the whole mesh, dJ psums over 'view' and stays row-sharded
    like J. Covers both the no-light and light-model kernels (the light
    variant closes the se3/Sigma chains outside the mesh via vmapped
    vjps).

    Returns fit_many's (params, J (T,H,W,3), observed (T,H,W),
    telemetry) tuple.
    """
    if not _pallas_sharded_eligible(params, obs, cfg):
        raise ValueError(
            "fit_many_sharded_pallas needs direct mode and the compact z "
            "layout (full cP layout with the light model)"
        )
    light = params.cam2light is not None
    interpret = jax.default_backend() != "tpu"

    H, W = obs.valid.shape[2:]
    params, X, It, occ, n_obs = prepare_sharded_kernel_inputs(
        params, obs, mesh, light
    )

    static = dict(
        mesh=mesh, light=light, lr=cfg.lr, interpret=interpret,
    )
    if cfg.stop_tol is None:
        params, _, tel = _run_sharded_kernel(
            params, X, It, occ, n_obs, num_iter=cfg.num_iter, **static
        )
    else:
        # stop_tol segmentation (shared driver, same scheme as fit_many):
        # stop_check-long scans with the per-target cost tail checked
        # between them.
        from sucre_tpu.solve import run_stop_tol_segments

        state = {"params": params, "opt_state": None}

        def step(n):
            state["params"], state["opt_state"], tel = _run_sharded_kernel(
                state["params"], X, It, occ, n_obs, state["opt_state"],
                num_iter=n, **static,
            )
            return tel

        tel = run_stop_tol_segments(step, cfg, n_obs.shape[0])
        params = state["params"]
    J = params.J[:, :H, :W]
    observed = jnp.any(obs.valid, axis=1)
    return params._replace(J=J), J, observed, tel
