"""Multi-target batched fit: restore several images in one device program.

The reference loops targets sequentially on one GPU (sucre.py:243-261).
Here a batch of T same-shaped targets becomes a leading axis: params and
observation stacks stack to (T, ...), the Adam step is vmapped over T,
and the batch axis shards across devices — different chips restore
different images concurrently (the outer data parallelism of
SURVEY.md §2.3), composable with (view, row) sharding of each stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sucre_tpu.models.sucre import SucreParams, closed_form_J, residual_loss
from sucre_tpu.ops.matching import DenseObs
from sucre_tpu.solve import FitConfig, FitTelemetry


def stack_params(params_list: list[SucreParams]) -> SucreParams:
    """Stack per-target params pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def stack_obs(obs_list: list[DenseObs]) -> DenseObs:
    """Stack per-target observation stacks, padding the view axis to the
    largest V (padded views are invalid => no contribution).

    Color dtypes may legitimately differ across targets (raw uint8 from
    fresh matching vs float32 [0,1] loaded from an .h5 cache); stacking
    those as-is would silently promote the u8 values to f32 0-255 and
    break the [0,1] convention downstream, so mixed stacks are first
    normalized to f32 with ``to_f32_rgb``."""
    from sucre_tpu.ops.matching import to_f32_rgb

    if len({o.I.dtype for o in obs_list}) > 1:
        obs_list = [o._replace(I=to_f32_rgb(o.I)) for o in obs_list]
    V = max(o.valid.shape[0] for o in obs_list)

    def stackpad(*xs):
        return jnp.stack(
            [jnp.pad(x, [(0, V - x.shape[0])] + [(0, 0)] * (x.ndim - 1)) for x in xs]
        )

    return jax.tree.map(stackpad, *obs_list)


def chunk_batched_views(obs: DenseObs, view_chunk: int) -> DenseObs:
    """(T, V, ...) -> (T, nc, chunk, ...): the --batch-size grad-accum
    reshape (view axis padded with invalid entries to a chunk multiple);
    the loss then scans over chunks with rematerialization — identical
    gradient, bounded activations. Shared by fit_many and fit_joint."""
    c = view_chunk
    pad = (-obs.valid.shape[1]) % c
    if pad:
        obs = jax.tree.map(
            lambda x: jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)),
            obs,
        )
    return jax.tree.map(lambda x: x.reshape((x.shape[0], -1, c) + x.shape[2:]), obs)


def shard_batched_obs_vr(obs: DenseObs, mesh: Mesh) -> DenseObs:
    """Place a batched (T, V, H, W, ...) stack on a (view x row) mesh —
    the oversized-survey layout match_survey_sharded emits. Shared by
    fit_many and fit_joint (params/aux replicate; GSPMD psums their
    gradient reductions)."""
    return jax.tree.map(
        lambda v: jax.device_put(
            v,
            NamedSharding(mesh, P(None, "view", "row", *([None] * (v.ndim - 3)))),
        ),
        obs,
    )


def prepare_batched_obs(obs: DenseObs, cfg: FitConfig, mesh: Mesh | None):
    """The placement preamble shared by ``fit_many`` and ``fit_joint``:
    per-target observation counts, the --batch-size view-chunk reshape
    (moot on a (view x row) mesh, which bounds memory by sharding), and
    mesh placement of the stack.

    Returns ``(obs, n_obs, chunked, batch_put, repl_put)``. ``batch_put``
    places a per-target parameter leaf (leading T axis) the way the stack
    was placed — sharded over the batch axis on a batch mesh, replicated
    on a (view x row) mesh, identity without a mesh; ``repl_put``
    replicates a shared/global leaf (identity without a mesh).
    """
    n_obs = jnp.sum(obs.valid, axis=tuple(range(1, obs.valid.ndim))).astype(
        jnp.float32
    )
    vr_mesh = mesh is not None and "view" in mesh.axis_names
    chunked = (
        not vr_mesh
        and cfg.view_chunk is not None
        and cfg.view_chunk < obs.valid.shape[1]
    )
    if chunked:
        obs = chunk_batched_views(obs, cfg.view_chunk)
    if mesh is None:
        ident = lambda x: x
        return obs, n_obs, chunked, ident, ident
    repl_put = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    if vr_mesh:
        obs = shard_batched_obs_vr(obs, mesh)
        return obs, repl_put(n_obs), chunked, repl_put, repl_put
    batch_axis = mesh.axis_names[0]

    def batch_put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(*([batch_axis] + [None] * (x.ndim - 1))))
        )

    obs = jax.tree.map(batch_put, obs)
    return obs, batch_put(n_obs), chunked, batch_put, repl_put


@partial(
    jax.jit,
    static_argnames=(
        "num_iter", "use_closed_form", "lr", "pallas_mode", "chunked", "finalize"
    ),
    donate_argnums=(0, 1),
)
def _fit_many_jit(
    params: SucreParams,  # leaves with leading T axis
    opt_state,  # vmapped Adam state, or None to initialize fresh
    obs: DenseObs,  # (T, V, H, W, ...) or (T, nc, c, H, W, ...) chunked
    n_obs: jnp.ndarray,  # (T,)
    num_iter: int,
    use_closed_form: bool,
    lr: float,
    pallas_mode: str = "off",
    chunked: bool = False,
    finalize: bool = True,  # False: segment of a stop_tol run — skip J/observed
):
    opt = optax.adam(lr)
    if opt_state is None:
        opt_state = jax.vmap(opt.init)(params)

    light_kernel = pallas_mode.startswith("light")
    interpret = pallas_mode.endswith("interpret")
    if light_kernel:
        from sucre_tpu.ops.pallas.light_kernel import (
            fused_light_fit_grads_batched,
            light_occupancy,
            prepare_light_obs_batched,
        )

        cPt, Ilt = prepare_light_obs_batched(obs.cP, obs.I)
        # once per segment, NOT per iteration: empty blocks skip VPU work
        locc = light_occupancy(cPt)
    elif pallas_mode != "off":
        from sucre_tpu.ops.pallas.fit_kernel import (
            fused_fit_grads_prepared,
            occupancy,
            prepare_obs,
        )

        zt, It = prepare_obs(obs.z, obs.I)
        # once per segment, NOT per iteration (see occupancy): empty
        # (row-tile, view-block) grid steps skip their VPU work
        occ = occupancy(zt)

    # View-chunked grad accumulation (the --batch-size memory knob):
    # per-target obs arrive reshaped (nc, chunk, H, W, ...) and the loss /
    # closed-form reductions scan over chunks with rematerialization —
    # mathematically identical to the full-stack gradient (solve._loss).
    from sucre_tpu.solve import _closed_form, _loss

    def one_target_grads(p, o, n):
        if use_closed_form:
            J_const, _ = _closed_form(p, o, chunked)
            loss_fn = lambda q: _loss(q, J_const, o, n, chunked)
        else:
            loss_fn = lambda q: _loss(q, q.J, o, n, chunked)
        (_, cost), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return cost, grads

    def step(carry, _):
        params, opt_state = carry
        if light_kernel:
            cost, dJ, dB, dbeta, dgamma, dc2l, dsig = fused_light_fit_grads_batched(
                params.J, params.B, params.beta, params.gamma,
                params.cam2light, params.sigma, cPt, Ilt, occ=locc,
                interpret=interpret,
            )
            s = (1.0 / (jnp.maximum(n_obs, 1) * 3.0))[:, None]
            grads = SucreParams(
                B=dB * s, beta=dbeta * s, gamma=dgamma * s,
                J=dJ * s[..., None, None],
                cam2light=dc2l * s, sigma=dsig * s[..., None],
            )
        elif pallas_mode != "off":
            cost, dJ, dB, dbeta, dgamma = fused_fit_grads_prepared(
                params.J, params.B, params.beta, params.gamma, zt, It,
                occ=occ, interpret=interpret,
            )
            s = (1.0 / (jnp.maximum(n_obs, 1) * 3.0))[:, None]
            grads = SucreParams(
                B=dB * s, beta=dbeta * s, gamma=dgamma * s,
                J=dJ * s[..., None, None],
            )
        else:
            cost, grads = jax.vmap(one_target_grads)(params, obs, n_obs)
        updates, opt_state = jax.vmap(opt.update)(grads, opt_state, params)
        params = jax.vmap(optax.apply_updates)(params, updates)
        return (params, opt_state), (cost, params.B, params.beta, params.gamma)

    (params, opt_state), ys = jax.lax.scan(
        step, (params, opt_state), None, length=num_iter
    )
    J = observed = None
    if finalize:
        J, observed = _finalize_many(params, obs, use_closed_form, chunked)
    return params, opt_state, J, observed, FitTelemetry(*ys)


def _finalize_many(params, obs: DenseObs, use_closed_form: bool, chunked: bool):
    """Final (J, observed) of a batched fit — inside _fit_many_jit on the
    single-program path, a separate jit after the last segment of a
    stop_tol run."""
    from sucre_tpu.solve import _closed_form

    if use_closed_form:
        return jax.vmap(lambda p, o: _closed_form(p, o, chunked))(params, obs)
    return params.J, jnp.any(
        obs.valid.reshape(obs.valid.shape[:1] + (-1,) + obs.valid.shape[-2:]),
        axis=1,
    )


_finalize_many_jit = jax.jit(
    _finalize_many, static_argnames=("use_closed_form", "chunked")
)


def fit_many(
    params: SucreParams,
    obs: DenseObs,
    cfg: FitConfig,
    mesh: Mesh | None = None,
):
    """Fit T targets at once; with a mesh, shard the batch axis.

    Returns (params, J (T,H,W,3), observed (T,H,W), telemetry with
    leading iteration axis and (num_iter, T, ...) shapes).
    """
    # (view x row) mesh: route eligible fits through the per-shard
    # BATCHED kernels (the oversized-survey path at fused-kernel speed);
    # ineligible/forced-off fits fall through to the GSPMD XLA path.
    if mesh is not None and "view" in mesh.axis_names:
        from sucre_tpu.parallel.mesh import (
            _pallas_sharded_eligible,
            fit_many_sharded_pallas,
        )

        up = getattr(cfg, "use_pallas", None)
        # view_chunk (the --batch-size activation bound) disqualifies the
        # kernel route exactly as in fit_sharded: the kernel materializes
        # the full padded stack per shard
        eligible = (
            _pallas_sharded_eligible(params, obs, cfg)
            and cfg.view_chunk is None
        )
        if eligible and (
            up is True or (up is None and jax.default_backend() == "tpu")
        ):
            return fit_many_sharded_pallas(params, obs, cfg, mesh)
        if up is True:
            # don't fall through to select_fit_kernel's meshless wording
            raise ValueError(
                "use_pallas=True on a (view x row)-mesh batched fit "
                "requires direct mode, the compact z layout (full cP "
                "with the light model) and no view_chunk; use "
                "use_pallas=None for auto"
            )

    # The jit donates the params buffers; copy so the caller's pytree
    # stays alive for reuse. Needed on the mesh path too: device_put to
    # an identical sharding may ALIAS the caller's buffers (no copy), so
    # batch_put alone does not guarantee donation safety.
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    obs, n_obs, chunked, batch_put, _ = prepare_batched_obs(obs, cfg, mesh)
    from sucre_tpu.ops.pallas import select_fit_kernel

    pallas_mode = select_fit_kernel(
        params, obs, cfg, chunked=chunked, unsharded=mesh is None,
        what="batched fit",
    )
    # Per-target params place like the stack: batch-sharded on a batch
    # mesh, replicated on a (view x row) mesh (GSPMD psums the gradient
    # reductions), untouched without a mesh.
    params = jax.tree.map(batch_put, params)
    static = dict(
        use_closed_form=cfg.use_closed_form, lr=cfg.lr,
        pallas_mode=pallas_mode, chunked=chunked,
    )
    if cfg.stop_tol is None:
        params, _, J, observed, tel = _fit_many_jit(
            params, None, obs, n_obs, cfg.num_iter, **static
        )
        return params, J, observed, tel

    # Measured-convergence early stop: solve.run_stop_tol_segments drives
    # stop_check-iteration segments until every target's windowed
    # improvement falls below stop_tol or num_iter is reached.
    from sucre_tpu.solve import run_stop_tol_segments

    state = {"params": params, "opt_state": None}

    def step(n):
        state["params"], state["opt_state"], _, _, tel = _fit_many_jit(
            state["params"], state["opt_state"], obs, n_obs, n,
            finalize=False, **static,
        )
        return tel

    tel = run_stop_tol_segments(step, cfg, n_obs.shape[0])
    params = state["params"]
    J, observed = _finalize_many_jit(params, obs, cfg.use_closed_form, chunked)
    return params, J, observed, tel
