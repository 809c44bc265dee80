"""Joint multi-image water-parameter estimation (BASELINE config 5).

The reference fits B/beta/gamma independently per restored image
(sucre.py:160-219 loop) even though the water column is shared across a
survey. Here a batch of T targets is fit with ONE shared set of global
parameters (B, beta, gamma[, light]) and per-target restored images J —
every observation in the survey constrains the same water model, which
pins down the B/gamma manifold far better than any single image can
(per-image fits leave them weakly identified; see the synthetic-scene
tests).

The objective is the sum of the per-target reference objectives:

    L = sum_t  cost_t / (3 * n_obs_t)

(each target keeps its own normalization so large-coverage images don't
dominate — and so T=1 exactly reproduces the single-image objective).

Telemetry reports the per-target raw costs plus the shared globals.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from sucre_tpu.models.sucre import SucreParams
from sucre_tpu.ops.matching import DenseObs
from sucre_tpu.solve import FitConfig, FitTelemetry


class JointParams(NamedTuple):
    """Shared water model + per-target restored images (a pytree)."""

    B: jnp.ndarray  # (3,) shared
    beta: jnp.ndarray  # (3,)
    gamma: jnp.ndarray  # (3,)
    J: jnp.ndarray | None  # (T, H, W, 3) per-target (direct mode) or None
    cam2light: jnp.ndarray | None = None  # (6,) shared light pose
    sigma: jnp.ndarray | None = None  # (2, 2)

    def target(self, t) -> SucreParams:
        return SucreParams(
            B=self.B, beta=self.beta, gamma=self.gamma,
            J=None if self.J is None else self.J[t],
            cam2light=self.cam2light, sigma=self.sigma,
        )


def init_joint_params(
    images=None, T: int | None = None, light_model: bool = False,
    use_closed_form: bool = False,
) -> JointParams:
    """Reference-parity init: globals 0.1, J = raw images (direct mode).

    ``T`` (the batch size) validates ``images`` when both are given —
    direct mode sizes J from the images themselves; closed-form mode
    needs neither (J is closed out of the iteration)."""
    if T is not None and images is not None and len(images) != T:
        raise ValueError(f"got {len(images)} images for a T={T} joint batch")
    p = JointParams(
        B=jnp.full((3,), 0.1, jnp.float32),
        beta=jnp.full((3,), 0.1, jnp.float32),
        gamma=jnp.full((3,), 0.1, jnp.float32),
        J=None,
    )
    if light_model:
        p = p._replace(
            cam2light=jnp.zeros((6,), jnp.float32), sigma=jnp.eye(2, dtype=jnp.float32)
        )
    if not use_closed_form:
        if images is None:
            raise ValueError("direct mode requires the raw images for J init")
        p = p._replace(J=jnp.stack([jnp.asarray(im, jnp.float32) for im in images]))
    return p


@partial(
    jax.jit,
    static_argnames=(
        "num_iter", "use_closed_form", "lr", "chunked", "pallas_mode", "finalize"
    ),
    donate_argnums=(0, 1),
)
def _fit_joint_jit(
    params: JointParams,
    opt_state,  # Adam state, or None to initialize fresh
    obs: DenseObs,  # (T, V, H, W, ...) or (T, nc, c, H, W, ...) chunked
    n_obs: jnp.ndarray,  # (T,)
    num_iter: int,
    use_closed_form: bool,
    lr: float,
    chunked: bool = False,
    pallas_mode: str = "off",
    finalize: bool = True,  # False: segment of a stop_tol run — skip J/observed
):
    from sucre_tpu.solve import _closed_form, _loss

    opt = optax.adam(lr)
    if opt_state is None:
        opt_state = opt.init(params)

    T = obs.valid.shape[0]
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

    def kernel_grads(p: JointParams):
        """Per-target kernel passes with the SHARED globals broadcast to
        every target; shared-parameter gradients are the sum of the
        per-target normalized gradients (L = sum_t cost_t/(3 n_t))."""
        # max(n_obs, 1): an empty target's masked grads/cost are exactly 0,
        # so a finite scale zeroes its contribution — 1/(0*3) would NaN the
        # SHARED parameter sums below and poison every target
        s = (1.0 / (jnp.maximum(n_obs, 1) * 3.0))[:, None]
        bB = jnp.broadcast_to(p.B, (T, 3))
        bbe = jnp.broadcast_to(p.beta, (T, 3))
        bga = jnp.broadcast_to(p.gamma, (T, 3))
        if light_kernel:
            bc2l = jnp.broadcast_to(p.cam2light, (T, 6))
            bsig = jnp.broadcast_to(p.sigma, (T, 2, 2))
            cost, dJ, dB, dbeta, dgamma, dc2l, dsig = fused_light_fit_grads_batched(
                p.J, bB, bbe, bga, bc2l, bsig, cPt, Ilt, occ=locc,
                interpret=interpret,
            )
            extra = dict(
                cam2light=jnp.sum(dc2l * s, axis=0),
                sigma=jnp.sum(dsig * s[..., None], axis=0),
            )
        else:
            cost, dJ, dB, dbeta, dgamma = fused_fit_grads_prepared(
                p.J, bB, bbe, bga, zt, It, occ=occ, interpret=interpret
            )
            extra = {}
        grads = JointParams(
            B=jnp.sum(dB * s, axis=0),
            beta=jnp.sum(dbeta * s, axis=0),
            gamma=jnp.sum(dgamma * s, axis=0),
            J=dJ * s[..., None, None],
            cam2light=extra.get("cam2light"),
            sigma=extra.get("sigma"),
        )
        return cost, grads

    def total_loss(p: JointParams):
        def one(t_obs, t_n, t_J):
            sp = SucreParams(B=p.B, beta=p.beta, gamma=p.gamma, J=t_J,
                             cam2light=p.cam2light, sigma=p.sigma)
            if use_closed_form:
                # constant w.r.t. the globals within an iteration
                # (reference torch.no_grad parity, sucre.py:66-68; also
                # halves the backward pass over the stack)
                J_const = jax.lax.stop_gradient(_closed_form(sp, t_obs, chunked)[0])
                return _loss(sp, J_const, t_obs, t_n, chunked)
            return _loss(sp, t_J, t_obs, t_n, chunked)

        if p.J is None:
            nl, cost = jax.vmap(lambda o, n: one(o, n, None))(obs, n_obs)
        else:
            nl, cost = jax.vmap(one)(obs, n_obs, p.J)
        return jnp.sum(nl), cost

    def step(carry, _):
        params, opt_state = carry
        if pallas_mode != "off":
            cost, grads = kernel_grads(params)
        else:
            (_, cost), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (cost, params.B, params.beta, params.gamma)

    (params, opt_state), ys = jax.lax.scan(
        step, (params, opt_state), None, length=num_iter
    )

    J = observed = None
    if finalize:
        J, observed = _finalize_joint(params, obs, use_closed_form, chunked)
    # telemetry parity with the per-target fit: globals are shared, but
    # exports slice per target — broadcast to (num_iter, T, 3)
    cost_tr, B_tr, beta_tr, gamma_tr = ys
    T = cost_tr.shape[1]

    def per_target(x):
        return jnp.broadcast_to(x[:, None, :], (x.shape[0], T, 3))

    tel = FitTelemetry(
        cost=cost_tr, B=per_target(B_tr),
        beta=per_target(beta_tr), gamma=per_target(gamma_tr),
    )
    return params, opt_state, J, observed, tel


def _finalize_joint(params: JointParams, obs: DenseObs,
                    use_closed_form: bool, chunked: bool):
    """Final (J, observed) of a joint fit — inside _fit_joint_jit on the
    single-program path, a separate jit after a stop_tol run's last
    segment."""
    from sucre_tpu.solve import _closed_form

    p = params
    if use_closed_form:
        return jax.vmap(
            lambda o: _closed_form(
                SucreParams(B=p.B, beta=p.beta, gamma=p.gamma, J=None,
                            cam2light=p.cam2light, sigma=p.sigma),
                o, chunked,
            )
        )(obs)
    observed = jnp.any(
        obs.valid.reshape(obs.valid.shape[:1] + (-1,) + obs.valid.shape[-2:]),
        axis=1,
    )
    return p.J, observed


_finalize_joint_jit = jax.jit(
    _finalize_joint, static_argnames=("use_closed_form", "chunked")
)


def fit_joint(params: JointParams, obs: DenseObs, cfg: FitConfig, mesh=None):
    """Jointly fit T targets with shared globals.

    With a ``mesh`` (first axis = target batch), the observation stacks
    and per-target J shard one-target-per-device while the shared
    globals stay replicated — GSPMD turns their gradient reductions into
    psums across the mesh, so every chip's observations constrain the
    same water model (requires T divisible by the mesh axis).

    Returns (params, J (T,H,W,3), observed (T,H,W), telemetry with
    cost (num_iter, T) and the shared-parameter trajectories broadcast
    per target, (num_iter, T, 3) — same layout as fit_many's).
    """
    from sucre_tpu.parallel.batch import prepare_batched_obs

    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    obs, n_obs, chunked, batch_put, repl_put = prepare_batched_obs(obs, cfg, mesh)
    # Fused-kernel routing (same eligibility as fit_many). The kernels
    # run per target; the shared-global gradients are the sums of the
    # per-target normalized gradients.
    from sucre_tpu.ops.pallas import select_fit_kernel

    pallas_mode = select_fit_kernel(
        params, obs, cfg, chunked=chunked, unsharded=mesh is None,
        what="joint fit",
    )
    # Shared globals replicate (GSPMD psums their gradient reductions);
    # the per-target J places like the stack (batch-sharded on a batch
    # mesh, replicated on a (view x row) mesh).
    params = JointParams(
        B=repl_put(params.B),
        beta=repl_put(params.beta),
        gamma=repl_put(params.gamma),
        J=None if params.J is None else batch_put(params.J),
        cam2light=None if params.cam2light is None else repl_put(params.cam2light),
        sigma=None if params.sigma is None else repl_put(params.sigma),
    )
    static = dict(
        use_closed_form=cfg.use_closed_form, lr=cfg.lr,
        chunked=chunked, pallas_mode=pallas_mode,
    )
    if cfg.stop_tol is None:
        params, _, J, observed, tel = _fit_joint_jit(
            params, None, obs, n_obs, cfg.num_iter, **static
        )
        return params, J, observed, tel

    # stop_tol segmentation (shared driver, same scheme as fit_many):
    # every target's windowed cost improvement must fall below tol — the
    # shared water model keeps moving until its weakest-constrained
    # target settles.
    from sucre_tpu.solve import run_stop_tol_segments

    state = {"params": params, "opt_state": None}

    def step(n):
        state["params"], state["opt_state"], _, _, tel = _fit_joint_jit(
            state["params"], state["opt_state"], obs, n_obs, n,
            finalize=False, **static,
        )
        return tel

    tel = run_stop_tol_segments(step, cfg, n_obs.shape[0])
    params = state["params"]
    J, observed = _finalize_joint_jit(params, obs, cfg.use_closed_form, chunked)
    return params, J, observed, tel
