"""Full-batch Adam solver for the formation model, fully on device.

Parity with the reference's ``adam()`` loop (sucre.py:124-157):
  - exact full-batch gradient: objective = sum of squared residuals over
    ALL observations, normalized by n_obs*3 (sucre.py:146); the
    reference's pair-batch loop is pure gradient accumulation, so a
    single whole-stack gradient (or a chunked lax.scan accumulation with
    rematerialization — the ``view_chunk`` memory knob, analog of
    ``--batch-size``) is mathematically identical.
  - one Adam step per iteration, torch hyperparameters (b1=0.9,
    b2=0.999, eps=1e-8, bias correction) == optax.adam defaults.
  - closed-form mode: J is recomputed from current params each iteration
    *outside* the gradient path (torch.no_grad, sucre.py:66-77), then
    treated as a constant in the forward; direct mode: J is a learnable
    leaf of the params pytree.
  - telemetry: per-iteration raw cost + B/beta/gamma collected as scan
    outputs (host printing happens between scan segments, so the loop
    itself never leaves the device).

TPU design: iterations run as ``lax.scan`` segments under one jit, with
buffers donated across segments; segment boundaries exist only to host
snapshot/telemetry callbacks (``--save-interval`` parity). When the
observation stack is sharded over a device mesh (views and/or pixel
rows), XLA turns the reductions into psums/all-reduces automatically —
the solver is mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sucre_tpu.models.sucre import SucreParams, closed_form_J, residual_loss
from sucre_tpu.ops.matching import DenseObs


class FitTelemetry(NamedTuple):
    """Per-iteration telemetry (scan outputs), shapes (num_iter, ...)."""

    cost: jnp.ndarray  # raw sum of squared residuals
    B: jnp.ndarray  # (num_iter, 3)
    beta: jnp.ndarray
    gamma: jnp.ndarray


@dataclasses.dataclass
class FitConfig:
    lr: float = 0.05  # sucre.py:289
    num_iter: int = 200  # sucre.py:291
    use_closed_form: bool = False
    view_chunk: int | None = None  # grad-accum chunk over the view axis
    save_interval: int | None = None
    # Fused Pallas forward+backward kernel for the gradient step:
    # None = auto (on when eligible: direct mode, unchunked,
    # single-device; compact z layout without the light model, full cP
    # layout with it — both modes have fused kernels). True forces
    # (interpret mode off TPU), False disables.
    use_pallas: bool | None = None
    # Mid-run fault tolerance: checkpoint (params, opt_state, iteration)
    # every ``checkpoint_interval`` iterations into ``checkpoint_dir`` and
    # resume from the latest checkpoint if one exists. (The reference only
    # warm-starts parameters, sucre.py:206-207 — optimizer state and the
    # iteration counter are lost; this is full resume.)
    checkpoint_dir: "Path | None" = None
    checkpoint_interval: int | None = None
    # Measured-convergence early stop, OFF by default (the reference runs
    # exactly num_iter full-batch iterations, sucre.py:291 — parity).
    # When set, the loop runs in ``stop_check``-iteration segments and
    # stops once the relative cost improvement over the last segment,
    # extrapolated to a full window, STALLS:
    #   |cost[k - n] - cost[k]| / |cost[k]| * (stop_check / n) < stop_tol.
    # For a geometrically-decaying tail (ratio q per window) the cost at
    # the stop is within ~stop_tol * q/(1-q) of the full-run value; on
    # batched fits every target must satisfy the criterion. Non-finite
    # costs (diverged fits) never trigger the stop.
    stop_tol: float | None = None
    stop_check: int = 25

    def __post_init__(self):
        if self.stop_tol is not None:
            if self.stop_tol <= 0:
                raise ValueError(f"stop_tol must be > 0, got {self.stop_tol}")
            if self.stop_check < 1:
                raise ValueError(
                    f"stop_check must be >= 1, got {self.stop_check}"
                )


class FitResult(NamedTuple):
    params: SucreParams
    J: jnp.ndarray  # (H, W, 3) final restored image (finite; mask separate)
    observed: jnp.ndarray  # (H, W) bool — pixels with >= 1 observation
    telemetry: FitTelemetry


def _pad_views(obs: DenseObs, chunk: int) -> DenseObs:
    """Pad the view axis to a multiple of ``chunk`` with invalid views."""
    V = obs.valid.shape[0]
    pad = (-V) % chunk
    if pad == 0:
        return obs
    return jax.tree.map(
        lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), obs
    )


def _chunked(obs: DenseObs, chunk: int) -> DenseObs:
    """(V, ...) -> (V/chunk, chunk, ...) for lax.scan grad accumulation."""
    return jax.tree.map(lambda x: x.reshape((-1, chunk) + x.shape[1:]), obs)


def _loss(params: SucreParams, J: jnp.ndarray, obs: DenseObs, n_obs, chunked: bool):
    """Normalized loss + raw cost, optionally accumulated over view chunks
    with rematerialization (constant activation memory in V)."""
    if not chunked:
        return residual_loss(params, J, obs, n_obs)

    @jax.checkpoint
    def body(acc, chunk_obs):
        nl, cost = residual_loss(params, J, chunk_obs, n_obs)
        return (acc[0] + nl, acc[1] + cost), None

    (nl, cost), _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.float32(0.0)), obs)
    return nl, cost


def _closed_form(params: SucreParams, obs: DenseObs, chunked: bool):
    """Closed-form J over (possibly chunked) observations: accumulate the
    numerator/denominator reductions across chunks."""
    if not chunked:
        return closed_form_J(params, obs)

    def body(acc, chunk_obs):
        # J = num/den per chunk does not compose, so accumulate the
        # numerator/denominator partial sums across chunks.
        from sucre_tpu.models.sucre import closed_form_terms  # avoid cycle

        num, den = closed_form_terms(params, chunk_obs)
        return (acc[0] + num, acc[1] + den), None

    H, W = obs.valid.shape[-2:]
    zero = jnp.zeros((H, W, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(body, (zero, zero), obs)
    pos = den > 0
    J = jnp.where(pos, num / jnp.where(pos, den, 1.0), 0.0)
    return J, jnp.any(pos, axis=-1)


def improvement_converged(
    prev_cost, cost, n_steps: int, stop_check: int, tol: float
) -> bool:
    """The stop_tol criterion between two cost measurements ``n_steps``
    iterations apart (scalars or per-target arrays — EVERY fit must
    satisfy it): |relative improvement|, extrapolated to a full
    ``stop_check`` window, below ``tol`` — the fit has STALLED. The
    absolute value matters: a large NEGATIVE rate (cost climbing — Adam
    overshoot mid-traversal, measured on the closed-form synthetic fit
    where cost transiently rises ~11% around iteration 40 before falling
    seven more orders of magnitude) must keep running, while tiny
    plateau jitter around zero stops. Non-finite rates (diverged fits)
    never converge. Shared by fit / fit_many / fit_joint / the
    sharded-kernel batched fit."""
    if prev_cost is None or n_steps <= 0:
        return False
    prev = np.asarray(prev_cost, np.float64)
    cur = np.asarray(cost, np.float64)
    rate = (prev - cur) / np.maximum(np.abs(cur), 1e-30) * (stop_check / n_steps)
    return bool(np.all(np.isfinite(rate) & (np.abs(rate) < tol)))


def run_stop_tol_segments(
    step: Callable[[int], FitTelemetry], cfg: "FitConfig", n_targets: int
) -> FitTelemetry:
    """Shared stop-tol segmentation driver for the batched fit paths
    (fit_many / fit_joint / the sharded-kernel batched fit).

    ``step(n_steps)`` advances the caller's fit state by ``n_steps``
    iterations and returns that segment's telemetry with per-target
    trailing shapes (cost (n, T), params (n, T, 3)). Segments run at the
    ``stop_check`` cadence until EVERY target's windowed cost improvement
    falls below ``stop_tol`` (improvement_converged) or ``num_iter`` is
    reached; each check costs one small host round trip. Returns the
    concatenated telemetry (empty when ``num_iter`` is 0)."""
    tel_parts: list[FitTelemetry] = []
    it = 0
    prev_cost = None
    while it < cfg.num_iter:
        n = min(cfg.stop_check, cfg.num_iter - it)
        tel_parts.append(jax.device_get(step(n)))
        it += n
        cost = tel_parts[-1].cost[-1]  # (T,)
        if improvement_converged(prev_cost, cost, n, cfg.stop_check, cfg.stop_tol):
            break
        prev_cost = cost
    if tel_parts:
        return jax.tree.map(lambda *xs: np.concatenate(xs), *tel_parts)
    T = n_targets
    return FitTelemetry(
        cost=np.zeros((0, T), np.float32), B=np.zeros((0, T, 3), np.float32),
        beta=np.zeros((0, T, 3), np.float32),
        gamma=np.zeros((0, T, 3), np.float32),
    )


@partial(
    jax.jit,
    static_argnames=(
        "n_steps", "use_closed_form", "chunked", "lr", "pallas_mode", "light"
    ),
    donate_argnums=(0, 1),
)
def _run_segment(
    params: SucreParams,
    opt_state,
    obs: DenseObs,
    n_obs: jnp.ndarray,
    n_steps: int,
    use_closed_form: bool,
    chunked: bool,
    lr: float,
    pallas_mode: str = "off",  # "off" | "tpu" | "interpret"
    light: bool = False,  # fused LIGHT-model kernel instead of the no-light one
):
    """Run ``n_steps`` Adam iterations as a lax.scan, returning telemetry."""
    opt = optax.adam(lr)

    if pallas_mode != "off" and light:
        from sucre_tpu.ops.pallas.light_kernel import (
            fused_light_fit_grads_prepared,
            light_occupancy,
            prepare_light_obs,
        )

        cPt, Itl = prepare_light_obs(obs.cP, obs.I)
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

    def grads_of(params):
        if pallas_mode != "off" and light:
            cost, dJ, dB, dbeta, dgamma, dc2l, dsig = fused_light_fit_grads_prepared(
                params.J, params.B, params.beta, params.gamma,
                params.cam2light, params.sigma, cPt, Itl, occ=locc,
                interpret=(pallas_mode == "interpret"),
            )
            s = 1.0 / (jnp.maximum(n_obs, 1) * 3.0)
            grads = SucreParams(
                B=dB * s, beta=dbeta * s, gamma=dgamma * s, J=dJ * s,
                cam2light=dc2l * s, sigma=dsig * s,
            )
            return cost, grads
        if pallas_mode != "off":
            cost, dJ, dB, dbeta, dgamma = fused_fit_grads_prepared(
                params.J, params.B, params.beta, params.gamma, zt, It,
                occ=occ, interpret=(pallas_mode == "interpret"),
            )
            s = 1.0 / (jnp.maximum(n_obs, 1) * 3.0)
            grads = SucreParams(B=dB * s, beta=dbeta * s, gamma=dgamma * s, J=dJ * s)
            return cost, grads
        if use_closed_form:
            J_const, _ = _closed_form(params, obs, chunked)
            loss_fn = lambda p: _loss(p, J_const, obs, n_obs, chunked)
        else:
            loss_fn = lambda p: _loss(p, p.J, obs, n_obs, chunked)
        (_, cost), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return cost, grads

    def step(carry, _):
        params, opt_state = carry
        cost, grads = grads_of(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (cost, params.B, params.beta, params.gamma)

    (params, opt_state), ys = jax.lax.scan(step, (params, opt_state), None, length=n_steps)
    return params, opt_state, FitTelemetry(*ys)


def fit(
    params: SucreParams,
    obs: DenseObs,
    cfg: FitConfig,
    *,
    telemetry_fn: Callable[[int, FitTelemetry], None] | None = None,
    snapshot_fn: Callable[[int, SucreParams, jnp.ndarray, jnp.ndarray], None] | None = None,
) -> FitResult:
    """Fit the formation model to an observation stack.

    ``telemetry_fn(start_iter, seg_telemetry)`` is called after each scan
    segment; ``snapshot_fn(iteration, params, J, observed)`` at
    ``save_interval`` boundaries (parity: sucre.py:153-154 saves at
    iteration % save_interval == 0, i.e. after iterations 0, s, 2s, ...).
    """
    use_closed_form = cfg.use_closed_form
    # _run_segment donates params/opt_state buffers; copy so the caller's
    # params pytree stays alive (it may be reused, e.g. warm starts).
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    chunked = cfg.view_chunk is not None and cfg.view_chunk < obs.valid.shape[0]
    if chunked:
        obs = _chunked(_pad_views(obs, cfg.view_chunk), cfg.view_chunk)

    n_obs = jnp.float32(obs.n_obs)  # shape-agnostic (sum of valid)

    opt_state = optax.adam(cfg.lr).init(params)

    # Mid-run resume: restore (iteration, params, opt_state) from the
    # latest snapshot in checkpoint_dir, if any.
    start = 0
    if cfg.checkpoint_dir is not None:
        from sucre_tpu.utils import fit_checkpoint as fckpt

        latest = fckpt.latest_fit_state(cfg.checkpoint_dir)
        if latest is not None:
            start, params, opt_state = fckpt.load_fit_state(latest, params, opt_state)

    # Segment boundaries (in completed-iteration counts): snapshots fire
    # after iterations 0, s, 2s, ... (parity: sucre.py:153-154), solver
    # checkpoints after every checkpoint_interval iterations. Each
    # DISTINCT segment length is a separate XLA compile of the whole fit
    # program (n_steps is static), so when both periods are active and
    # misaligned, the checkpoint cadence snaps to the nearest save-
    # boundary multiple (fault-tolerance cadence is approximate by
    # nature; unique lengths stay bounded at ~4 instead of O(num_iter)).
    ckpt_interval = cfg.checkpoint_interval
    if (
        ckpt_interval
        and cfg.save_interval
        and snapshot_fn is not None
        and ckpt_interval % cfg.save_interval
    ):
        ckpt_interval = max(
            cfg.save_interval,
            round(ckpt_interval / cfg.save_interval) * cfg.save_interval,
        )
    bounds: set[int] = {cfg.num_iter}
    if cfg.save_interval and snapshot_fn is not None:
        bounds |= {
            c + 1 for c in range(0, cfg.num_iter, cfg.save_interval)
        }
    if cfg.checkpoint_dir is not None and ckpt_interval:
        bounds |= set(range(ckpt_interval, cfg.num_iter + 1, ckpt_interval))
    if cfg.stop_tol is not None:
        # convergence is checked between segments (stop_check cadence)
        bounds |= set(range(cfg.stop_check, cfg.num_iter + 1, cfg.stop_check))
    boundaries = sorted(c for c in bounds if start < c <= cfg.num_iter)
    segments = []
    prev = start
    for c in boundaries:
        segments.append(c - prev)
        prev = c

    # Fused-kernel routing (shared with fit_many/fit_joint): the kernels
    # are not partitioned, so the stack must be single-device here.
    from sucre_tpu.ops.pallas import select_fit_kernel

    single_device = len(getattr(obs.valid, "devices", lambda: [None])()) <= 1
    mode = select_fit_kernel(
        params, obs, cfg, chunked=chunked, unsharded=single_device, what="fit"
    )
    light = mode.startswith("light")
    pallas_mode = mode.replace("light-", "")

    tel_parts = []
    it = start
    prev_cost = None
    prev_check_it = start
    for n_steps in segments:
        params, opt_state, tel = _run_segment(
            params, opt_state, obs, n_obs, n_steps, use_closed_form, chunked, cfg.lr,
            pallas_mode=pallas_mode, light=light and pallas_mode != "off",
        )
        tel_parts.append(jax.device_get(tel))
        if telemetry_fn is not None:
            telemetry_fn(it, tel_parts[-1])
        it += n_steps
        if snapshot_fn is not None and cfg.save_interval and (it - 1) % cfg.save_interval == 0:
            J_snap, observed_snap = _final_J(params, obs, use_closed_form, chunked)
            snapshot_fn(it - 1, params, J_snap, observed_snap)
        if (
            cfg.checkpoint_dir is not None
            and ckpt_interval
            and it % ckpt_interval == 0
            and it < cfg.num_iter
        ):
            from sucre_tpu.utils import fit_checkpoint as fckpt

            fckpt.save_fit_state(cfg.checkpoint_dir, it, params, opt_state)
        # Convergence is evaluated ONLY at the stop_check cadence (these
        # boundaries are all in the segment bounds set): snapshot- or
        # checkpoint-induced segments can be as short as 1 iteration, and
        # a single-step rate extrapolated x stop_check is pure noise at a
        # cost-curve turning point (the closed-form synthetic fit rises
        # ~11% around iter 40 — a 1-step check there would spuriously
        # stop a fit that falls 7 more orders of magnitude).
        if (
            cfg.stop_tol is not None
            and len(tel_parts[-1].cost)
            and it % cfg.stop_check == 0
        ):
            cost = float(tel_parts[-1].cost[-1])
            if improvement_converged(
                prev_cost, cost, it - prev_check_it, cfg.stop_check, cfg.stop_tol
            ):
                break
            prev_cost = cost
            prev_check_it = it

    J, observed = _final_J(params, obs, use_closed_form, chunked)
    if tel_parts:
        telemetry = FitTelemetry(*(np.concatenate(parts) for parts in zip(*tel_parts)))
    else:  # resumed at or past num_iter: nothing left to run
        telemetry = FitTelemetry(
            cost=np.zeros((0,), np.float32), B=np.zeros((0, 3), np.float32),
            beta=np.zeros((0, 3), np.float32), gamma=np.zeros((0, 3), np.float32),
        )
    return FitResult(params=params, J=J, observed=observed, telemetry=telemetry)


def _final_J(params, obs, use_closed_form, chunked):
    """Final restored image: closed-form recompute (sucre.py:156) or the
    learned J parameter; ``observed`` mask for NaN export parity."""
    if use_closed_form:
        return _closed_form_jit(params, obs, chunked)
    valid = obs.valid.reshape((-1,) + obs.valid.shape[-2:])
    return params.J, jnp.any(valid, axis=0)


@partial(jax.jit, static_argnames=("chunked",))
def _closed_form_jit(params, obs, chunked):
    return _closed_form(params, obs, chunked)


def print_telemetry(start_iter: int, tel: FitTelemetry) -> None:
    """Reference-format per-iteration telemetry lines (sucre.py:149-152)."""
    from sucre_tpu.utils.log import get_logger

    logger = get_logger()
    for i in range(len(tel.cost)):
        with np.printoptions(precision=4):
            logger.info(
                f"iter: {start_iter + i:04d}, cost: {float(tel.cost[i]):.4e}, "
                f"B: {np.asarray(tel.B[i])}, beta: {np.asarray(tel.beta[i])}, "
                f"gamma: {np.asarray(tel.gamma[i])}"
            )
