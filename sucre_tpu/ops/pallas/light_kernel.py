"""Fused light-model forward+backward Pallas kernel (direct mode).

The artificial-light fit (``--light-model``, reference sucre.py:44-64,
79-82) evaluates, per observation,

    lP  = R_l cP + t_l                      (camera-to-light pose)
    z   = ||cP|| + ||lP||                   (round-trip range)
    lp  = lP_xy / lP_z
    q   = A lpx^2 + 2 C lpx lpy + D lpy^2   ((A, C, D) = Sigma^{-1} entries,
                                             Sigma = sigma^T sigma)
    l   = exp(-q / 2)
    I_hat = l (J a + B em),  a = exp(-beta z),  em = 1 - exp(-gamma z)

and needs gradients for {J, B, beta, gamma, R_l, t_l, (A, C, D)}; the
chain through ``se3_exp`` (cam2light) and the Sigma inverse (sigma) is
closed OUTSIDE the kernel with ``jax.vjp`` — those maps are tiny scalar
functions, while the per-observation work is the hot loop. One pass
reads each observation's 15 bytes (cP f32 x3 + I u8 x3) exactly once
per iteration; XLA autodiff materializes the forward intermediates and
re-reads the stack.

Masking parity (models/sucre.py compute_l_z): invalid entries (cP == 0;
real observations have cP_z = d2 > 0) compute on safe placeholders
(cP -> 1, lP -> 1 — the reference's double-where) and are zeroed through
the residual, so every emitted sum gets exactly zero contribution from
them and no Inf/NaN can leak in.

Grid: (T, H/TH row tiles, V/VB view blocks) — views iterate innermost so
J / dJ / the partial sums stay resident across a target's sweep (same
scheme as fit_kernel). The light kernel keeps ~10 more live per-channel
planes than the no-light kernel, so its row tile is halved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sucre_tpu.ops.pallas import fit_kernel as fk
from sucre_tpu.ops.se3 import se3_exp

VB = 4
LANES = 128

# packed partial-sum layout:
# [cost, SB(3), Sbeta(3), Sgamma(3), SA SC SD (3), SR(9), St(3), pad...]
_NPART = 32
_I_B, _I_BETA, _I_GAMMA, _I_ACD, _I_R, _I_T = 1, 4, 7, 10, 13, 22


def light_row_tile(Wp: int) -> int:
    """Halved row tile: the light kernel's VMEM working set carries ~2x
    the live planes of the no-light kernel."""
    return 16 if Wp <= 1024 else 8


def light_kernel_supported(W: int) -> bool:
    return -(-W // LANES) * LANES <= 2048


def _kernel(BBG_ref, aux_ref, occ_ref, cP_ref, I_ref, J_ref, dJ_ref, part_ref, *, u8: bool):
    i = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _():
        dJ_ref[:] = jnp.zeros_like(dJ_ref)

    @pl.when((v == 0) & (i == 0))
    def _():
        for k in range(_NPART):
            part_ref[0, 0, k] = jnp.float32(0.0)

    # Block occupancy (light_occupancy): empty (row-tile, view-block)
    # steps contribute exactly zero everywhere — skip their VPU work
    # (the partial-overlap fit win, same scheme as fit_kernel).
    @pl.when(occ_ref[0, i, v] > 0)
    def _body():
        _kernel_body(BBG_ref, aux_ref, cP_ref, I_ref, J_ref, dJ_ref, part_ref, u8=u8)


def _kernel_body(BBG_ref, aux_ref, cP_ref, I_ref, J_ref, dJ_ref, part_ref, *, u8: bool):
    X = cP_ref[0, 0]  # (VB, TH, Wp)
    Y = cP_ref[0, 1]
    Z = cP_ref[0, 2]
    mask = (X != 0.0) | (Y != 0.0) | (Z != 0.0)
    Xs = jnp.where(mask, X, 1.0)
    Ys = jnp.where(mask, Y, 1.0)
    Zs = jnp.where(mask, Z, 1.0)

    R = [aux_ref[0, 0, k] for k in range(9)]  # row-major R_l
    t = [aux_ref[0, 0, 9 + k] for k in range(3)]
    A, C, D = aux_ref[0, 0, 12], aux_ref[0, 0, 13], aux_ref[0, 0, 14]

    z1 = jnp.sqrt(Xs * Xs + Ys * Ys + Zs * Zs)
    lx = R[0] * Xs + R[1] * Ys + R[2] * Zs + t[0]
    ly = R[3] * Xs + R[4] * Ys + R[5] * Zs + t[1]
    lz = R[6] * Xs + R[7] * Ys + R[8] * Zs + t[2]
    # reference double-where: lP_safe = where(valid, lP, 1)
    lxs = jnp.where(mask, lx, 1.0)
    lys = jnp.where(mask, ly, 1.0)
    lzs = jnp.where(mask, lz, 1.0)
    zl = jnp.sqrt(lxs * lxs + lys * lys + lzs * lzs)
    z = z1 + zl
    il = 1.0 / lzs
    px = lxs * il
    py = lys * il
    q = A * px * px + 2.0 * C * px * py + D * py * py
    l = jnp.exp(-0.5 * q)

    cost_acc = jnp.float32(0.0)
    S_dl = jnp.zeros_like(z)  # sum_c r f   (dI_hat/dl = f)
    S_dz = jnp.zeros_like(z)  # sum_c r dI_hat/dz
    for c in range(3):
        Bc = BBG_ref[0, 0, c]
        bec = BBG_ref[0, 0, 3 + c]
        gac = BBG_ref[0, 0, 6 + c]
        Jc = J_ref[0, c]  # (TH, Wp), broadcasts over VB
        a = jnp.exp(-bec * z)
        ex = jnp.exp(-gac * z)
        em = 1.0 - ex
        I = I_ref[0, c]
        if u8:
            I = I.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        f = Jc[None] * a + Bc * em
        r = jnp.where(mask, I - l * f, 0.0)
        cost_acc += jnp.sum(r * r)
        rl = r * l
        dJ_ref[0, c] += jnp.sum(rl * a, axis=0)  # d I_hat/dJ = l a
        part_ref[0, 0, _I_B + c] += jnp.sum(rl * em)
        part_ref[0, 0, _I_BETA + c] += jnp.sum(rl * (-(Jc[None] * z) * a))
        part_ref[0, 0, _I_GAMMA + c] += jnp.sum(rl * (Bc * z * ex))
        S_dl += r * f
        S_dz += rl * (Bc * gac * ex - Jc[None] * bec * a)
    part_ref[0, 0, 0] += cost_acc

    # l chain: dl/dq = -l/2
    dq = S_dl * (-0.5 * l)
    part_ref[0, 0, _I_ACD + 0] += jnp.sum(dq * px * px)
    part_ref[0, 0, _I_ACD + 1] += jnp.sum(dq * 2.0 * px * py)
    part_ref[0, 0, _I_ACD + 2] += jnp.sum(dq * py * py)
    dpx = dq * (2.0 * A * px + 2.0 * C * py)
    dpy = dq * (2.0 * D * py + 2.0 * C * px)
    # z chain through ||lP||, p chain through lP_xy / lP_z
    izl = S_dz / zl
    dlx = dpx * il + lxs * izl
    dly = dpy * il + lys * izl
    dlz = -(dpx * px + dpy * py) * il + lzs * izl
    for i_, dl_ in enumerate((dlx, dly, dlz)):
        part_ref[0, 0, _I_R + 3 * i_ + 0] += jnp.sum(dl_ * Xs)
        part_ref[0, 0, _I_R + 3 * i_ + 1] += jnp.sum(dl_ * Ys)
        part_ref[0, 0, _I_R + 3 * i_ + 2] += jnp.sum(dl_ * Zs)
        part_ref[0, 0, _I_T + i_] += jnp.sum(dl_)


def prepare_light_obs(cP: jnp.ndarray, I: jnp.ndarray):
    """(V, H, W, 3)/(V, H, W, 3) -> channel-leading padded kernel layout
    ((1, 3, V, Hp, Wp) each). Do ONCE per fit, outside the loop.
    Exactly the batched transform on a singleton target axis — one
    padding/tiling rule, so the two entry points cannot desynchronize."""
    return prepare_light_obs_batched(cP[None], I[None])


def prepare_light_obs_batched(cP: jnp.ndarray, I: jnp.ndarray):
    """Batched layout: (T, V, H, W, 3) -> (T, 3, V, Hp, Wp)."""
    T, V, H, W = cP.shape[:4]
    Wp = -(-W // LANES) * LANES
    th = light_row_tile(Wp)
    Hp = -(-H // th) * th
    Vp = -(-V // VB) * VB
    pad = [(0, 0), (0, 0), (0, Vp - V), (0, Hp - H), (0, Wp - W)]
    cPt = jnp.pad(jnp.moveaxis(cP, -1, 1), pad)
    It = jnp.pad(jnp.moveaxis(I, -1, 1), pad)
    return cPt, It


def light_occupancy(cPt: jnp.ndarray) -> jnp.ndarray:
    """Per-(target, row-tile, view-block) validity flags for the light
    kernel's grid (valid = any cP component nonzero). Compute ONCE per
    fit, outside the iteration loop — cPt is iteration-invariant."""
    T, _, Vp, Hp, Wp = cPt.shape
    th = light_row_tile(Wp)
    occ = (
        (cPt != 0.0)
        .any(axis=1)
        .reshape(T, Vp // VB, VB, Hp // th, th, Wp)
        .any(axis=(2, 4, 5))
    )
    return jnp.moveaxis(occ, 1, 2).astype(jnp.int32)  # (T, n_tiles, Vp//VB)


def _sigma_quad_coeffs(sigma: jnp.ndarray) -> jnp.ndarray:
    """sigma (2, 2) -> (A, C, D): q = A px^2 + 2 C px py + D py^2 equals
    lp^T (sigma^T sigma)^{-1} lp — the EXACT arithmetic of
    models/sucre.py compute_l_z (closed-form 2x2 inverse)."""
    s = sigma
    S00 = s[0, 0] * s[0, 0] + s[1, 0] * s[1, 0]
    S01 = s[0, 0] * s[0, 1] + s[1, 0] * s[1, 1]
    S11 = s[0, 1] * s[0, 1] + s[1, 1] * s[1, 1]
    det = S00 * S11 - S01 * S01
    return jnp.stack([S11 / det, -S01 / det, S00 / det])


def _light_pallas(BBG, aux, cPt, It, Jt, interpret: bool, occ=None):
    """The raw pallas_call over a (T, rows, view-blocks) grid. All inputs
    carry a leading target axis T (the single-target path passes T=1);
    each target's sweep re-zeroes its own dJ/partial blocks because the
    out_specs map blocks per t. ``occ`` (light_occupancy, precomputed
    OUTSIDE the iteration loop) skips empty grid steps; None runs every
    block."""
    T, _, V, Hp, Wp = cPt.shape
    th = light_row_tile(Wp)
    grid = (T, Hp // th, V // VB)
    if occ is None:
        occ = jnp.ones((T, Hp // th, V // VB), jnp.int32)
    return pl.pallas_call(
        partial(_kernel, u8=jnp.issubdtype(It.dtype, jnp.integer)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 9), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 16), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM),
            # whole per-target table resident in SMEM, scalar-indexed by
            # (i, v) — Mosaic SMEM blocks must cover the trailing dims
            pl.BlockSpec(
                (1, Hp // th, V // VB),
                lambda t, i, v: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 3, VB, th, Wp),
                lambda t, i, v: (t, 0, v, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, VB, th, Wp),
                lambda t, i, v: (t, 0, v, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, th, Wp), lambda t, i, v: (t, 0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 3, th, Wp), lambda t, i, v: (t, 0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, _NPART), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 3, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, _NPART), jnp.float32),
        ],
        interpret=interpret,
    )(BBG, aux, occ, cPt, It, Jt)


@partial(jax.jit, static_argnames=("interpret",))
def fused_light_fit_grads_prepared(
    J: jnp.ndarray,  # (H, W, 3) f32 (unpadded)
    B: jnp.ndarray,  # (3,)
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    cam2light: jnp.ndarray,  # (6,)
    sigma: jnp.ndarray,  # (2, 2)
    cPt: jnp.ndarray,  # (1, 3, V, Hp, Wp) from prepare_light_obs
    It: jnp.ndarray,  # (1, 3, V, Hp, Wp)
    occ: jnp.ndarray | None = None,  # (1, n_tiles, V//VB) from light_occupancy
    interpret: bool = False,
):
    """One fused pass: (cost, dJ, dB, dbeta, dgamma, dcam2light, dsigma),
    all unnormalized sums dL/dtheta for L = sum of squared residuals
    (multiply by the 1/(3 n_obs) loss scale outside)."""
    (R_l, t_l), vjp_se3 = jax.vjp(se3_exp, cam2light)
    acd, vjp_sig = jax.vjp(_sigma_quad_coeffs, sigma)

    _, _, V, Hp, Wp = cPt.shape
    H, W = J.shape[:2]
    Jt = jnp.pad(jnp.moveaxis(J, -1, 0), [(0, 0), (0, Hp - H), (0, Wp - W)])[None]
    BBG = jnp.concatenate(
        [B.astype(jnp.float32), beta.astype(jnp.float32), gamma.astype(jnp.float32)]
    )[None, None]
    aux = jnp.concatenate(
        [R_l.reshape(-1), t_l, acd, jnp.zeros((1,), jnp.float32)]
    ).astype(jnp.float32)[None, None]

    dJt, parts = _light_pallas(BBG, aux, cPt, It, Jt, interpret, occ=occ)

    p = parts[0, 0]
    # upstream: dL/dtheta = -2 * sum(r * dI_hat/dtheta)
    k = jnp.float32(-2.0)
    cost = p[0]
    dJ = k * jnp.moveaxis(dJt[0, :, :H, :W], 0, -1)
    dB = k * p[_I_B:_I_B + 3]
    dbeta = k * p[_I_BETA:_I_BETA + 3]
    dgamma = k * p[_I_GAMMA:_I_GAMMA + 3]
    dR = k * p[_I_R:_I_R + 9].reshape(3, 3)
    dt = k * p[_I_T:_I_T + 3]
    (dcam2light,) = vjp_se3((dR, dt))
    (dsigma,) = vjp_sig(k * p[_I_ACD:_I_ACD + 3])
    return cost, dJ, dB, dbeta, dgamma, dcam2light, dsigma


def assemble_light_inputs_batched(B, beta, gamma, cam2light, sigma):
    """Pre-kernel assembly for the batched kernel's packed scalar operands:
    (BBG (T,1,9), aux (T,1,_NAUX), vjp_se3, vjp_sig). The vjps close the
    se3_exp / Sigma^-1 chains outside the kernel; feed the (-2-scaled)
    dR/dt/dacd partial sums back through them (decode_light_partials_batched
    does). Shared by fused_light_fit_grads_batched and the (view x row)
    sharded fit (parallel/mesh.py) so the packed layout lives here only."""
    T = cam2light.shape[0]
    (R_l, t_l), vjp_se3 = jax.vjp(jax.vmap(se3_exp), cam2light)
    acd, vjp_sig = jax.vjp(jax.vmap(_sigma_quad_coeffs), sigma)
    BBG = jnp.concatenate(
        [B.astype(jnp.float32), beta.astype(jnp.float32), gamma.astype(jnp.float32)],
        axis=-1,
    )[:, None]
    aux = jnp.concatenate(
        [R_l.reshape(T, 9), t_l, acd, jnp.zeros((T, 1), jnp.float32)], axis=-1
    ).astype(jnp.float32)[:, None]
    return BBG, aux, vjp_se3, vjp_sig


def decode_light_partials_batched(parts, vjp_se3, vjp_sig):
    """Post-kernel decode of the packed (T, 1, _NPART) partial sums into
    (cost (T,), dB, dbeta, dgamma (T,3), dcam2light (T,6), dsigma (T,2,2)),
    applying the upstream dL/dtheta = -2 sum(r dIhat) factor and closing
    the se3/Sigma chains. dJ is NOT handled here: callers scale their
    (possibly psum'd) dJt by the same -2 themselves."""
    T = parts.shape[0]
    p = parts[:, 0]  # (T, _NPART)
    k = jnp.float32(-2.0)
    cost = p[:, 0]
    dB = k * p[:, _I_B:_I_B + 3]
    dbeta = k * p[:, _I_BETA:_I_BETA + 3]
    dgamma = k * p[:, _I_GAMMA:_I_GAMMA + 3]
    dR = k * p[:, _I_R:_I_R + 9].reshape(T, 3, 3)
    dt = k * p[:, _I_T:_I_T + 3]
    (dcam2light,) = vjp_se3((dR, dt))
    (dsigma,) = vjp_sig(k * p[:, _I_ACD:_I_ACD + 3])
    return cost, dB, dbeta, dgamma, dcam2light, dsigma


@partial(jax.jit, static_argnames=("interpret",))
def fused_light_fit_grads_batched(
    J: jnp.ndarray,  # (T, H, W, 3)
    B: jnp.ndarray,  # (T, 3)
    beta: jnp.ndarray,  # (T, 3)
    gamma: jnp.ndarray,  # (T, 3)
    cam2light: jnp.ndarray,  # (T, 6)
    sigma: jnp.ndarray,  # (T, 2, 2)
    cPt: jnp.ndarray,  # (T, 3, V, Hp, Wp) from prepare_light_obs_batched
    It: jnp.ndarray,  # (T, 3, V, Hp, Wp)
    occ: jnp.ndarray | None = None,  # (T, n_tiles, V//VB) from light_occupancy
    interpret: bool = False,
):
    """Batched-target variant: each target sweeps its own grid slice
    (same kernel, grid leading axis = T). Returns per-target leaves:
    cost (T,), dJ (T, H, W, 3), dB/dbeta/dgamma (T, 3),
    dcam2light (T, 6), dsigma (T, 2, 2)."""
    BBG, aux, vjp_se3, vjp_sig = assemble_light_inputs_batched(
        B, beta, gamma, cam2light, sigma
    )

    _, _, V, Hp, Wp = cPt.shape
    H, W = J.shape[1:3]
    Jt = jnp.pad(
        jnp.moveaxis(J, -1, 1), [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)]
    )

    dJt, parts = _light_pallas(BBG, aux, cPt, It, Jt, interpret, occ=occ)

    cost, dB, dbeta, dgamma, dcam2light, dsigma = decode_light_partials_batched(
        parts, vjp_se3, vjp_sig
    )
    dJ = jnp.float32(-2.0) * jnp.moveaxis(dJt[:, :, :H, :W], 1, -1)
    return cost, dJ, dB, dbeta, dgamma, dcam2light, dsigma


def fused_light_fit_grads(J, B, beta, gamma, cam2light, sigma, cP, I, interpret=False):
    """Convenience wrapper over unprepared (V, H, W, 3) inputs."""
    cPt, It = prepare_light_obs(cP, I)
    return fused_light_fit_grads_prepared(
        J, B, beta, gamma, cam2light, sigma, cPt, It,
        occ=light_occupancy(cPt), interpret=interpret
    )
