"""Fused formation-model forward+backward Pallas kernel (no-light mode).

The fit's hot loop evaluates, per observation and channel,

    a = exp(-beta z),  e = 1 - exp(-gamma z),  I_hat = J a + B e,
    r = I - I_hat,     cost = sum r^2,

and needs gradients d(cost)/d{J, B, beta, gamma}:

    dJ     = sum_V  g a          (per pixel)        g = -2 r
    dB     = sum    g e
    dbeta  = sum   -g J z a
    dgamma = sum    g B z exp(-gamma z)

XLA's autodiff materializes the forward residuals and re-reads the
stack for the backward pass; this kernel computes cost + all gradients
in ONE pass over the compact observation layout (z f32 + I u8), reading
each observation's 7 bytes exactly once per iteration and accumulating
dJ tiles in VMEM across the view axis.

Grid: (T targets, H/TH row tiles, V views) — views iterate innermost,
so the J / dJ / partial-sum blocks stay resident in VMEM/SMEM for a
whole view sweep (their index maps are constant in v) and are written
back once per row tile. Validity is implicit: z == 0 marks
invalid/padded entries (depth > 0 guarantees z > 0 for real
observations).

Scaling by the 1/(3 n_obs) loss normalization happens outside (the
gradients are linear in the upstream cotangent). On-chip the kernel is
transcendental-bound (6 VPU exps per observation), ~1.3x over XLA's
two-pass autodiff at bench shapes; its bigger win is halving peak HBM
traffic and never materializing forward residuals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 32  # default row-tile height (u8 min sublane tile)
VB = 4  # views processed per grid step (amortizes per-step overhead)
LANES = 128


def row_tile(Wp: int) -> int:
    """Row-tile height for a given padded width: the kernel's VMEM
    working set scales with VB*TH*Wp (z/I blocks + ~8 live per-channel
    f32 temporaries), and the ~16 MB scoped-VMEM budget overflows past
    1024 lanes at TH=32 — shrink the tile as images widen. 16 is the
    floor (u8 blocks below 16 sublanes are sub-tile for Mosaic); wider
    images are unsupported by the kernel, see kernel_supported."""
    return TH if Wp <= 1024 else 16


def kernel_supported(W: int) -> bool:
    """Whether the fused kernel's tiling fits scoped VMEM at this image
    width (padded to lanes). Past 2048 lanes the row tile would need to
    drop below the u8 sublane tile — callers fall back to the XLA
    autodiff path instead (correct at any size, ~2x slower)."""
    return -(-W // LANES) * LANES <= 2048

# packed partial-sum layout: [cost, dB(3), dbeta(3), dgamma(3), pad...]
_NPART = 16


def _kernel(B_ref, beta_ref, gamma_ref, occ_ref, z_ref, I_ref, J_ref, dJ_ref, part_ref, *, u8: bool):
    i = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _():
        dJ_ref[:] = jnp.zeros_like(dJ_ref)

    # The partial-sum block is resident for this target's whole sweep
    # (index map constant in i and v): initialize at the first step.
    # SMEM stores are scalar-only, hence the unrolled loop.
    @pl.when((v == 0) & (i == 0))
    def _():
        for k in range(_NPART):
            part_ref[0, 0, k] = jnp.float32(0.0)

    # Block occupancy (see ``occupancy``): empty (row-tile, view-block)
    # pairs contribute exactly zero to every accumulator, so skip their
    # VPU work entirely — on partial-overlap survey stacks (a transect's
    # sliver views) most blocks of most kept views are empty, and the
    # kernel is VPU-bound, not DMA-bound.
    @pl.when(occ_ref[0, i, v] > 0)
    def _():
        z = z_ref[0]  # (VB, TH, Wp)
        mask = z > 0.0
        cost_acc = jnp.float32(0.0)
        for c in range(3):
            Bc = B_ref[0, 0, c]
            bec = beta_ref[0, 0, c]
            gac = gamma_ref[0, 0, c]
            Jc = J_ref[0, c]  # (TH, Wp), broadcasts over the VB axis
            a = jnp.exp(-bec * z)
            ex = jnp.exp(-gac * z)
            em = 1.0 - ex
            I = I_ref[0, c]  # (VB, TH, Wp)
            if u8:
                # Mosaic lacks a direct u8->f32 cast; hop through int32.
                I = I.astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
            I_hat = Jc[None] * a + Bc * em
            r = jnp.where(mask, I - I_hat, 0.0)
            g = -2.0 * r  # masked through r
            dJ_ref[0, c] += jnp.sum(g * a, axis=0)
            cost_acc += jnp.sum(r * r)
            part_ref[0, 0, 1 + c] += jnp.sum(g * em)
            part_ref[0, 0, 4 + c] += jnp.sum(-g * (Jc[None] * z) * a)
            part_ref[0, 0, 7 + c] += jnp.sum(g * Bc * z * ex)
        part_ref[0, 0, 0] += cost_acc


def occupancy(zt: jnp.ndarray) -> jnp.ndarray:
    """Per-(target, row-tile, view-block) validity flags (i32 0/1) for
    the kernel's grid: blocks with no valid observation (z == 0
    everywhere) are skipped. Compute ONCE per fit, outside the iteration
    loop — zt is iteration-invariant, and the reduction reads the z
    stack once (about half of one kernel iteration's traffic)."""
    T, Vp, Hp, Wp = zt.shape
    th = row_tile(Wp)
    occ = (
        (zt > 0)
        .reshape(T, Vp // VB, VB, Hp // th, th, Wp)
        .any(axis=(2, 4, 5))
    )
    return jnp.moveaxis(occ, 1, 2).astype(jnp.int32)  # (T, n_tiles, Vp//VB)


def prepare_obs(z: jnp.ndarray, I: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-time kernel layout transform: pad to tile multiples and move
    channels leading. Do this ONCE per fit, outside the iteration loop.

    Accepts single-target (V, H, W)/(V, H, W, 3) or batched
    (T, V, H, W)/(T, V, H, W, 3) arrays; returns (zt, It) with shapes
    (T, V, Hp, Wp) and (T, 3, V, Hp, Wp) (T=1 for single).
    """
    if z.ndim == 3:
        z = z[None]
        I = I[None]
    T, V, H, W = z.shape
    Wp = -(-W // LANES) * LANES
    th = row_tile(Wp)
    Hp = -(-H // th) * th
    Vp = -(-V // VB) * VB
    zt = jnp.pad(z, [(0, 0), (0, Vp - V), (0, Hp - H), (0, Wp - W)])
    It = jnp.pad(
        jnp.moveaxis(I, -1, 1),
        [(0, 0), (0, 0), (0, Vp - V), (0, Hp - H), (0, Wp - W)],
    )
    return zt, It


@partial(jax.jit, static_argnames=("interpret",))
def fused_fit_grads_prepared(
    J: jnp.ndarray,  # (T, H, W, 3) f32 (unpadded) — or (H, W, 3)
    B: jnp.ndarray,  # (T, 3) or (3,)
    beta: jnp.ndarray,
    gamma: jnp.ndarray,
    zt: jnp.ndarray,  # (T, V, Hp, Wp) f32 from prepare_obs
    It: jnp.ndarray,  # (T, 3, V, Hp, Wp) u8/f32 from prepare_obs
    occ: jnp.ndarray | None = None,  # (T, n_tiles, V//VB) i32 from occupancy
    interpret: bool = False,
):
    """One fused pass on pre-transformed observations: returns
    (cost (T,), dJ (T,H,W,3), dB (T,3), dbeta, dgamma) — unnormalized
    (multiply by the per-target loss scale outside). Leading T axes are
    squeezed away if the inputs were single-target.

    ``occ`` (see ``occupancy``) marks which (target, row-tile,
    view-block) grid steps hold any valid observation; empty blocks skip
    their VPU work. Pass it precomputed from OUTSIDE the iteration loop
    — computing it here per call would re-read the z stack every
    iteration. None runs every block (identical results)."""
    single = J.ndim == 3
    if single:
        J = J[None]
        B, beta, gamma = B[None], beta[None], gamma[None]
    T, V, Hp, Wp = zt.shape
    H, W = J.shape[1:3]
    Jt = jnp.pad(jnp.moveaxis(J, -1, 1), [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)])

    th = row_tile(Wp)
    n_tiles = Hp // th
    grid = (T, n_tiles, V // VB)
    if occ is None:
        occ = jnp.ones((T, n_tiles, V // VB), jnp.int32)

    dJt, parts = pl.pallas_call(
        partial(_kernel, u8=jnp.issubdtype(It.dtype, jnp.integer)),
        grid=grid,
        in_specs=[
            # (1, 1, 3) blocks match the trailing array dims exactly, which
            # satisfies the TPU block-divisibility rule for any T.
            pl.BlockSpec((1, 1, 3), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda t, i, v: (t, 0, 0), memory_space=pltpu.SMEM),
            # whole per-target table resident in SMEM (n_tiles*V/VB i32,
            # a few KB), scalar-indexed by (i, v): Mosaic requires SMEM
            # blocks to cover the trailing array dims exactly
            pl.BlockSpec(
                (1, n_tiles, V // VB),
                lambda t, i, v: (t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, VB, th, Wp), lambda t, i, v: (t, v, i, 0), memory_space=pltpu.VMEM
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
    )(
        B.astype(jnp.float32)[:, None],
        beta.astype(jnp.float32)[:, None],
        gamma.astype(jnp.float32)[:, None],
        occ,
        zt,
        It,
        Jt,
    )

    parts = parts[:, 0]
    dJ = jnp.moveaxis(dJt[:, :, :H, :W], 1, -1)
    cost = parts[:, 0]
    dB = parts[:, 1:4]
    dbeta = parts[:, 4:7]
    dgamma = parts[:, 7:10]
    if single:
        return cost[0], dJ[0], dB[0], dbeta[0], dgamma[0]
    return cost, dJ, dB, dbeta, dgamma



def fused_fit_grads(J, B, beta, gamma, z, I, interpret: bool = False):
    """Convenience wrapper over unprepared (V, H, W)/(V, H, W, 3) inputs."""
    zt, It = prepare_obs(z, I)
    return fused_fit_grads_prepared(
        J, B, beta, gamma, zt, It, occ=occupancy(zt), interpret=interpret
    )
