"""The SUCRe underwater image-formation model as pure functions on pytrees.

Model (parity: sucre.py:35-121):

    I_hat = l * (J * exp(-beta * z) + B * (1 - exp(-gamma * z)))

with per-pixel restored color J, global 3-channel parameters B
(backscatter veil), beta (attenuation), gamma (backscatter coefficient),
z the camera-to-point range of the *observing* camera (z = ||cP||,
sucre.py:53), and l an optional artificial-light vignetting factor
(sucre.py:52-64): for camera-to-light pose exp(cam2light) and footprint
Sigma = sigma^T sigma,

    lP = R_l cP + t_l,  lp = lP_xy / lP_z,
    l = exp(-lp^T Sigma^{-1} lp / 2),  z = ||cP|| + ||lP||.

Because observations are laid out dense on the target pixel grid
(V, H, W), the torch J[v, u] gather (sucre.py:81) becomes a broadcast of
J (H, W, 3) against the view axis, and the closed-form J scatter-add
(sucre.py:69-77) becomes a masked reduction over views — no
gather/scatter anywhere; XLA fuses the whole model into a few
elementwise passes over the observation stack.

Internal invariant: arrays are always finite. The reference parks NaNs
in J at depth-invalid pixels (sucre.py:47-50) and lets 0/0 produce NaN
in the closed form (sucre.py:77); here validity is an explicit mask and
NaNs are materialized only at export (``restored_image_nan``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sucre_tpu.ops.matching import DenseObs, to_f32_rgb
from sucre_tpu.ops.se3 import se3_exp, transform_points


class SucreParams(NamedTuple):
    """Learnable parameters; a JAX pytree (None = absent subtree).

    ``J`` is present in direct mode (co-optimized, sucre.py:47-50) and
    None in closed-form mode (recomputed each iteration, sucre.py:66-77).
    ``cam2light``/``sigma`` are present only with the light model.
    """

    B: jnp.ndarray  # (3,)
    beta: jnp.ndarray  # (3,)
    gamma: jnp.ndarray  # (3,)
    J: jnp.ndarray | None = None  # (H, W, 3)
    cam2light: jnp.ndarray | None = None  # (6,) twist
    sigma: jnp.ndarray | None = None  # (2, 2)


def init_params(
    *,
    image: jnp.ndarray | None = None,
    light_model: bool = False,
    use_closed_form: bool = False,
) -> SucreParams:
    """Reference init (sucre.py:41-50): B = beta = gamma = 0.1; with the
    light model cam2light = 0, sigma = I2; in direct mode J = raw image
    (invalid pixels handled by masks, not NaNs)."""
    p = SucreParams(
        B=jnp.full((3,), 0.1, jnp.float32),
        beta=jnp.full((3,), 0.1, jnp.float32),
        gamma=jnp.full((3,), 0.1, jnp.float32),
    )
    if light_model:
        p = p._replace(
            cam2light=jnp.zeros((6,), jnp.float32), sigma=jnp.eye(2, dtype=jnp.float32)
        )
    if not use_closed_form:
        if image is None:
            raise ValueError("direct mode requires the raw image for J init")
        p = p._replace(J=jnp.asarray(image, jnp.float32))
    return p


def compute_l_z(
    params: SucreParams, cP: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray | float, jnp.ndarray]:
    """Vignetting factor l and range z for observations cP (..., 3).

    Parity: sucre.py:52-64. ``valid`` guards the norm at zero-filled
    invalid entries (double-where so masked entries contribute zero
    gradient instead of NaN).
    """
    cP_safe = jnp.where(valid[..., None], cP, 1.0)
    z = jnp.sqrt(jnp.sum(cP_safe * cP_safe, axis=-1))
    if params.cam2light is None:
        return 1.0, jnp.where(valid, z, 0.0)
    R_l, t_l = se3_exp(params.cam2light)
    lP = transform_points(R_l, t_l, cP_safe)
    lP_safe = jnp.where(valid[..., None], lP, 1.0)
    lpx = lP_safe[..., 0] / lP_safe[..., 2]
    lpy = lP_safe[..., 1] / lP_safe[..., 2]
    # Sigma = sigma^T sigma; closed-form 2x2 inverse (sucre.py:54-58)
    s = params.sigma
    S00 = s[0, 0] * s[0, 0] + s[1, 0] * s[1, 0]
    S01 = s[0, 0] * s[0, 1] + s[1, 0] * s[1, 1]
    S11 = s[0, 1] * s[0, 1] + s[1, 1] * s[1, 1]
    det = S00 * S11 - S01 * S01
    # quadratic form lp^T Sigma^{-1} lp
    q = (S11 * lpx * lpx - 2.0 * S01 * lpx * lpy + S00 * lpy * lpy) / det
    l = jnp.exp(-q / 2.0)
    z = z + jnp.sqrt(jnp.sum(lP_safe * lP_safe, axis=-1))
    return jnp.where(valid, l, 0.0), jnp.where(valid, z, 0.0)


def obs_l_z(params: SucreParams, obs: DenseObs) -> tuple[jnp.ndarray | float, jnp.ndarray]:
    """(l, z) for an observation stack in either layout.

    The compact (z-only) layout is valid only without the light model —
    the vignetting factor needs the full 3D point.
    """
    if params.cam2light is not None:
        if obs.cP is None:
            raise ValueError(
                "light model requires the full (cP) observation layout; "
                "build observations with compact=False"
            )
        return compute_l_z(params, obs.cP, obs.valid)
    if obs.z is not None:
        return 1.0, obs.z
    return compute_l_z(params, obs.cP, obs.valid)


def formation_from_lz(
    params: SucreParams, J: jnp.ndarray, l, z: jnp.ndarray
) -> jnp.ndarray:
    """I_hat = l * (J * exp(-beta z) + B * (1 - exp(-gamma z)));
    broadcasts J (H, W, 3) against leading view axes (sucre.py:79-82)."""
    z = z[..., None]
    if not isinstance(l, float):
        l = l[..., None]
    absorption = jnp.exp(-params.beta * z)
    backscatter = params.B * (1.0 - jnp.exp(-params.gamma * z))
    return l * (J * absorption + backscatter)


def formation_forward(
    params: SucreParams, J: jnp.ndarray, cP: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Predicted observed color I_hat from full 3D points (..., 3).

    ``J`` is passed explicitly so closed-form mode can inject the
    recomputed (stop-gradient) image.
    """
    l, z = compute_l_z(params, cP, valid)
    return formation_from_lz(params, J, l, z)


def residual_loss(
    params: SucreParams,
    J: jnp.ndarray,
    obs: DenseObs,
    n_obs: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(normalized_loss, raw_cost) over an observation stack.

    raw_cost = sum over valid observations of (I - I_hat)^2 — the
    telemetry "cost" (sucre.py:144-149); normalized = cost / n_obs / 3,
    the actual objective (sucre.py:146). ``obs.I`` may be uint8 — the
    /255 conversion fuses here (exact parity with the f32 decode).
    """
    l, z = obs_l_z(params, obs)
    I_hat = formation_from_lz(params, J, l, z)
    sq = jnp.square(to_f32_rgb(obs.I) - I_hat)
    cost = jnp.sum(jnp.where(obs.valid[..., None], sq, 0.0))
    # max(n_obs, 1): an all-invalid stack (a skipped batched target) has
    # cost exactly 0 — 0/0 would NaN the loss and, through autodiff, the
    # gradients (fatal for joint fits, where grads sum across targets)
    return cost / jnp.maximum(n_obs, 1) / 3.0, cost


def closed_form_terms(
    params: SucreParams, obs: DenseObs
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (numerator, denominator) partial sums over the view axis
    of an observation stack — accumulate across chunks, then divide."""
    l, z = obs_l_z(params, obs)
    z = z[..., None]
    if not isinstance(l, float):
        l = l[..., None]
    a = l * jnp.exp(-params.beta * z)
    bs = l * params.B * (1.0 - jnp.exp(-params.gamma * z))
    mask = obs.valid[..., None]
    num = jnp.sum(jnp.where(mask, a * (to_f32_rgb(obs.I) - bs), 0.0), axis=0)
    den = jnp.sum(jnp.where(mask, a * a, 0.0), axis=0)
    return num, den


def closed_form_J(
    params: SucreParams, obs: DenseObs
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel weighted least-squares J given current global params.

    For fixed (B, beta, gamma): each observation is I ≈ a*J + bs with
    a = l*exp(-beta z), bs = l*B*(1-exp(-gamma z)); the minimizer is
    J = Σ a (I − bs) / Σ a² over the view axis (sucre.py:66-77 — the
    torch scatter-add becomes a masked reduction in the dense layout).

    Returns (J, observed) where observed marks pixels with at least one
    observation; J is 0 where unobserved (reference leaves 0/0 = NaN —
    materialized at export only).
    """
    num, den = closed_form_terms(params, obs)
    pos = den > 0  # per-channel, but a > 0 wherever valid => identical channels
    J = jnp.where(pos, num / jnp.where(pos, den, 1.0), 0.0)
    observed = jnp.any(pos, axis=-1)  # (H, W)
    return J, observed


def restored_image_nan(J: jnp.ndarray, observed_or_valid: jnp.ndarray) -> jnp.ndarray:
    """Export view of J with NaN at unobserved/invalid pixels (parity with
    the reference's NaN-carrying J, sucre.py:47-50, 77)."""
    return jnp.where(observed_or_valid, J, jnp.nan)
