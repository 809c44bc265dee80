"""Parameter checkpoints: native .npz plus torch-.pt interop.

The reference saves ``{state_dict..., 'J'}`` to ``<name>.pt``
(sucre.py:213-215) and warm-starts with ``load_state_dict(...,
strict=False)`` (sucre.py:206-207). This module writes/reads both:

  - ``.npz`` (native): keys B, beta, gamma (3,), optional J (H, W, 3,
    NaN at invalid pixels), cam2light (6,), sigma (2, 2).
  - ``.pt`` (interop): torch tensors with the reference's exact key
    names and shapes (B/beta/gamma as (3, 1)) — files are loadable by
    the reference and vice versa.

Loading merges present keys into the given params (strict=False
semantics: missing keys keep their values; unknown keys are ignored;
shape mismatches raise).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from sucre_tpu.models.sucre import SucreParams


def save_params(
    path: Path | str,
    params: SucreParams,
    J: np.ndarray | None = None,
    valid: np.ndarray | None = None,
) -> None:
    """Write params (+ final J with NaN at invalid pixels) to .npz or .pt.

    ``J``/``valid`` override ``params.J`` for the exported restored image
    (closed-form mode has no J leaf; direct mode NaN-masks at export).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)  # nested image names
    # One batched device->host fetch (per-leaf np.asarray would pay the
    # transfer latency once per array).
    import jax

    params = SucreParams(*jax.device_get(tuple(params)))
    J_out = J if J is not None else params.J
    if J_out is not None:
        J_out = np.asarray(J_out, np.float32).copy()
        if valid is not None:
            J_out[~np.asarray(valid, bool)] = np.nan

    arrays: dict[str, np.ndarray] = {
        "B": np.asarray(params.B, np.float32),
        "beta": np.asarray(params.beta, np.float32),
        "gamma": np.asarray(params.gamma, np.float32),
    }
    if J_out is not None:
        arrays["J"] = J_out
    if params.cam2light is not None:
        arrays["cam2light"] = np.asarray(params.cam2light, np.float32)
    if params.sigma is not None:
        arrays["sigma"] = np.asarray(params.sigma, np.float32)

    # Atomic write (temp + replace): a kill mid-write must not leave a
    # truncated checkpoint at the final path — resume features
    # (--skip-existing, warm starts) treat existence as completeness.
    import os

    tmp = path.with_name(path.name + ".tmp")
    if path.suffix == ".pt":
        import torch

        out = {}
        for k, v in arrays.items():
            t = torch.from_numpy(np.ascontiguousarray(v).copy())
            if k in ("B", "beta", "gamma"):
                t = t.reshape(3, 1)  # reference parameter shape (sucre.py:41-43)
            out[k] = t
        torch.save(out, tmp)
    else:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
    os.replace(tmp, path)


def load_params(path: Path | str, params: SucreParams) -> SucreParams:
    """Merge a checkpoint into ``params`` (strict=False warm start)."""
    path = Path(path)
    if path.suffix == ".pt":
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        arrays = {k: v.numpy() for k, v in raw.items()}
    else:
        with np.load(path) as f:
            arrays = {k: f[k] for k in f.files}

    import jax.numpy as jnp

    updates: dict[str, jnp.ndarray] = {}
    for key in ("B", "beta", "gamma"):
        if key in arrays:
            updates[key] = jnp.asarray(arrays[key], jnp.float32).reshape(3)
    if "J" in arrays and params.J is not None:
        J = np.asarray(arrays["J"], np.float32)
        if J.shape != tuple(params.J.shape):
            raise ValueError(
                f"J shape mismatch: checkpoint {J.shape} vs params {tuple(params.J.shape)}"
            )
        # NaN-carrying reference checkpoints: keep current values there
        # (invalid pixels are tracked by masks, not NaNs, internally).
        J = np.where(np.isnan(J), np.asarray(params.J, np.float32), J)
        updates["J"] = jnp.asarray(J)
    if "cam2light" in arrays and params.cam2light is not None:
        updates["cam2light"] = jnp.asarray(arrays["cam2light"], jnp.float32).reshape(6)
    if "sigma" in arrays and params.sigma is not None:
        updates["sigma"] = jnp.asarray(arrays["sigma"], jnp.float32).reshape(2, 2)
    return params._replace(**updates)
