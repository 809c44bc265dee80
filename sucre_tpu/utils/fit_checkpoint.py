"""Mid-run fit checkpointing: (params, opt_state, iteration) snapshots.

The reference's only resume mechanisms are the matches cache and a
parameter warm start (sucre.py:179-195, 206-207) — a killed 200-iteration
run replays from iteration 0 with fresh Adam moments. This module
serializes the complete solver state as a flat .npz (pytree leaves keyed
by path), so an interrupted fit resumes exactly where it stopped.

Format: one file ``fit_state_<iteration>.npz`` per snapshot inside the
checkpoint directory; the latest (highest iteration) wins; writes go via
a temp file + rename so a crash never leaves a half-written latest.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_fit_state(ckpt_dir: Path | str, iteration: int, params, opt_state) -> Path:
    """Atomically write a solver-state snapshot."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    for name, tree in (("params", params), ("opt", opt_state)):
        for k, v in _flatten(tree).items():
            arrays[f"{name}|{k}"] = v
    arrays["iteration"] = np.int64(iteration)
    path = ckpt_dir / f"fit_state_{iteration:06d}.npz"
    tmp = ckpt_dir / f".tmp_{os.getpid()}_{iteration}.npz"
    np.savez(tmp, **arrays)
    tmp.rename(path)
    return path


def latest_fit_state(ckpt_dir: Path | str) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    snaps = sorted(ckpt_dir.glob("fit_state_*.npz"))
    return snaps[-1] if snaps else None


def load_fit_state(path: Path | str, params_like, opt_state_like):
    """Restore (iteration, params, opt_state) matching the given pytree
    structures (shape/dtype-checked leaf by leaf)."""
    import jax.numpy as jnp

    with np.load(path) as f:
        arrays = {k: f[k] for k in f.files}
    iteration = int(arrays.pop("iteration"))

    # Structure gate BEFORE any leaf loads: a checkpoint from a run with
    # different fit flags (e.g. --light-model toggled, direct vs
    # closed-form) has a different key set. Loading the overlap would
    # silently resume a DIFFERENT objective at iteration N with foreign
    # Adam moments; a missing key would raise a bare KeyError. Fail with
    # the actionable difference instead.
    expected = {
        f"{name}|{k}"
        for name, tree in (("params", params_like), ("opt", opt_state_like))
        for k in _flatten(tree)
    }
    stored_keys = set(arrays)
    if stored_keys != expected:
        raise ValueError(
            f"checkpoint {path} does not match this fit configuration: "
            f"missing {sorted(expected - stored_keys) or 'none'}, "
            f"unexpected {sorted(stored_keys - expected) or 'none'} — "
            f"resume with the original flags or clear the checkpoint dir"
        )

    def rebuild(name, tree_like):
        flat_like = _flatten(tree_like)
        leaves_like, treedef = jax.tree_util.tree_flatten(tree_like)
        keys = list(flat_like.keys())
        if len(keys) != len(leaves_like):
            raise ValueError(
                f"pytree path keys collide for {name}: {len(keys)} unique "
                f"keys for {len(leaves_like)} leaves"
            )
        new_leaves = []
        for key, like in zip(keys, leaves_like):
            stored = arrays[f"{name}|{key}"]
            if stored.shape != np.asarray(like).shape:
                raise ValueError(
                    f"checkpoint leaf {name}|{key} shape {stored.shape} != "
                    f"expected {np.asarray(like).shape}"
                )
            new_leaves.append(jnp.asarray(stored, dtype=np.asarray(like).dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    return iteration, rebuild("params", params_like), rebuild("opt", opt_state_like)
