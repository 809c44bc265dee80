"""Multi-host execution helpers (DCN tier of SURVEY.md §2.3).

The workload's natural multi-host decomposition is target-level: each
host restores a disjoint slice of the survey's target images (pure data
parallelism over the ``--image-list`` loop — no cross-host communication
during a restore), while that host's local chips cooperate on each image
over ICI via the (view, row) mesh or the target batch of
``parallel.batch``.

``jax.distributed`` is initialized once per process; ``shard_targets``
splits the target list deterministically by process index. A survey run
across an N-host pod is then simply:

    initialize_distributed()            # env-driven coordinator discovery
    mine = shard_targets(all_targets)
    restore_many(scene, mine, out_dir, cfg)

No collective crosses DCN: artifacts land in the (shared or per-host)
output directory, and the matches-cache lifecycle is already
file-granular and idempotent, so host failures re-run only their own
targets.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op when already initialized).

    Arguments default to the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables (jax's own
    auto-discovery only covers managed clusters like SLURM), falling
    back to jax.distributed's cluster detection when unset."""
    if jax.distributed.is_initialized():
        return
    # Multi-process CPU (tests, virtual meshes) needs a cross-process
    # collectives backend for the client to register as multi-node.
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    if "cpu" in platforms or not platforms:
        # unset platforms auto-selects a backend (often CPU); the gloo
        # impl only affects the CPU backend's collectives and is
        # required for a CPU client to register as multi-node, so set it
        # whenever CPU may be the chosen backend
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def shard_targets(targets: list, process_id: int | None = None,
                  num_processes: int | None = None) -> list:
    """Deterministic strided split of the target list across hosts.

    Strided (not blocked) so heterogeneous image difficulty spreads
    evenly across hosts.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return targets[pid::n]
