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

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op when already initialized or when
    running single-process). Arguments default to JAX's standard
    environment-based discovery (JAX_COORDINATOR_ADDRESS etc.)."""
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
