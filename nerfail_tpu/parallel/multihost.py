"""Multi-host utilities: process-local data → global sharded arrays.

The reference is strictly single-process (SURVEY.md §2.6). For pod-slice
runs, each host loads its shard of views/rays locally and assembles global
`jax.Array`s without gathering through host 0 — the input-pipeline pattern
for 400×800² images + [H,W,8] neighbor tables (SURVEY.md §7 "multi-host
input pipeline").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op in single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_to_global(
    mesh: Mesh, local_batch: np.ndarray, axis: str = "data"
) -> jax.Array:
    """Assemble a globally-sharded array from per-process local shards.

    Each process passes its local slice of the leading dim; the result is
    one jax.Array sharded over `axis` with no cross-host copy of the full
    tensor. Single-process: equivalent to a device_put with sharding.
    """
    spec = P(axis, *([None] * (local_batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_batch), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch)
    )


def process_view_slice(n_views: int) -> slice:
    """Which views this process should load (contiguous split)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = (n_views + pc - 1) // pc
    return slice(pi * per, min((pi + 1) * per, n_views))
