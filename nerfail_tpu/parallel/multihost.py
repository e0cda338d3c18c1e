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


def replicate_global(mesh: Mesh, tree):
    """Replicate host-local data onto every device of a (possibly
    multi-process) mesh.

    The NeRF train step gathers pixels from the full image stack inside
    jit, so the image/pose feed must be replicated — single-process via
    device_put, multi-process via `make_array_from_process_local_data`
    (every process holds the full copy locally, no host-0 gather).
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)


def process_view_slice(n_views: int) -> slice:
    """Which views this process should load (contiguous split)."""
    pc, pi = jax.process_count(), jax.process_index()
    return view_slice_for(n_views, pc, pi)


def view_slice_for(n_views: int, process_count: int, process_index: int
                   ) -> slice:
    """Pure slicing math behind `process_view_slice` (unit-testable without
    a real multi-process runtime)."""
    per = (n_views + process_count - 1) // process_count
    return slice(
        process_index * per, min((process_index + 1) * per, n_views)
    )
