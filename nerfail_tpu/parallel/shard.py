"""Sharding specs for NeRF params and batches.

Tensor-parallel layout for the MLP (SURVEY.md §5, §7): hidden width on the
"model" axis, so each layer is a local matmul over a width shard; XLA
inserts the reduce where a sharded-contraction meets a replicated output.
Ray batches ride the "data" axis; gradients all-reduce (`psum`) over it —
inserted automatically by XLA from the sharding annotations, riding ICI.

  pts_i_w   [in, W]   → P(None, "model")     (column parallel)
  pts_i_b   [W]       → P("model")
  feature_w [W, W]    → P(None, "model")
  alpha_w   [W, 1]    → P("model", None)     (row parallel → psum)
  views_w   [W+v, W/2]→ P(None, "model")
  rgb_w     [W/2, 3]  → P("model", None)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def nerf_param_pspec(name: str) -> P:
    if name.endswith("_b"):
        # biases of width-sharded layers
        if name.startswith(("pts_", "feature", "views")):
            return P("model")
        return P(None)
    if name.startswith("pts_") or name in ("feature_w", "views_w"):
        return P(None, "model")
    if name in ("alpha_w", "rgb_w", "output_w"):
        return P("model", None)
    return P(None)


def shard_nerf_params(mesh: Mesh, params: Dict[str, jnp.ndarray]):
    """device_put each param with its tensor-parallel NamedSharding."""
    def put(name, p):
        spec = nerf_param_pspec(name)
        # don't shard dims that don't divide (tiny test configs)
        axes = list(spec)
        for d, ax in enumerate(axes):
            if ax is not None and p.shape[d] % mesh.shape.get(ax, 1) != 0:
                axes[d] = None
        return jax.device_put(p, NamedSharding(mesh, P(*axes)))

    return {k: put(k, v) for k, v in params.items()}


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data"):
    """Shard leading dim of every leaf over the data axis."""
    def put(x):
        if x.ndim == 0 or x.shape[0] % mesh.shape.get(axis, 1) != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def constrain_data(x: jnp.ndarray, mesh: Mesh, axis: str = "data"):
    """with_sharding_constraint on the leading (ray) dim."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
