"""Distance → Gaussian splat weights.

Matches `create_gauss_w` (model/GaussNet.py:161-186) driven by
tools/dist_to_weight.py:80-97:

    w_j   = exp(-(d_j / c)² / 2),  c = 0.02
    W     = Σ_j w_j over the k neighbors
    out_j = w_j / (W + 0.001)   where W > 0, else 0

A pure elementwise VPU op; runs fused on whole [H, W, k] maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def gauss_weights(
    dist: jnp.ndarray, c: float = 0.02, eps: float = 0.001
) -> jnp.ndarray:
    w = jnp.exp(-((dist / c) ** 2) / 2.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    out = w / (wsum + eps)
    return jnp.where(wsum > 0.0, out, jnp.zeros_like(out))


def mean_sq_distance(dist: jnp.ndarray) -> jnp.ndarray:
    """The 'v' diagnostic dist_to_weight.py prints (:93-100)."""
    return jnp.mean(dist ** 2)
