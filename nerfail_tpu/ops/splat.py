"""Differentiable 8-NN Gaussian splat: point-set RGBA → per-pixel RGBA.

The heart of every attack iteration (reference GaussNet.py:60-119): each
pixel gathers its 8 nearest point-set entries and blends them with
precomputed Gaussian weights. The backward pass is the transpose — a
scatter-add of pixel gradients into the point tensor with 8-way index
collisions (SURVEY.md §7 "hard parts").

Forward: one gather + weighted sum (`jnp.take` + einsum); XLA fuses the
multiply-accumulate. Backward: we define a custom VJP that computes
dL/d(points) as a dense one-hot matmul-free `segment_sum` over the flattened
(pixel, neighbor) pairs — sorted-segment-sum lowers to an efficient
deterministic scatter on TPU, far better than 5.1M serialized scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def splat_gather(points: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray):
    """points [M, C], idx [..., k] int32, w [..., k] → [..., C].

    out = Σ_j w_j · points[idx_j]
    """
    return _splat_fwd_impl(points, idx, w)


def _splat_fwd_impl(points, idx, w):
    gathered = jnp.take(points, idx, axis=0)          # [..., k, C]
    return jnp.sum(w[..., None] * gathered, axis=-2)  # [..., C]


def _splat_fwd(points, idx, w):
    return _splat_fwd_impl(points, idx, w), (points, idx, w)


def _splat_bwd(res, g):
    points, idx, w = res
    M, C = points.shape
    k = idx.shape[-1]
    # d points: scatter-add w_j · g into row idx_j  (the transpose of the
    # gather — GaussNet's hot backward op)
    contrib = (w[..., None] * g[..., None, :]).reshape(-1, C)   # [P·k, C]
    flat_idx = idx.reshape(-1)
    d_points = jax.ops.segment_sum(
        contrib, flat_idx, num_segments=M, indices_are_sorted=False
    )
    # d w: dot of g with the gathered rows
    gathered = jnp.take(points, idx, axis=0)                    # [..., k, C]
    d_w = jnp.sum(gathered * g[..., None, :], axis=-1)          # [..., k]
    return d_points, None, d_w


splat_gather.defvjp(_splat_fwd, _splat_bwd)
