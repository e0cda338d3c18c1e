"""Static-shape memory tiling.

The reference trades memory for time with Python chunk loops
(`batchify_rays` run_nerf.py:54-66, `batchify` run_nerf.py:27-34). Under
XLA those become a single `lax.map` over a [num_tiles, tile, ...] reshape:
one compiled program, fixed tile shape, sequential HBM-friendly execution —
no retracing per chunk and no host round-trips.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0):
    """Pad axis up to a multiple; returns (padded, original_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, mode="edge"), n


def chunked_map(fn: Callable, xs, chunk: int):
    """Apply `fn` (which maps leading-axis-N pytrees → pytrees) in fixed-size
    tiles along axis 0 and concatenate the results.

    All leaves of `xs` must share the leading dimension. The tail tile is
    padded (edge mode) and the padding sliced off the result.
    """
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    if n <= chunk:
        return fn(xs)

    padded = jax.tree_util.tree_map(
        lambda a: pad_to_multiple(a, chunk, axis=0)[0], xs
    )
    tiled = jax.tree_util.tree_map(
        lambda a: a.reshape((-1, chunk) + a.shape[1:]), padded
    )
    out = jax.lax.map(fn, tiled)
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:n], out
    )
    return flat
