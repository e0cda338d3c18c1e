"""Streaming k-nearest-neighbor search: pixel coords → point-set top-8.

Re-designs `create_index_and_dist` (create_index_and_dist.py:22-171): the
reference chunks the point set 1600 ways, calls `torch.cdist`, sorts the
full chunk, and merges a Python list of running top-8 columns. Here the
same streaming-top-k recurrence is a `lax.scan` over point-set tiles:

  carry (dists [Q,k], idx [Q,k]) ── tile ──► top_k(concat(carry, cdist tile))

Squared distances are used inside the scan (monotone in the Euclidean
distance, saves a sqrt per pair) and a single sqrt is applied at the end,
matching the reference's Euclidean outputs. `top_k` on [Q, k+T] replaces
sort-the-whole-chunk — O(Q·(k+T)) per tile on the VPU, and the Q axis is
embarrassingly shardable across chips.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.utils.chunk import chunked_map, pad_to_multiple


@partial(jax.jit, static_argnames=("k", "s_tile"))
def knn_topk(
    queries: jnp.ndarray,     # [Q, 3]
    points: jnp.ndarray,      # [M, 3] the spatial point set S
    k: int = 8,
    s_tile: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN of each query in S. Returns (dist [Q,k], idx [Q,k]),
    ascending by distance, idx global into `points`."""
    M = points.shape[0]
    pts_padded, _ = pad_to_multiple(points, s_tile, axis=0)
    n_tiles = pts_padded.shape[0] // s_tile
    # padded entries get +inf distance via an index mask
    tiles = pts_padded.reshape(n_tiles, s_tile, 3)

    q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)        # [Q, 1]

    def step(carry, inp):
        best_d, best_i = carry                                   # [Q,k] each
        tile, tile_start = inp                                   # [T,3], []
        t_sq = jnp.sum(tile ** 2, axis=-1)                       # [T]
        # squared cdist via the MXU: |q|² + |p|² − 2 q·pᵀ
        cross = jnp.dot(
            queries, tile.T, precision=jax.lax.Precision.HIGHEST
        )
        d2 = q_sq + t_sq[None, :] - 2.0 * cross                  # [Q,T]
        gidx = tile_start + jnp.arange(s_tile, dtype=jnp.int32)  # [T]
        valid = gidx < M
        d2 = jnp.where(valid[None, :], d2, jnp.inf)

        cand_d = jnp.concatenate([best_d, d2], axis=-1)          # [Q,k+T]
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gidx[None, :], d2.shape)], axis=-1
        )
        neg_top, arg = jax.lax.top_k(-cand_d, k)
        best_i = jnp.take_along_axis(cand_i, arg, axis=-1)
        return (-neg_top, best_i), None

    init = (
        jnp.full((queries.shape[0], k), jnp.inf, queries.dtype),
        jnp.zeros((queries.shape[0], k), jnp.int32),
    )
    starts = (jnp.arange(n_tiles) * s_tile).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(step, init, (tiles, starts))
    best_d = jnp.sqrt(jnp.maximum(best_d, 0.0))
    return best_d, best_i


def build_index_and_dist(
    coord_map: np.ndarray,     # [H, W, 3] per-pixel world coords of one image
    point_set: jnp.ndarray,    # [M, 3] device-resident S
    k: int = 8,
    q_chunk: int = 65536,
    s_tile: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image neighbor table: (dist [H,W,k], idx [H,W,k]).

    The artifact the reference saves as index_and_dist/{split}/{i}.pth of
    shape [2,H,W,8] (create_index_and_dist.py:148-163).
    """
    H, W = coord_map.shape[:2]
    q = jnp.asarray(coord_map.reshape(-1, 3))

    def tile_fn(batch):
        d, i = knn_topk(batch["q"], point_set, k=k, s_tile=s_tile)
        return {"d": d, "i": i}

    out = chunked_map(tile_fn, {"q": q}, q_chunk)
    dist = np.asarray(out["d"]).reshape(H, W, k)
    idx = np.asarray(out["i"]).reshape(H, W, k)
    return dist, idx
