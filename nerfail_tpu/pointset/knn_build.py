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

from nerfail_tpu.utils.chunk import pad_to_multiple


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


def knn_host_tree(
    queries: np.ndarray,       # [Q, 3]
    points: np.ndarray,        # [M, 3]
    k: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN on the host via a KD-tree (scipy cKDTree).

    The table-prep stage is one-off pipeline I/O, not attack-loop compute;
    at full reference scale (640K queries × 1.92M points per image) a
    KD-tree visits ~10³ points per query instead of all M, so the host
    beats any dense device sweep that streams the full Q×M distance
    matrix. The device paths (Pallas tiled kernel on TPU, `knn_topk` XLA
    scan elsewhere) remain for device-resident pipelines and are
    allclose-tested against this.
    """
    tree = _get_tree(np.asarray(points, np.float32))
    dist, idx = tree.query(np.asarray(queries, np.float32), k=k, workers=-1)
    return dist.astype(np.float32), idx.astype(np.int32)


_TREE_CACHE: dict = {}


def _get_tree(points: np.ndarray):
    """One-slot KD-tree cache: the pipeline queries the same point set S
    for every image of every split, so the ~seconds tree build is paid
    once. Keyed by identity + a sampled checksum to survive id() reuse."""
    from scipy.spatial import cKDTree

    sample = points[:: max(1, points.shape[0] // 64)].tobytes()
    key = (points.shape, hash(sample))
    if _TREE_CACHE.get("key") != key:
        _TREE_CACHE["key"] = key
        _TREE_CACHE["tree"] = cKDTree(points)
    return _TREE_CACHE["tree"]


def build_index_and_dist(
    coord_map: np.ndarray,     # [H, W, 3] per-pixel world coords of one image
    point_set,                 # [M, 3] point set S (device or host array)
    k: int = 8,
    q_chunk: int = 65536,
    s_tile: int = 2048,
    method: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image neighbor table: (dist [H,W,k], idx [H,W,k]).

    The artifact the reference saves as index_and_dist/{split}/{i}.pth of
    shape [2,H,W,8] (create_index_and_dist.py:148-163).

    method: "device" streams point-set tiles on the accelerator — on TPU
    the Pallas kernel (ops/pallas/knn_kernel.py: VMEM-resident top-8,
    bbox-pruned candidate tiles), elsewhere the `knn_topk` XLA scan;
    "host" uses the KD-tree; "auto" picks the Pallas kernel on TPU, and
    off-TPU falls back to the host tree above ~10⁹ query·point pairs
    (the dense scan stages [Q, tile] distances through memory and loses
    to the tree's Q·log M there).
    """
    H, W = coord_map.shape[:2]
    M = point_set.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if method == "auto":
        if on_tpu:
            method = "device"
        else:
            method = "host" if H * W * M > 1_000_000_000 else "device"
    if method == "host":
        dist, idx = knn_host_tree(
            coord_map.reshape(-1, 3), np.asarray(point_set), k=k
        )
        return dist.reshape(H, W, k), idx.reshape(H, W, k)

    if on_tpu:
        from nerfail_tpu.ops.pallas.knn_kernel import knn_pallas

        dist, idx = knn_pallas(
            coord_map.reshape(-1, 3), np.asarray(point_set), k=k
        )
        return dist.reshape(H, W, k), idx.reshape(H, W, k)

    q_flat = coord_map.reshape(-1, 3)
    points = jnp.asarray(point_set)
    # one dispatch per query chunk (NOT one fused lax.map program: a
    # single multi-minute XLA execution can starve the runtime watchdog)
    dists, idxs = [], []
    for start in range(0, q_flat.shape[0], q_chunk):
        q = jnp.asarray(q_flat[start:start + q_chunk])
        d, i = knn_topk(q, points, k=k, s_tile=s_tile)
        dists.append(np.asarray(d))
        idxs.append(np.asarray(i))
    dist = np.concatenate(dists).reshape(H, W, k)
    idx = np.concatenate(idxs).reshape(H, W, k)
    return dist, idx
