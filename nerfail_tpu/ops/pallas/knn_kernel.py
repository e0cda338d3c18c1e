"""Exact 8-NN Pallas kernel: tiled distance sweep with VMEM-resident top-k.

The pipeline's point-set stage needs, for every pixel of every image, the
8 nearest points of the spatial set S (create_index_and_dist.py:126-145 —
the reference cdist-sort-merge loop). At reference scale that is 640K
queries × 1.92M points **per image**: any XLA formulation stages the
[Q, M] distance matrix through HBM (≈5 TB per image) because the matmul
cannot fuse into a top-k. This kernel never materializes distances:

  * grid (query-tile, candidate-slot); the running top-8 (dist, idx) for
    a query tile lives in VMEM across the whole candidate sweep
  * d² is built on the VPU from a broadcast (q_d − p_d)² — K=3 is far too
    thin for the MXU — and is consumed in-register
  * a cheap `any(d² < worst-kept)` gate skips the top-8 extraction for
    tiles that cannot contribute (the common case once warm)
  * the host prunes candidate point-tiles per query tile with exact
    bounding-box distance bounds after Morton-ordering both sides, so
    spatially far tiles are never even DMA'd; `-1` slots are skipped.

The candidate construction is exact, not approximate: a point tile is
pruned only if its *lower*-bound distance exceeds an *upper* bound τ on
the query tile's 8th-NN distance (τ = min over full tiles of the
max-corner distance — every tile holds ≥ 8 points, so some 8 points are
within τ of every query in the tile).

Index tracking uses lane-iota identities (global idx = tile_offset +
argmin lane), so no gathers are needed anywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_LANE = np.int32(2 ** 30)


def _knn_kernel(k, tq, tp, m_total, cand_ref, q_ref, p_ref, od_ref, oi_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        od_ref[:] = jnp.full(od_ref.shape, jnp.inf, od_ref.dtype)
        oi_ref[:] = jnp.zeros(oi_ref.shape, jnp.int32)

    jt = cand_ref[i, j]

    @pl.when(jt >= 0)
    def _work():
        q = q_ref[:]                       # [TQ, 8] xyz in lanes 0:3
        p = p_ref[:]                       # [3, TP]
        d2 = (q[:, 0:1] - p[0:1, :]) ** 2
        d2 += (q[:, 1:2] - p[1:2, :]) ** 2
        d2 += (q[:, 2:3] - p[2:3, :]) ** 2                     # [TQ, TP]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, tp), 1)
        off = jt * tp
        d2 = jnp.where(off + lane < m_total, d2, jnp.inf)

        best_d = od_ref[:]                 # [TQ, k]
        improves = jnp.any(d2 < best_d[:, k - 1:k])

        @pl.when(improves)
        def _merge():
            # k smallest of this tile, ascending (indices via lane iota)
            tile_d, tile_i = [], []
            dd = d2
            for _ in range(k):
                m = jnp.min(dd, axis=1, keepdims=True)
                am = jnp.min(
                    jnp.where(dd == m, lane, _BIG_LANE),
                    axis=1, keepdims=True,
                )
                tile_d.append(m)
                tile_i.append(am + off)
                dd = jnp.where(lane == am, jnp.inf, dd)
            cd = jnp.concatenate([best_d] + tile_d, axis=1)    # [TQ, 2k]
            ci = jnp.concatenate([oi_ref[:]] + tile_i, axis=1)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (tq, 2 * k), 1)
            nd, ni = [], []
            for _ in range(k):
                m = jnp.min(cd, axis=1, keepdims=True)
                am = jnp.min(
                    jnp.where(cd == m, lane2, _BIG_LANE),
                    axis=1, keepdims=True,
                )
                sel = lane2 == am
                nd.append(m)
                ni.append(jnp.sum(
                    jnp.where(sel, ci, 0), axis=1, keepdims=True
                ))
                cd = jnp.where(sel, jnp.inf, cd)
            od_ref[:] = jnp.concatenate(nd, axis=1)
            oi_ref[:] = jnp.concatenate(ni, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "tq", "tp", "m_total", "interpret")
)
def _knn_call(qpk, ppk, cand, k, tq, tp, m_total, interpret=False):
    n_q = qpk.shape[0] // tq
    max_c = cand.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q, max_c),
        in_specs=[
            pl.BlockSpec((tq, 8), lambda i, j, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tp), lambda i, j, c: (0, jnp.maximum(c[i, j], 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_knn_kernel, k, tq, tp, m_total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qpk.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((qpk.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
    )(cand, qpk, ppk)


# ----------------------------------------------------------------- host side


def _morton_order(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting 3D points along a Morton (Z-order) curve, so
    consecutive tiles are spatially compact and bbox pruning bites."""
    lo, hi = x.min(0), x.max(0)
    q = ((x - lo) / np.maximum(hi - lo, 1e-12) * (2 ** bits - 1)).astype(
        np.uint64
    )

    def spread(v):
        v &= np.uint64(0x3FF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x30000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x9249249)
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def _tile_bboxes(x: np.ndarray, tile: int) -> Tuple[np.ndarray, np.ndarray]:
    n = x.shape[0] // tile
    t = x[: n * tile].reshape(n, tile, 3)
    return t.min(1), t.max(1)


def _candidates(
    q_lo, q_hi, p_lo, p_hi, n_full_p: int, k: int, tp: int
) -> np.ndarray:
    """Exact bbox pruning: per query tile, the point tiles that can hold
    one of its k nearest. Returns [n_q, max_c] int32 padded with -1."""
    # lower bound between boxes, per dim: gap = max(0, plo-qhi, qlo-phi)
    q_lo = q_lo.astype(np.float32)[:, None, :]
    q_hi = q_hi.astype(np.float32)[:, None, :]
    p_lo = p_lo.astype(np.float32)[None, :, :]
    p_hi = p_hi.astype(np.float32)[None, :, :]
    gap = np.maximum(0.0, np.maximum(p_lo - q_hi, q_lo - p_hi))
    lb2 = np.einsum("qpd,qpd->qp", gap, gap)                   # [n_q, n_p]
    # upper bound: farthest corner distance, per dim the larger overhang
    span = np.maximum(np.abs(p_hi - q_lo), np.abs(q_hi - p_lo))
    ub2 = np.einsum("qpd,qpd->qp", span, span)
    # τ²: the k-th NN of every query in tile i is ≤ the best full tile's
    # max-corner distance (a full tile holds tp ≥ k points)
    full = ub2[:, :n_full_p] if n_full_p else ub2
    tau2 = full.min(1) if full.shape[1] else np.full(lb2.shape[0], np.inf)
    keep = lb2 <= tau2[:, None] + 1e-12
    # bucket the pad width so repeated calls (e.g. one per image) hit the
    # same compiled kernel instead of retracing per distinct max_c
    max_c = max(int(keep.sum(1).max()), 1)
    max_c = min(-(-max_c // 64) * 64, lb2.shape[1])
    n_q = lb2.shape[0]
    order = np.argsort(np.where(keep, lb2, np.inf), axis=1)[:, :max_c]
    counts = keep.sum(1)
    col = np.arange(max_c)[None, :]
    cand = np.where(col < counts[:, None], order, -1).astype(np.int32)
    return cand


class KnnPrep:
    """Reusable point-side preparation for `knn_pallas`.

    Building this once per point set (Morton sort, transpose-pack, tile
    bboxes, device upload) and passing it for every image's query sweep
    amortizes the O(M log M) host work across the pipeline's hundreds of
    images (create_index_and_dist.py:63-106 reloads S per split; here S
    is prepped exactly once)."""

    def __init__(self, points: np.ndarray, tp: int = 512,
                 prune: bool = True):
        points = np.asarray(points, np.float32)
        M = points.shape[0]
        self.M, self.tp, self.prune = M, tp, prune
        self.pperm = _morton_order(points) if prune else np.arange(M)
        ps = points[self.pperm]
        Mp = -(-M // tp) * tp
        self.Mp = Mp
        ppad = np.concatenate([ps, np.full((Mp - M, 3), 1e30, np.float32)])
        self.ppk = jnp.asarray(np.ascontiguousarray(ppad.T))   # [3, Mp]
        self.n_p = Mp // tp
        self.n_full_p = self.n_p if M == Mp else self.n_p - 1
        if prune and self.n_p > 1:
            self.p_lo, self.p_hi = _tile_bboxes(
                np.concatenate([ps, np.repeat(ps[-1:], Mp - M, 0)]), tp
            )
        else:
            self.p_lo = self.p_hi = None


# the candidate table is scalar-prefetched to SMEM (~1 MB on v5e) and the
# prefetch machinery holds TWO copies of the operand (copy + in-flight
# buffer, observed in the compiler's scoped-smem accounting); group query
# tiles per kernel call so rows × max_c ints stay under this budget
_SMEM_CAND_INTS = 96 * 1024


class KnnQueryPlan:
    """Host-side query plan for one `knn_pallas` sweep.

    Everything up to the kernel calls — Morton ordering, tile bbox
    candidate pruning, and SMEM-budget bucketing — is pure numpy on the
    host (~1.5-3 s for a 640K-query image). Building the NEXT image's
    plan in a worker thread while the current image's kernel calls run
    hides that cost behind the device time (the r5 knn_timing.json
    measurement showed it serializing inside `knn_pallas` otherwise)."""

    def __init__(self, queries: np.ndarray, prep: KnnPrep,
                 k: int = 8, tq: int = 256):
        queries = np.asarray(queries, np.float32)
        prune = prep.prune
        self.prep, self.k, self.tq = prep, k, tq
        Q = self.Q = queries.shape[0]

        qperm = _morton_order(queries) if prune else np.arange(Q)
        self.qperm = qperm
        qs = queries[qperm]

        Qp = -(-Q // tq) * tq
        qpk = np.zeros((Qp, 8), np.float32)
        qpk[:Q, :3] = qs
        # pad queries with the last real query (harmless duplicate work)
        if Qp != Q:
            qpk[Q:, :3] = qs[-1]

        n_q = self.n_q = Qp // tq
        if prune and prep.n_p > 1:
            q_lo, q_hi = _tile_bboxes(qpk[:, :3], tq)
            cand = _candidates(
                q_lo, q_hi, prep.p_lo, prep.p_hi, prep.n_full_p, k,
                prep.tp,
            )
        else:
            cand = np.tile(np.arange(prep.n_p, dtype=np.int32), (n_q, 1))

        # Group query tiles into kernel calls that (a) fit the SMEM
        # candidate budget and (b) are shape-homogeneous: tiles are
        # bucketed by their candidate count rounded to a power of two
        # ≥64, so surface tiles (tight pruning, ~64-128 candidates)
        # batch thousands of rows per call while the few background
        # tiles (weak pruning) go in narrow calls — and every
        # (rows, width) pair is a power of two, keeping the
        # compiled-kernel set small and stable across images.
        counts = np.maximum((cand >= 0).sum(1), 1)
        widths = 64 * 2 ** np.ceil(
            np.log2(counts / 64).clip(0)
        ).astype(np.int64)
        # a bucket width must itself fit the SMEM candidate budget even
        # at one row per call; weakly-pruned tiles beyond the cap run
        # SEGMENTED candidate passes (top-k merged across segments in
        # the execute loop) — ADVICE r4
        w_cap = 1 << int(np.floor(np.log2(_SMEM_CAND_INTS)))
        widths = np.minimum(widths, w_cap)
        # keep every (rows, width) pair an exact power of two: pad the
        # candidate table with -1 columns up to the widest bucket (or a
        # whole number of w_cap segments) instead of clipping to max_c
        # (a per-image multiple of 64 that would otherwise add one fresh
        # compiled shape per distinct image — ADVICE r3)
        w_max = int(widths.max())
        if int(counts.max()) > w_cap:
            w_max = -(-cand.shape[1] // w_cap) * w_cap
        if w_max > cand.shape[1]:
            cand = np.concatenate(
                [cand, np.full((cand.shape[0], w_max - cand.shape[1]),
                               -1, np.int32)], axis=1,
            )
        self.qpk, self.cand = qpk, cand
        self.counts, self.widths = counts, widths


def knn_pallas(
    queries: Optional[np.ndarray] = None,   # [Q, 3]
    points: Optional[np.ndarray] = None,    # [M, 3]
    k: int = 8,
    tq: int = 256,
    tp: int = 512,
    prune: bool = True,
    interpret: bool = False,
    prep: Optional[KnnPrep] = None,
    plan: Optional[KnnQueryPlan] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN (dist ascending, global idx) of each query in `points`.

    Drop-in for `knn_topk`/`knn_host_tree` on the TPU; Euclidean outputs
    match the reference cdist semantics (create_index_and_dist.py:133-137).
    Pass a `KnnPrep` built once per point set to amortize the point-side
    host prep across many query images, and optionally a `KnnQueryPlan`
    built off-thread to overlap the per-image host planning with device
    work. Query tiles are grouped into as many kernel calls as the SMEM
    candidate-table budget requires, so full-image sweeps (640K queries
    × 1.92M points) run without blowing the ~1 MB scalar-prefetch memory.
    """
    if plan is None:
        if queries is None:
            raise ValueError("knn_pallas needs `queries` or a `plan`")
        if prep is None:
            if points is None:
                raise ValueError(
                    "knn_pallas needs either `points` or a prebuilt `prep`"
                )
            prep = KnnPrep(points, tp=tp, prune=prune)
        elif points is not None:
            raise ValueError("pass `points` OR `prep`, not both — the "
                             "prep already owns a (possibly different) "
                             "point set")
        plan = KnnQueryPlan(queries, prep, k=k, tq=tq)
    prep, k, tq = plan.prep, plan.k, plan.tq
    tp, M = prep.tp, prep.M
    Q, n_q = plan.Q, plan.n_q
    qpk, cand = plan.qpk, plan.cand
    counts, widths = plan.counts, plan.widths
    qperm = plan.qperm
    Qp = n_q * tq
    qtiles = qpk.reshape(n_q, tq, 8)
    d = np.empty((Qp, k), np.float32)
    idx = np.empty((Qp, k), np.int32)
    for w in np.unique(widths):
        tiles = np.nonzero(widths == w)[0]
        rows_cap = max(_SMEM_CAND_INTS // int(w), 1)
        rows_cap = 2 ** int(np.floor(np.log2(rows_cap)))
        for c0 in range(0, len(tiles), rows_cap):
            chunk = tiles[c0: c0 + rows_cap]
            rows = min(2 ** int(np.ceil(np.log2(len(chunk)))), rows_cap)
            qg = qtiles[chunk]
            if rows != len(chunk):          # pad: repeat row 0, cand = -1
                qg = np.concatenate(
                    [qg, np.repeat(qg[:1], rows - len(chunk), 0)]
                )
            n_seg = -(-int(counts[chunk].max()) // int(w))
            best_d = best_i = None
            for seg in range(n_seg):
                cg = cand[chunk, seg * int(w): (seg + 1) * int(w)]
                if seg and not (cg >= 0).any():
                    break                   # segments are left-packed
                if rows != len(chunk):
                    cg = np.concatenate(
                        [cg, np.full((rows - len(chunk), int(w)), -1,
                                     np.int32)]
                    )
                dg, ig = _knn_call(
                    jnp.asarray(qg.reshape(-1, 8)), prep.ppk,
                    jnp.asarray(np.ascontiguousarray(cg)),
                    k=k, tq=tq, tp=tp, m_total=M, interpret=interpret,
                )
                dg = np.asarray(dg).reshape(rows * tq, k)
                ig = np.asarray(ig).reshape(rows * tq, k)
                if best_d is None:
                    best_d, best_i = dg, ig
                else:
                    # merge this segment's top-k with the running best
                    # (candidate segments are disjoint — no duplicates)
                    dd = np.concatenate([best_d, dg], axis=1)
                    ii = np.concatenate([best_i, ig], axis=1)
                    sel = np.argsort(dd, axis=1, kind="stable")[:, :k]
                    best_d = np.take_along_axis(dd, sel, 1)
                    best_i = np.take_along_axis(ii, sel, 1)
            d.reshape(n_q, tq, k)[chunk] = \
                best_d.reshape(rows, tq, k)[: len(chunk)]
            idx.reshape(n_q, tq, k)[chunk] = \
                best_i.reshape(rows, tq, k)[: len(chunk)]
    d = d[:Q]
    idx = idx[:Q]
    d = np.sqrt(np.maximum(d, 0.0))
    # undo both permutations
    gidx = prep.pperm[np.minimum(idx, M - 1)].astype(np.int32)
    out_d = np.empty_like(d)
    out_i = np.empty_like(gidx)
    out_d[qperm] = d
    out_i[qperm] = gidx
    return out_d, out_i
