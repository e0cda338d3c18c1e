"""Chunk-aligned segment-sum Pallas kernel: the splat backward's scatter.

The splat backward is a scatter-add of ~41M (pixel, neighbor) pair
gradients into the [M, 4] point tensor (GaussNet.py:60-119 transpose;
SURVEY.md §7 "hard parts"). Measured on v5e at attack scale
(8×800²×8 pairs, M=1.92M):

  XLA scatter (segment_sum)                     ≈ 2.28 s
  XLA scatter, indices sorted                   no better
  XLA row-gather from a pair-sized (41M) table  ≈ 3.2 s  (≈70 ns/id)
  XLA row-gather from a point/pixel-sized table ≈ 0.37 s (≈9 ns/id)

so the only fast random-access primitive is a row gather from a *small*
table. This module reformulates the scatter as exactly one such gather
plus MXU work:

  host (once per attack batch; the neighbor tables are static):
    bucket pairs by point-id chunk (512 consecutive ids). Each NONEMPTY
    chunk gets ceil(count / ROW_PB) fixed-width rows addressed by its
    rank among nonempty chunks (compact id) → `ScatterPlan` of HOST
    numpy arrays:
      pix_id    [S, n_rows, ROW_PB] — pixel row feeding each pair
      w         [S, n_rows, ROW_PB] — the pair's static gaussian weight
      local     [S, n_rows, ROW_PB] — in-chunk point id (CHUNK ⇒ pad)
      row_chunk [S, n_rows]         — COMPACT output block per row
                                      (sorted; pad rows → Z = n_rows−1)
      expand    [S, n_chunks]       — compact block per chunk, or Z for
                                      chunks with no pairs
    Row-based allocation bounds padding at ROW_PB−1 pairs per *chunk*
    instead of the old layout's global-max-per-chunk width, which blew
    up multi-GB on skewed point popularity; chunk COMPACTION drops the
    old one-row-per-empty-chunk floor entirely (at attack scale ~75% of
    point chunks receive no foreground pairs — those rows, their packed
    operands, and their kernel passes no longer exist; the dense result
    is recovered by one chunk-granular gather through `expand`, with
    block Z kept all-zero by the pad rows). Plans stay on the host and
    are streamed to the device per step (or cached under a byte
    budget by the caller) — never accumulated in HBM. S is the mesh
    "data"-axis size for sharded plans (1 for single-device).
    Within a chunk order is arbitrary but fixed → deterministic sums.

  device, per backward (g = ∂loss/∂splat, [B·H·W, C] pixel rows):
    1. ONE XLA gather g[pix_id] from the pixel-sized table, then
    2. this kernel reduces each row with a one-hot contraction:
       acc[C, 512] += Σ_pairs (w·g_pair)[C] ⊗ onehot(local)[512]
       — MXU work with no scatter anywhere. The output block index is
       row_chunk[i] (scalar-prefetch index map); consecutive rows of
       one chunk revisit the same block, which Pallas keeps resident
       in VMEM until the index changes.
       (The [C, 512] orientation keeps the 512 axis on the lanes; the
       transposed [512, C=4] product would use 4 of 128 lanes.)
    3. one row-gather `out[expand]` expands the compact blocks back to
       the dense [n_chunks·512, C] result (the fast gather regime —
       ~8 KB contiguous per id).

The contraction runs at Precision.HIGHEST: the one-hot operand is exact,
but the default single-pass bf16 matmul would shave the contribution
mantissas — HIGHEST keeps the result in the same precision class as
jax.ops.segment_sum (validated on real TPU by tests/test_segsum_kernel).

Pairs whose pixel provably contributes zero gradient (background:
ori_alpha == 0 never reaches the classifier — the forward zeroes those
pixels) can be dropped at plan-build time via `pair_mask`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512          # point ids per chunk (output block rows)
ROW_PB = 2048        # pairs per plan row (one in-kernel MXU pass)


@dataclass(frozen=True)
class ScatterPlan:
    """Host-built scatter plan for one neighbor table (numpy, NOT device).

    Leading axis S shards the plan by mesh "data" group (S=1 single
    device). `num_points`/`n_pixels`/`n_pairs` let the splat validate a
    plan against the tensors it is applied to — a stale plan from a
    different batch raises instead of silently mis-summing.
    """

    pix_id: np.ndarray     # [S, n_rows, ROW_PB] int32 → pixel row per pair
    w: np.ndarray          # [S, n_rows, ROW_PB] f32 pair weight (0 on pad)
    local: np.ndarray      # [S, n_rows, ROW_PB] int32 in-chunk id (CHUNK=pad)
    row_chunk: np.ndarray  # [S, n_rows] int32 COMPACT block per row (sorted)
    expand: np.ndarray     # [S, n_chunks] int32 chunk → compact block (or Z)
    num_points: int        # M (output rows per shard, unpadded)
    n_pixels: int          # pixel-table length the gather expects (per shard)
    n_pairs: int           # kept (unmasked) pairs across all shards

    @property
    def n_shards(self) -> int:
        return self.pix_id.shape[0]

    @property
    def n_rows(self) -> int:
        return self.pix_id.shape[1]

    @property
    def nbytes(self) -> int:
        return (self.pix_id.nbytes + self.w.nbytes + self.local.nbytes
                + self.row_chunk.nbytes + self.expand.nbytes)


def _build_single(flat_idx, w_flat, pix, num_points):
    """One shard's compact row layout. flat_idx/w_flat/pix are 1D pair
    lists. Returns (pix_id, w, local, row_chunk, expand) with row_chunk
    holding COMPACT block ids (rank among nonempty chunks) and expand
    holding −1 for empty chunks (rewritten to Z by build_scatter_plan)."""
    if flat_idx.size and int(flat_idx.max()) >= num_points:
        raise ValueError(
            f"neighbor index {int(flat_idx.max())} out of range for a "
            f"{num_points}-point set — idx table and perturbation point "
            f"set disagree"
        )
    n_chunks = -(-num_points // CHUNK)
    chunk_of = (flat_idx // CHUNK).astype(np.int32)
    chunk_counts = np.bincount(chunk_of, minlength=n_chunks)
    nonempty = chunk_counts > 0
    rank = (np.cumsum(nonempty) - 1).astype(np.int32)   # compact id
    rows_per_chunk = np.where(
        nonempty, -(-chunk_counts // ROW_PB), 0
    ).astype(np.int64)
    row_start = np.zeros(n_chunks + 1, np.int64)
    np.cumsum(rows_per_chunk, out=row_start[1:])
    n_rows = int(row_start[-1])
    row_chunk = np.repeat(rank, rows_per_chunk)
    expand = np.where(nonempty, rank, np.int32(-1)).astype(np.int32)

    # slot = row_start[chunk]·ROW_PB + rank-within-chunk (rows of one chunk
    # are consecutive, so the flat offset is contiguous per chunk). int16
    # sort keys keep numpy's radix argsort fast when they fit.
    sort_keys = (
        chunk_of.astype(np.int16) if n_chunks < 2 ** 15 else chunk_of
    )
    order = np.argsort(sort_keys, kind="stable")
    chunk_starts = np.zeros(n_chunks + 1, np.int64)
    np.cumsum(chunk_counts, out=chunk_starts[1:])
    grouped_chunk = chunk_of[order]
    slot = row_start[grouped_chunk] * ROW_PB
    slot += np.arange(flat_idx.size, dtype=np.int64)
    slot -= chunk_starts[grouped_chunk]

    pix_id = np.zeros(n_rows * ROW_PB, np.int32)
    w_pad = np.zeros(n_rows * ROW_PB, np.float32)
    local = np.full(n_rows * ROW_PB, CHUNK, np.int32)   # pad → matches no row
    pix_id[slot] = pix[order]
    w_pad[slot] = w_flat[order]
    local[slot] = flat_idx[order] - grouped_chunk * np.int32(CHUNK)
    return (pix_id.reshape(n_rows, ROW_PB), w_pad.reshape(n_rows, ROW_PB),
            local.reshape(n_rows, ROW_PB), row_chunk, expand)


def build_scatter_plan(
    idx: np.ndarray,
    weights: np.ndarray,
    num_points: int,
    pair_mask: Optional[np.ndarray] = None,
    n_shards: int = 1,
) -> ScatterPlan:
    """Precompute the chunk-bucketed layout for `idx`/`weights` [..., k].

    pair_mask: optional bool array broadcastable to idx's shape — False
    pairs are dropped (e.g. background pixels whose gradient is
    identically zero), shrinking both the gather and the kernel pass.

    n_shards > 1 splits the leading (view) axis into that many groups and
    builds one sub-plan per group, stacked on axis 0 — the sharded
    backward runs each group on its mesh "data" shard against its local
    pixel table and psums the [M, C] partials (planned_segment_sum_sharded).
    """
    idx = np.asarray(idx)
    k = idx.shape[-1]
    if n_shards > 1:
        assert idx.shape[0] % n_shards == 0, (
            f"view axis {idx.shape[0]} must divide into {n_shards} shards"
        )
    per = idx.shape[0] // n_shards if n_shards > 1 else None

    mask_full = None
    if pair_mask is not None:
        mask_full = np.broadcast_to(np.asarray(pair_mask, bool), idx.shape)
    w_full = np.asarray(weights, np.float32)

    parts = []
    total_pairs = 0
    pix_per_shard = idx.reshape(-1).size // (k * n_shards)
    for s in range(n_shards):
        if n_shards > 1:
            sl = slice(s * per, (s + 1) * per)
            idx_s = idx[sl]
            w_s = np.broadcast_to(w_full, idx.shape)[sl]
            m_s = mask_full[sl] if mask_full is not None else None
        else:
            idx_s, w_s, m_s = idx, np.broadcast_to(w_full, idx.shape), \
                mask_full
        flat = idx_s.reshape(-1).astype(np.int32, copy=False)
        w_flat = w_s.reshape(-1)
        pix = np.arange(flat.size, dtype=np.int32) // np.int32(k)
        if m_s is not None:
            keep = m_s.reshape(-1)
            flat, w_flat, pix = flat[keep], w_flat[keep], pix[keep]
        total_pairs += flat.size
        parts.append(_build_single(flat, w_flat, pix, num_points))

    # pad every shard to R+1 rows (R = max real rows): the ≥1 all-pad
    # rows per shard target block Z = R, which both keeps row_chunk
    # sorted and guarantees Z is visited (zeroed) — expand sends every
    # empty chunk there. The kernels' compact output has Z+1 = n_rows
    # blocks; blocks between a shard's compact count and Z are never
    # written and never read (expand skips them).
    R = max(p[0].shape[0] for p in parts)
    n_rows = R + 1

    def pad(a, fill):
        r = n_rows - a.shape[0]
        if r == 0:
            return a
        pad_shape = (r,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    return ScatterPlan(
        pix_id=np.stack([pad(p[0], 0) for p in parts]),
        w=np.stack([pad(p[1], 0.0) for p in parts]),
        local=np.stack([pad(p[2], CHUNK) for p in parts]),
        row_chunk=np.stack([pad(p[3], R) for p in parts]),
        expand=np.stack([np.where(p[4] < 0, np.int32(R), p[4])
                         for p in parts]),
        num_points=num_points,
        n_pixels=pix_per_shard,
        n_pairs=total_pairs,
    )


def padded_points(num_points: int) -> int:
    """Per-view point count rounded up to a whole number of chunks —
    batched plans place view v at offset v·padded_points so no chunk
    ever spans two views (the norm pass reduces per view by chunk)."""
    return -(-num_points // CHUNK) * CHUNK


def build_batched_scatter_plan(
    idx: np.ndarray,
    weights: np.ndarray,
    num_points: int,
    pair_mask: Optional[np.ndarray] = None,
    n_shards: int = 1,
) -> ScatterPlan:
    """Combined plan for PER-VIEW point tensors (splat_gather_batched).

    View v's pairs scatter into rows [v·Mp, v·Mp + M) of a single
    [V·Mp, C] output with Mp = padded_points(M) (local view index within
    a shard when n_shards > 1), so the whole batched-DeepFool backward is
    ONE kernel pass and every chunk belongs to exactly one view. The
    plan's num_points is V_local·Mp; callers slice [:, :M] per view."""
    idx = np.asarray(idx)
    V = idx.shape[0]
    per = V // max(n_shards, 1)
    mp = padded_points(num_points)
    if per * mp >= 2 ** 31:
        raise ValueError("V_local·M must fit int32")
    local_v = (np.arange(V) % per).astype(np.int64)
    off = (local_v * mp).reshape(
        (V,) + (1,) * (idx.ndim - 1)
    )
    return build_scatter_plan(
        (idx.astype(np.int64) + off).astype(np.int32),
        weights, per * mp, pair_mask=pair_mask, n_shards=n_shards,
    )


def _segsum_kernel(channels, row_chunk_ref, packed_ref, out_ref):
    """One plan row: out[C, 512] += Σ_p contrib_p[C] ⊗ onehot_p[512].

    `packed` [pad8(C+1), ROW_PB] carries the C contribution channels in
    sublane rows 0..C-1 and the pair's in-chunk point id (as f32) in row
    C — pairs ride the lane axis, so the one-hot compare is a free
    sublane broadcast and the tensor has zero tiling padding. C is not
    limited to the splat's 4: the batched-DeepFool jacobian stacks all
    num_classes·4 class-cotangents into one pass (C=32), turning 8
    kernel walks over the plan into one with 8× the MXU rows. The output
    block is row_chunk[i] (scalar-prefetch index map): the first row of
    each chunk zeroes it, later rows of the same chunk accumulate while
    the block stays resident in VMEM."""
    i = pl.program_id(0)
    prev = row_chunk_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, row_chunk_ref[i] != prev)

    @pl.when(first)
    def _zero():
        out_ref[0] = jnp.zeros((channels, CHUNK), jnp.float32)

    packed = packed_ref[0]                               # [pad8, ROW_PB]
    c = packed[:channels]                                # [C, ROW_PB]
    locf = packed[channels:channels + 1]                 # [1, ROW_PB]
    # tpu.iota is integer-only; the int→f32 convert keeps the compare in
    # f32 against the packed (exactly representable) local ids
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, ROW_PB), 0
    ).astype(jnp.float32)
    onehot_t = (locf == iota).astype(jnp.float32)        # [512, ROW_PB]
    # HIGHEST: the one-hot is exact but a single-pass bf16 product would
    # shave the contribution mantissas (ADVICE r2) — keep segment_sum-class
    # precision at the cost of extra MXU passes on an already-cheap op
    out_ref[0] += jax.lax.dot_general(
        c, onehot_t, (((1,), (1,)), ((), ())),           # contract pairs
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _segsum_sq_kernel(channels, row_chunk_ref, packed_ref, out_ref,
                      acc_ref):
    """Like _segsum_kernel but emits ONLY per-chunk squared sums
    out[chunk, C] = Σ_lanes acc[C, 512]², never writing the [C, 512]
    accumulators to HBM. This is the norm pass of the batched-DeepFool
    step: ‖Splatᵀ G_k‖² for all classes in one plan walk, with the
    full [n_cls, V, M, 4] jacobian (≈8 GB at reference scale) never
    materialized. The accumulator lives in persistent VMEM scratch."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    prev = row_chunk_ref[jnp.maximum(i - 1, 0)]
    nxt = row_chunk_ref[jnp.minimum(i + 1, n - 1)]
    cur = row_chunk_ref[i]
    first = jnp.logical_or(i == 0, cur != prev)
    last = jnp.logical_or(i == n - 1, cur != nxt)

    @pl.when(first)
    def _zero():
        acc_ref[:] = jnp.zeros((channels, CHUNK), jnp.float32)

    packed = packed_ref[0]
    c = packed[:channels]
    locf = packed[channels:channels + 1]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, ROW_PB), 0
    ).astype(jnp.float32)
    onehot_t = (locf == iota).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        c, onehot_t, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    @pl.when(last)
    def _emit():
        acc = acc_ref[:]
        # row 0 carries the result; rows 1..7 are sublane padding (the
        # TPU lowering needs an 8-divisible second-to-last block dim)
        out_ref[0] = jnp.broadcast_to(
            jnp.sum(acc * acc, axis=1)[None, :], (8, acc.shape[0])
        )


def _pack_T(gT, pix_id, w):
    """Channel-major packing: gT [C, n_pixels] → packed [n_rows, C, pb].

    The attack-scale cotangent stacks keep pixels on the MINOR axis —
    a [..., n_pix, C≤32] layout gets lane-padded up to 16× by XLA's
    (8, 128) tiling (observed 9.8 GB for a 625 MB logical array), while
    [C, n_pix] tiles with zero waste."""
    n_rows, pb = pix_id.shape
    C = gT.shape[0]
    gb = jnp.take(gT, pix_id.reshape(-1), axis=1, mode="clip")
    gb = gb.reshape(C, n_rows, pb)
    contrib = gb * w[None]                               # [C, n_rows, pb]
    return jnp.moveaxis(contrib, 0, 1)                   # [n_rows, C, pb]


@functools.partial(jax.jit, static_argnums=(6,))
def planned_segment_sum_T(
    gT: jnp.ndarray,            # [C, n_pixels] channel-major cotangents
    row_chunk: jnp.ndarray,
    pix_id: jnp.ndarray,
    w: jnp.ndarray,
    local: jnp.ndarray,
    expand: jnp.ndarray,        # [n_chunks] chunk → compact block
    num_points: int,
) -> jnp.ndarray:
    """planned_segment_sum for channel-major input (layout-safe at C>4)."""
    n_rows, pb = pix_id.shape
    channels = gT.shape[0]
    n_chunks = -(-num_points // CHUNK)
    contrib_t = _pack_T(gT, pix_id, w)
    locf = local.astype(jnp.float32)[:, None, :]
    sub = -(-(channels + 1) // 8) * 8
    pad_rows = sub - channels - 1
    packed = jnp.concatenate(
        [contrib_t, locf,
         jnp.zeros((n_rows, pad_rows, pb), jnp.float32)], axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, channels, CHUNK), lambda i, rc: (rc[i], 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, channels, CHUNK), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)
    # expand compact blocks to the dense result, keep channel-major
    out = jnp.take(out, expand, axis=0)            # [n_chunks, C, 512]
    out = jnp.moveaxis(out, 1, 0).reshape(channels, n_chunks * CHUNK)
    return out[:, :num_points]


@functools.partial(jax.jit, static_argnums=(6,))
def planned_segment_sq_T(
    gT: jnp.ndarray,            # [C, n_pixels] channel-major cotangents
    row_chunk: jnp.ndarray,
    pix_id: jnp.ndarray,
    w: jnp.ndarray,
    local: jnp.ndarray,
    expand: jnp.ndarray,        # [n_chunks] chunk → compact block
    num_points: int,
) -> jnp.ndarray:
    """planned_segment_sq for channel-major input: [n_chunks, C] squared
    sums without materializing the dense result (layout-safe packing)."""
    n_rows, pb = pix_id.shape
    channels = gT.shape[0]
    n_chunks = -(-num_points // CHUNK)
    contrib_t = _pack_T(gT, pix_id, w)
    locf = local.astype(jnp.float32)[:, None, :]
    sub = -(-(channels + 1) // 8) * 8
    pad_rows = sub - channels - 1
    packed = jnp.concatenate(
        [contrib_t, locf,
         jnp.zeros((n_rows, pad_rows, pb), jnp.float32)], axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, 8, channels), lambda i, rc: (rc[i], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((channels, CHUNK), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_sq_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, 8, channels), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)
    return jnp.take(out[:, 0, :], expand, axis=0)   # [n_chunks, C]


@functools.partial(jax.jit, static_argnums=(6,))
def planned_segment_sq(
    g: jnp.ndarray,             # [n_pixels, C] per-pixel cotangents
    row_chunk: jnp.ndarray,     # [n_rows]
    pix_id: jnp.ndarray,        # [n_rows, ROW_PB]
    w: jnp.ndarray,             # [n_rows, ROW_PB]
    local: jnp.ndarray,         # [n_rows, ROW_PB]
    expand: jnp.ndarray,        # [n_chunks] chunk → compact block
    num_points: int,
) -> jnp.ndarray:
    """Per-chunk squared norms [n_chunks, C] of the segment-sum result —
    Σ_{points in chunk} (Σ_pairs w·g[pix])² per channel, without ever
    materializing the [num_points, C] result."""
    n_rows, pb = pix_id.shape
    channels = g.shape[-1]
    g_bucketed = jnp.take(
        g, pix_id.reshape(-1), axis=0, mode="clip",
    ).reshape(n_rows, pb, channels)
    contrib_t = (g_bucketed * w[..., None]).transpose(0, 2, 1)
    locf = local.astype(jnp.float32)[:, None, :]
    sub = -(-(channels + 1) // 8) * 8
    pad_rows = sub - channels - 1
    packed = jnp.concatenate(
        [contrib_t, locf,
         jnp.zeros((n_rows, pad_rows, pb), jnp.float32)], axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, 8, channels), lambda i, rc: (rc[i], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((channels, CHUNK), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_sq_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, 8, channels), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)
    return jnp.take(out[:, 0, :], expand, axis=0)   # [n_chunks, C]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnums=(6,))
def planned_segment_sum(
    g: jnp.ndarray,             # [n_pixels, C] per-pixel cotangents
    row_chunk: jnp.ndarray,     # [n_rows]
    pix_id: jnp.ndarray,        # [n_rows, ROW_PB]
    w: jnp.ndarray,             # [n_rows, ROW_PB]
    local: jnp.ndarray,         # [n_rows, ROW_PB]
    expand: jnp.ndarray,        # [n_chunks] chunk → compact block
    num_points: int,
) -> jnp.ndarray:
    """d_points [num_points, C] = Σ_pairs w·g[pix_id] grouped by point."""
    n_rows, pb = pix_id.shape
    channels = g.shape[-1]
    n_chunks = -(-num_points // CHUNK)
    # the one random-access op: fetch each pair's pixel cotangent from the
    # pixel-sized table (the fast gather regime). Padding slots point at
    # row 0 but carry w == 0 and local == CHUNK, so they contribute 0.
    # The static pair weight folds in here, and everything is packed into
    # one [n_rows, 8, ROW_PB] lane-major tensor (pairs on lanes): channels
    # in sublane rows 0..C-1, local id as f32 in row C — the layout has
    # zero T(8,128) tiling padding, unlike any [..., C]-minor variant.
    g_bucketed = jnp.take(
        g, pix_id.reshape(-1), axis=0, mode="clip",
    ).reshape(n_rows, pb, channels)
    contrib_t = (g_bucketed * w[..., None]).transpose(0, 2, 1)
    locf = local.astype(jnp.float32)[:, None, :]
    sub = -(-(channels + 1) // 8) * 8      # sublane-pad C+1 rows
    pad_rows = sub - channels - 1
    packed = jnp.concatenate(
        [contrib_t, locf,
         jnp.zeros((n_rows, pad_rows, pb), jnp.float32)], axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, channels, CHUNK), lambda i, rc: (rc[i], 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, channels, CHUNK), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)
    # expand compact → dense: [n_chunks, C, 512] → [n_chunks·512, C]
    out = jnp.take(out, expand, axis=0)
    out = out.transpose(0, 2, 1).reshape(n_chunks * CHUNK, channels)
    return out[:num_points]


def planned_segment_sum_sharded(
    g: jnp.ndarray,             # [V, HW, C] view-major pixel cotangents
    row_chunk: jnp.ndarray,     # [S, n_rows]
    pix_id: jnp.ndarray,        # [S, n_rows, ROW_PB]
    w: jnp.ndarray,             # [S, n_rows, ROW_PB]
    local: jnp.ndarray,         # [S, n_rows, ROW_PB]
    expand: jnp.ndarray,        # [S, n_chunks]
    num_points: int,
    mesh,
    axis: str = "data",
    reduce: bool = True,
) -> jnp.ndarray:
    """Mesh-sharded planned segment-sum (SURVEY §5 collectives spec).

    The view axis of `g` and the shard axis of the plan ride the mesh
    `axis`; every shard reduces its local views' pairs with the Pallas
    kernel, then the [M, C] partials psum over ICI (reduce=True, the
    shared-δ attacks) or stay view-local (reduce=False, per-view point
    tensors — num_points is then V_local·M and the caller reshapes).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    V = g.shape[0]
    S = int(mesh.shape.get(axis, 1))
    assert V % S == 0 and row_chunk.shape[0] == S

    g = jax.lax.with_sharding_constraint(
        g, NamedSharding(mesh, P(axis, None, None))
    )

    def local_sum(g_l, rc_l, pix_l, w_l, loc_l, ex_l):
        out = planned_segment_sum(
            g_l.reshape(-1, g_l.shape[-1]),
            rc_l[0], pix_l[0], w_l[0], loc_l[0], ex_l[0], num_points,
        )
        if reduce:
            out = jax.lax.psum(out, axis)
        return out

    specs = P(axis, None, None)
    return shard_map(
        local_sum, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None),
                  specs, specs, specs, P(axis, None)),
        out_specs=P() if reduce else P(axis, None),
        check_vma=False,
    )(g, row_chunk, pix_id, w, local, expand)
