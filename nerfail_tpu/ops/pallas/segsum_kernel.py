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
    chunk is assigned to the WIDTH CLASS from `WIDTHS` that minimizes its
    padded slot count ceil(count/W)·W (ties → the larger width, fewer
    rows): a chunk with 40 pairs costs one 128-wide row instead of one
    2048-wide row. Within a class, the chunk gets ceil(count/W)
    fixed-width rows addressed by its rank among the class's chunks
    (compact id) → a `ScatterPlan` of per-class `PlanPart`s (HOST numpy):
      pix_id    [S, n_rows, W] — pixel row feeding each pair
      w         [S, n_rows, W] — the pair's static gaussian weight
      local     [S, n_rows, W] — in-chunk point id (CHUNK ⇒ pad)
      row_chunk [S, n_rows]    — class-compact output block per row
                                 (sorted; pad rows → Z = n_rows−1)
    plus ONE merged
      expand    [S, n_chunks]  — chunk → block in the CONCATENATION of
                                 the class-compact outputs (class offset
                                 + in-class rank; chunks with no pairs →
                                 class 0's always-zero pad block).
    Per-chunk padding is bounded at W−1 slots of the chunk's OWN class
    instead of a single global 2048-wide row floor — at batched-DeepFool
    sparsity (most nonempty chunks carry a handful of foreground pairs)
    this removes ~85-90% of plan bytes (VERDICT r4 weak #5), which is
    what lets the 300-view flagship plan set fit host RAM. Per-class row
    counts are rounded up to a ~6%-granular ladder (`_quant_rows`) so
    repeated attack batches share jit cache entries instead of
    recompiling per batch's exact row count. Plans stay on the host and
    are streamed to the device per step (or cached under a byte budget
    by the caller) — never accumulated in HBM. S is the mesh "data"-axis
    size for sharded plans (1 for single-device). Within a chunk order
    is arbitrary but fixed → deterministic sums.

  device, per backward (g = ∂loss/∂splat, [B·H·W, C] pixel rows):
    per width class:
    1. ONE XLA gather g[pix_id] from the pixel-sized table, then
    2. the kernel reduces each row with a one-hot contraction:
       acc[C, 512] += Σ_pairs (w·g_pair)[C] ⊗ onehot(local)[512]
       — MXU work with no scatter anywhere. The output block index is
       row_chunk[i] (scalar-prefetch index map); consecutive rows of
       one chunk revisit the same block, which Pallas keeps resident
       in VMEM until the index changes.
       (The [C, 512] orientation keeps the 512 axis on the lanes; the
       transposed [512, C=4] product would use 4 of 128 lanes.)
    then one row-gather `concat(outs)[expand]` expands the class-compact
    blocks back to the dense [n_chunks·512, C] result (the fast gather
    regime — ~8 KB contiguous per id).

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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512                  # point ids per chunk (output block rows)
WIDTHS = (128, 512, 2048)    # row width classes (pairs per MXU pass)
ROW_PB = WIDTHS[-1]          # widest class (kept for size estimates)


class PlanPart(NamedTuple):
    """One width class's compact row layout (a pytree — flows through jit).

    Arrays are host numpy in a freshly built plan, device arrays / tracers
    once streamed into a jitted step."""

    row_chunk: np.ndarray  # [S, n_rows] class-compact block per row (sorted)
    pix_id: np.ndarray     # [S, n_rows, W] int32 → pixel row per pair
    w: np.ndarray          # [S, n_rows, W] f32 pair weight (0 on pad)
    local: np.ndarray      # [S, n_rows, W] int32 in-chunk id (CHUNK=pad)

    @property
    def width(self) -> int:
        return self.pix_id.shape[-1]

    @property
    def n_rows(self) -> int:
        return self.pix_id.shape[-2]


@dataclass(frozen=True)
class ScatterPlan:
    """Host-built scatter plan for one neighbor table.

    `num_points`/`n_pixels`/`n_pairs` let the splat validate a plan
    against the tensors it is applied to — a stale plan from a different
    batch raises instead of silently mis-summing.
    """

    parts: Tuple[PlanPart, ...]   # one per width class, ascending width
    expand: np.ndarray            # [S, n_chunks] chunk → concat-compact block
    num_points: int               # M (output rows per shard, unpadded)
    n_pixels: int                 # pixel-table length per shard
    n_pairs: int                  # kept (unmasked) pairs across all shards

    @property
    def n_shards(self) -> int:
        return self.expand.shape[0]

    @property
    def nbytes(self) -> int:
        return self.expand.nbytes + sum(
            p.row_chunk.nbytes + p.pix_id.nbytes + p.w.nbytes
            + p.local.nbytes for p in self.parts
        )

    def leaves(self) -> tuple:
        """Flat array tuple — the wire format through caches and jit
        signatures (expand, then each part's 4 arrays)."""
        out = [self.expand]
        for p in self.parts:
            out += [p.row_chunk, p.pix_id, p.w, p.local]
        return tuple(out)

    @staticmethod
    def from_leaves(leaves, num_points: int, n_pixels: int,
                    n_pairs: int = -1) -> "ScatterPlan":
        expand, rest = leaves[0], leaves[1:]
        assert len(rest) % 4 == 0
        parts = tuple(
            PlanPart(*rest[i:i + 4]) for i in range(0, len(rest), 4)
        )
        return ScatterPlan(parts=parts, expand=expand,
                           num_points=num_points, n_pixels=n_pixels,
                           n_pairs=n_pairs)


def local_leaves(leaves) -> tuple:
    """Strip the shard axis off every leaf (single-device: S == 1)."""
    return tuple(a[0] for a in leaves)


def _quant_rows(n: int) -> int:
    """Round a row count up to a ≤12.5%-waste ladder (3-bit mantissa):
    bounds both the pad-row bytes and the number of distinct jitted
    shapes across attack batches — epoch 0 of a long attack is
    dominated by one Mosaic/XLA compile per distinct plan shape, so
    fewer ladder rungs directly cut its wall clock."""
    if n <= 8:
        return 8
    step = 1 << max(0, int(n).bit_length() - 3)
    return -(-n // step) * step


def _assign_classes(chunk_counts: np.ndarray, widths) -> np.ndarray:
    """Width class per chunk: the LARGEST width whose padded slot count
    ceil(c/W)·W stays within 25% of the minimum over classes. Bytes and
    MXU work scale with slots, but per-ROW overhead (grid step, block
    DMA, zero/accumulate bookkeeping) favors wide rows — a 10k-pair
    chunk takes 5 2048-wide rows instead of 79 128-wide ones for ~1%
    more bytes, while a 40-pair chunk keeps its single 128-wide row."""
    c = chunk_counts.astype(np.int64)
    all_slots = np.stack([-(-c // W) * W for W in widths])
    tol = all_slots.min(axis=0) + (all_slots.min(axis=0) >> 2)
    best = np.zeros(chunk_counts.shape, np.int8)
    for ci in range(1, len(widths)):
        best = np.where(all_slots[ci] <= tol, np.int8(ci), best)
    return best


def _build_single(flat_idx, w_flat, pix, num_points, widths):
    """One shard's compact row layouts. flat_idx/w_flat/pix are 1D pair
    lists. Returns (parts, ranks) with parts a list of per-class
    (row_chunk, pix_id, w, local) at their REAL row counts and ranks a
    list of per-class [n_chunks] in-class rank (−1 ⇒ not in class)."""
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
    wclass = _assign_classes(chunk_counts, widths)

    # one global stable sort groups pairs by chunk; per-class layouts
    # then slice this ordering (pairs of one chunk stay contiguous).
    sort_keys = (
        chunk_of.astype(np.int16) if n_chunks < 2 ** 15 else chunk_of
    )
    order = np.argsort(sort_keys, kind="stable")
    chunk_starts = np.zeros(n_chunks + 1, np.int64)
    np.cumsum(chunk_counts, out=chunk_starts[1:])
    g_chunk = chunk_of[order]
    pos_in_chunk = np.arange(flat_idx.size, dtype=np.int64)
    pos_in_chunk -= chunk_starts[g_chunk]
    g_pix = pix[order]
    g_w = w_flat[order]
    g_local = (flat_idx[order] - g_chunk * np.int32(CHUNK)).astype(np.int32)

    parts, ranks = [], []
    for ci, W in enumerate(widths):
        sel = nonempty & (wclass == ci)
        rank = (np.cumsum(sel) - 1).astype(np.int32)
        rows_per_chunk = np.where(
            sel, -(-chunk_counts // W), 0
        ).astype(np.int64)
        row_start = np.zeros(n_chunks + 1, np.int64)
        np.cumsum(rows_per_chunk, out=row_start[1:])
        n_rows = int(row_start[-1])
        row_chunk = np.repeat(rank, rows_per_chunk)
        ranks.append(np.where(sel, rank, np.int32(-1)).astype(np.int32))

        m = sel[g_chunk]
        slot = row_start[g_chunk[m]] * W + pos_in_chunk[m]
        pix_id = np.zeros(n_rows * W, np.int32)
        w_pad = np.zeros(n_rows * W, np.float32)
        local = np.full(n_rows * W, CHUNK, np.int32)  # pad → matches no row
        pix_id[slot] = g_pix[m]
        w_pad[slot] = g_w[m]
        local[slot] = g_local[m]
        parts.append((row_chunk, pix_id.reshape(n_rows, W),
                      w_pad.reshape(n_rows, W), local.reshape(n_rows, W)))
    return parts, ranks


def build_scatter_plan(
    idx: np.ndarray,
    weights: np.ndarray,
    num_points: int,
    pair_mask: Optional[np.ndarray] = None,
    n_shards: int = 1,
    widths=WIDTHS,
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
    n_chunks = -(-num_points // CHUNK)

    mask_full = None
    if pair_mask is not None:
        mask_full = np.broadcast_to(np.asarray(pair_mask, bool), idx.shape)
    w_full = np.asarray(weights, np.float32)

    shard_parts, shard_ranks = [], []
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
        parts, ranks = _build_single(flat, w_flat, pix, num_points, widths)
        shard_parts.append(parts)
        shard_ranks.append(ranks)

    # per class: pad every shard to the same quantized row count. The
    # ≥1 all-pad rows per shard target block Z = n_rows−1, which both
    # keeps row_chunk sorted and guarantees Z is visited (zeroed) — the
    # merged expand sends chunks outside the class there. Blocks between
    # a shard's compact count and Z are never written and never read.
    n_classes = len(widths)
    rows_cls = [
        _quant_rows(max(sp[ci][0].shape[0] for sp in shard_parts) + 1)
        for ci in range(n_classes)
    ]
    offsets = np.cumsum([0] + rows_cls[:-1])

    def pad(a, n_rows, fill):
        r = n_rows - a.shape[0]
        if r == 0:
            return a
        return np.concatenate([a, np.full((r,) + a.shape[1:], fill, a.dtype)])

    out_parts = []
    for ci in range(n_classes):
        nr = rows_cls[ci]
        Z = nr - 1
        out_parts.append(PlanPart(
            row_chunk=np.stack([
                pad(sp[ci][0].astype(np.int32), nr, Z)
                for sp in shard_parts
            ]),
            pix_id=np.stack([pad(sp[ci][1], nr, 0) for sp in shard_parts]),
            w=np.stack([pad(sp[ci][2], nr, 0.0) for sp in shard_parts]),
            local=np.stack([pad(sp[ci][3], nr, CHUNK)
                            for sp in shard_parts]),
        ))

    # merged expand into the concatenated class-compact space; chunks
    # with no pairs anywhere land on class 0's pad block (always zero)
    zero_block = np.int32(offsets[0] + rows_cls[0] - 1)
    expand = np.full((n_shards, n_chunks), zero_block, np.int32)
    for s in range(n_shards):
        for ci in range(n_classes):
            r = shard_ranks[s][ci]
            expand[s] = np.where(r >= 0, np.int32(offsets[ci]) + r,
                                 expand[s])

    return ScatterPlan(
        parts=tuple(out_parts),
        expand=expand,
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
    widths=WIDTHS,
) -> ScatterPlan:
    """Combined plan for PER-VIEW point tensors (splat_gather_batched).

    View v's pairs scatter into rows [v·Mp, v·Mp + M) of a single
    [V·Mp, C] output with Mp = padded_points(M) (local view index within
    a shard when n_shards > 1), so the whole batched-DeepFool backward is
    ONE kernel walk and every chunk belongs to exactly one view. The
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
        widths=widths,
    )


def _segsum_kernel(channels, row_chunk_ref, packed_ref, out_ref):
    """One plan row: out[C, 512] += Σ_p contrib_p[C] ⊗ onehot_p[512].

    `packed` [pad8(C+1), W] carries the C contribution channels in
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

    packed = packed_ref[0]                               # [pad8, W]
    pb = packed.shape[-1]
    c = packed[:channels]                                # [C, W]
    locf = packed[channels:channels + 1]                 # [1, W]
    # tpu.iota is integer-only; the int→f32 convert keeps the compare in
    # f32 against the packed (exactly representable) local ids
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, pb), 0
    ).astype(jnp.float32)
    onehot_t = (locf == iota).astype(jnp.float32)        # [512, W]
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
    pb = packed.shape[-1]
    c = packed[:channels]
    locf = packed[channels:channels + 1]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, pb), 0
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pack_part_T(gT, part):
    """Channel-major packing: gT [C, n_pixels] → packed [n_rows, pad8, W].

    The attack-scale cotangent stacks keep pixels on the MINOR axis —
    a [..., n_pix, C≤32] layout gets lane-padded up to 16× by XLA's
    (8, 128) tiling (observed 9.8 GB for a 625 MB logical array), while
    [C, n_pix] tiles with zero waste. Padding slots point at pixel row 0
    but carry w == 0 and local == CHUNK, so they contribute nothing."""
    n_rows, pb = part.pix_id.shape
    C = gT.shape[0]
    gb = jnp.take(gT, part.pix_id.reshape(-1), axis=1, mode="clip")
    gb = gb.reshape(C, n_rows, pb)
    contrib = jnp.moveaxis(gb * part.w[None], 0, 1)      # [n_rows, C, pb]
    locf = part.local.astype(jnp.float32)[:, None, :]
    sub = -(-(C + 1) // 8) * 8
    return jnp.concatenate(
        [contrib, locf,
         jnp.zeros((n_rows, sub - C - 1, pb), jnp.float32)], axis=1,
    ), sub


def _pack_part(g, part):
    """Pixel-major packing: g [n_pixels, C] → packed [n_rows, pad8, W]."""
    n_rows, pb = part.pix_id.shape
    C = g.shape[-1]
    gb = jnp.take(
        g, part.pix_id.reshape(-1), axis=0, mode="clip",
    ).reshape(n_rows, pb, C)
    contrib = (gb * part.w[..., None]).transpose(0, 2, 1)
    locf = part.local.astype(jnp.float32)[:, None, :]
    sub = -(-(C + 1) // 8) * 8
    return jnp.concatenate(
        [contrib, locf,
         jnp.zeros((n_rows, sub - C - 1, pb), jnp.float32)], axis=1,
    ), sub


def _part_compact_sums(packed, sub, row_chunk, channels):
    """Run the accumulate kernel over one part → [n_rows, C, CHUNK]."""
    n_rows, _, pb = packed.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, channels, CHUNK), lambda i, rc: (rc[i], 0, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_segsum_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, channels, CHUNK), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)


def _part_compact_sq(packed, sub, row_chunk, channels):
    """Run the squared-sum kernel over one part → [n_rows, 8, C]."""
    n_rows, _, pb = packed.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec((1, sub, pb), lambda i, rc: (i, 0, 0))],
        out_specs=pl.BlockSpec(
            (1, 8, channels), lambda i, rc: (rc[i], 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((channels, CHUNK), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_segsum_sq_kernel, channels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rows, 8, channels), jnp.float32
        ),
        interpret=_interpret(),
    )(row_chunk, packed)


def _leaf_parts(leaves):
    expand, rest = leaves[0], leaves[1:]
    parts = tuple(PlanPart(*rest[i:i + 4]) for i in range(0, len(rest), 4))
    return expand, parts


@functools.partial(jax.jit, static_argnums=(2,))
def planned_segment_sum(
    g: jnp.ndarray,             # [n_pixels, C] per-pixel cotangents
    leaves,                     # LOCAL plan leaves (no shard axis)
    num_points: int,
) -> jnp.ndarray:
    """d_points [num_points, C] = Σ_pairs w·g[pix_id] grouped by point."""
    expand, parts = _leaf_parts(leaves)
    channels = g.shape[-1]
    n_chunks = -(-num_points // CHUNK)
    outs = []
    for part in parts:
        packed, sub = _pack_part(g, part)
        outs.append(_part_compact_sums(packed, sub, part.row_chunk,
                                       channels))
    # expand concat-compact → dense: [n_chunks, C, 512] → [·512, C]
    out = jnp.take(jnp.concatenate(outs, axis=0), expand, axis=0)
    out = out.transpose(0, 2, 1).reshape(n_chunks * CHUNK, channels)
    return out[:num_points]


@functools.partial(jax.jit, static_argnums=(2,))
def planned_segment_sum_T(
    gT: jnp.ndarray,            # [C, n_pixels] channel-major cotangents
    leaves,
    num_points: int,
) -> jnp.ndarray:
    """planned_segment_sum for channel-major input (layout-safe at C>4);
    returns [C, num_points]."""
    expand, parts = _leaf_parts(leaves)
    channels = gT.shape[0]
    n_chunks = -(-num_points // CHUNK)
    outs = []
    for part in parts:
        packed, sub = _pack_part_T(gT, part)
        outs.append(_part_compact_sums(packed, sub, part.row_chunk,
                                       channels))
    out = jnp.take(jnp.concatenate(outs, axis=0), expand, axis=0)
    out = jnp.moveaxis(out, 1, 0).reshape(channels, n_chunks * CHUNK)
    return out[:, :num_points]


@functools.partial(jax.jit, static_argnums=(2,))
def planned_segment_sq(
    g: jnp.ndarray,             # [n_pixels, C] per-pixel cotangents
    leaves,
    num_points: int,
) -> jnp.ndarray:
    """Per-chunk squared norms [n_chunks, C] of the segment-sum result —
    Σ_{points in chunk} (Σ_pairs w·g[pix])² per channel, without ever
    materializing the [num_points, C] result."""
    expand, parts = _leaf_parts(leaves)
    channels = g.shape[-1]
    outs = []
    for part in parts:
        packed, sub = _pack_part(g, part)
        outs.append(_part_compact_sq(packed, sub, part.row_chunk,
                                     channels)[:, 0, :])
    return jnp.take(jnp.concatenate(outs, axis=0), expand, axis=0)


@functools.partial(jax.jit, static_argnums=(2,))
def planned_segment_sq_T(
    gT: jnp.ndarray,            # [C, n_pixels] channel-major cotangents
    leaves,
    num_points: int,
) -> jnp.ndarray:
    """planned_segment_sq for channel-major input (layout-safe packing)."""
    expand, parts = _leaf_parts(leaves)
    channels = gT.shape[0]
    outs = []
    for part in parts:
        packed, sub = _pack_part_T(gT, part)
        outs.append(_part_compact_sq(packed, sub, part.row_chunk,
                                     channels)[:, 0, :])
    return jnp.take(jnp.concatenate(outs, axis=0), expand, axis=0)


def shard_specs(leaves, mesh, axis: str = "data"):
    """PartitionSpecs putting every leaf's shard axis on `axis`."""
    from jax.sharding import PartitionSpec as P

    return tuple(P(axis, *([None] * (a.ndim - 1))) for a in leaves)


def planned_segment_sum_sharded(
    g: jnp.ndarray,             # [V, HW, C] view-major pixel cotangents
    leaves,                     # SHARDED plan leaves ([S, ...])
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
    assert V % S == 0 and leaves[0].shape[0] == S

    g = jax.lax.with_sharding_constraint(
        g, NamedSharding(mesh, P(axis, None, None))
    )

    def local_sum(g_l, *leaves_l):
        out = planned_segment_sum(
            g_l.reshape(-1, g_l.shape[-1]), local_leaves(leaves_l),
            num_points,
        )
        if reduce:
            out = jax.lax.psum(out, axis)
        return out

    return shard_map(
        local_sum, mesh=mesh,
        in_specs=(P(axis, None, None),) + shard_specs(leaves, mesh, axis),
        out_specs=P() if reduce else P(axis, None),
        check_vma=False,
    )(g, *leaves)
