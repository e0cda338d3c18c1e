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
    bucket pairs by point-id chunk (512 consecutive ids), pad each
    chunk's pair list to a fixed width PB → `ScatterPlan`:
      pix_id [n_chunks, PB] — which pixel row feeds each pair
      w      [n_chunks, PB] — the pair's static gaussian weight
      local  [n_chunks, PB] — in-chunk point id (CHUNK ⇒ padding)
    Within a chunk order is arbitrary but fixed → deterministic sums.

  device, per backward (g = ∂loss/∂splat, [B·H·W, C] pixel rows):
    1. ONE XLA gather g[pix_id] from the pixel-sized table, then
    2. this kernel reduces each chunk with a one-hot contraction:
       acc[C, 512] = Σ_pairs (w·g_pair)[C] ⊗ onehot(local)[512]
       — MXU work with fully static block writes, no scatter anywhere.
       (The [C, 512] orientation keeps the 512 axis on the lanes; the
       transposed [512, C=4] product would use 4 of 128 lanes.)

Accumulation is f32 → same precision class as jax.ops.segment_sum.

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
PB_SLICE = 2048      # pairs processed per in-kernel sub-step (VMEM bound)


@dataclass(frozen=True)
class ScatterPlan:
    """Host-built, device-resident scatter plan for one neighbor table."""

    pix_id: jnp.ndarray    # [n_chunks, PB] int32 → pixel row feeding a pair
    w: jnp.ndarray         # [n_chunks, PB] f32 pair weight (0 on padding)
    local: jnp.ndarray     # [n_chunks, PB] int32 in-chunk id (CHUNK = pad)
    num_points: int        # M (output rows, unpadded)

    @property
    def n_chunks(self) -> int:
        return self.pix_id.shape[0]

    @property
    def pb(self) -> int:
        return self.pix_id.shape[1]


def build_scatter_plan(
    idx: np.ndarray,
    weights: np.ndarray,
    num_points: int,
    pair_mask: Optional[np.ndarray] = None,
) -> ScatterPlan:
    """Precompute the chunk-bucketed layout for `idx`/`weights` [..., k].

    pair_mask: optional bool array broadcastable to idx's shape — False
    pairs are dropped (e.g. background pixels whose gradient is
    identically zero), shrinking both the gather and the kernel pass.
    """
    idx = np.asarray(idx)
    k = idx.shape[-1]
    flat = idx.reshape(-1).astype(np.int32, copy=False)
    w_flat = np.asarray(weights, np.float32).reshape(-1)
    pair_pos = np.arange(flat.size, dtype=np.int32)
    if pair_mask is not None:
        keep = np.broadcast_to(
            np.asarray(pair_mask, bool), idx.shape
        ).reshape(-1)
        pair_pos = pair_pos[keep]
        flat = flat[keep]
        w_flat = w_flat[keep]

    n_chunks = -(-num_points // CHUNK)
    chunk_of = (flat // CHUNK).astype(np.int32)
    chunk_counts = np.bincount(chunk_of, minlength=n_chunks)
    pb = int(max(int(chunk_counts.max()), 1))
    pb = -(-pb // PB_SLICE) * PB_SLICE

    # bucket placement: order pairs by chunk, then slot = chunk·PB +
    # rank-within-chunk. int16 sort keys keep numpy's radix argsort ~40%
    # faster and everything downstream stays int32 (N < 2^31); all
    # writes go through flat 1D fancy indexing.
    sort_keys = (
        chunk_of.astype(np.int16) if n_chunks < 2 ** 15 else chunk_of
    )
    order = np.argsort(sort_keys, kind="stable")
    chunk_starts = np.zeros(n_chunks + 1, np.int32)
    np.cumsum(chunk_counts, out=chunk_starts[1:])
    grouped_chunk = chunk_of[order]
    slot = grouped_chunk * np.int32(pb)
    slot += np.arange(flat.size, dtype=np.int32)
    slot -= chunk_starts[grouped_chunk]

    pix_id = np.zeros(n_chunks * pb, np.int32)
    w_pad = np.zeros(n_chunks * pb, np.float32)
    local = np.full(n_chunks * pb, CHUNK, np.int32)    # pad → matches no row
    pix_id[slot] = pair_pos[order] // np.int32(k)
    w_pad[slot] = w_flat[order]
    local[slot] = flat[order] - grouped_chunk * np.int32(CHUNK)
    return ScatterPlan(
        pix_id=jnp.asarray(pix_id.reshape(n_chunks, pb)),
        w=jnp.asarray(w_pad.reshape(n_chunks, pb)),
        local=jnp.asarray(local.reshape(n_chunks, pb)),
        num_points=num_points,
    )


def _segsum_kernel(channels, packed_ref, out_ref):
    """One (chunk, slice): out[C, 512] += Σ_p contrib_p[C] ⊗ onehot_p[512].

    `packed` [8, S] carries the C contribution channels in sublane rows
    0..C-1 and the pair's in-chunk point id (as f32) in row C — pairs
    ride the lane axis, so the one-hot compare is a free sublane
    broadcast and the whole tensor has zero tiling padding. Grid is
    (n_chunks, pb // PB_SLICE); the slice axis accumulates into the same
    output block (zeroed on its first visit)."""
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _zero():
        out_ref[0] = jnp.zeros((channels, CHUNK), jnp.float32)

    packed = packed_ref[0]                               # [8, S]
    c = packed[:channels]                                # [C, S]
    locf = packed[channels:channels + 1]                 # [1, S]
    # tpu.iota is integer-only; the int→f32 convert keeps the compare in
    # f32 against the packed (exactly representable) local ids
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, PB_SLICE), 0
    ).astype(jnp.float32)
    onehot_t = (locf == iota).astype(jnp.float32)        # [512, S]
    out_ref[0] += jax.lax.dot_general(
        c, onehot_t, (((1,), (1,)), ((), ())),           # contract pairs
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnums=(4,))
def planned_segment_sum(
    g: jnp.ndarray,             # [n_pixels, C] per-pixel cotangents
    pix_id: jnp.ndarray,        # [n_chunks, PB]
    w: jnp.ndarray,             # [n_chunks, PB]
    local: jnp.ndarray,         # [n_chunks, PB]
    num_points: int,
) -> jnp.ndarray:
    """d_points [num_points, C] = Σ_pairs w·g[pix_id] grouped by point."""
    n_chunks, pb = pix_id.shape
    channels = g.shape[-1]
    # the one random-access op: fetch each pair's pixel cotangent from the
    # pixel-sized table (the fast gather regime). Padding slots point at
    # row 0 but carry w == 0 and local == CHUNK, so they contribute 0.
    # The static pair weight folds in here, and everything is packed into
    # one [n_chunks, 8, pb] lane-major tensor (pairs on lanes): channels
    # in sublane rows 0..C-1, local id as f32 in row C — the layout has
    # zero T(8,128) tiling padding, unlike any [..., C]-minor variant.
    g_bucketed = jnp.take(
        g, pix_id.reshape(-1), axis=0, mode="clip",
    ).reshape(n_chunks, pb, channels)
    contrib_t = (g_bucketed * w[..., None]).transpose(0, 2, 1)
    locf = local.astype(jnp.float32)[:, None, :]
    pad_rows = 8 - channels - 1
    packed = jnp.concatenate(
        [contrib_t, locf,
         jnp.zeros((n_chunks, pad_rows, pb), jnp.float32)], axis=1,
    )

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, channels),
        grid=(n_chunks, pb // PB_SLICE),
        in_specs=[
            pl.BlockSpec((1, 8, PB_SLICE), lambda i, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, channels, CHUNK), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, channels, CHUNK), jnp.float32
        ),
    )(packed)
    # [n_chunks, C, 512] → [n_chunks·512, C]
    out = out.transpose(0, 2, 1).reshape(n_chunks * CHUNK, channels)
    return out[:num_points]
