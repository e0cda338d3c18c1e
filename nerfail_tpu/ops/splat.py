"""Differentiable 8-NN Gaussian splat: point-set RGBA → per-pixel RGBA.

The heart of every attack iteration (reference GaussNet.py:60-119): each
pixel gathers its 8 nearest point-set entries and blends them with
precomputed Gaussian weights. The backward pass is the transpose — a
scatter-add of pixel gradients into the point tensor with 8-way index
collisions (SURVEY.md §7 "hard parts").

Forward: one gather + weighted sum (`jnp.take` + einsum); XLA fuses the
multiply-accumulate. Backward: a custom VJP that computes dL/d(points)
either as `jax.ops.segment_sum` over the flattened (pixel, neighbor)
pairs, or — given a host-precomputed `ScatterPlan` — as the chunk-aligned
Pallas segment-sum (ops/pallas/segsum_kernel), ~6× faster at attack scale.

Every attack treats idx AND w as static tables (they come from the
precomputed 8-NN neighbor maps), so by default no cotangent is computed
for w — the d_w gather is another 41M-id pass that all callers discard
(`static_w=False` restores it). The planned path never produces d_w: a
caller differentiating w.r.t. weights must use the unplanned path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def splat_gather(
    points: jnp.ndarray,
    idx: jnp.ndarray,
    w: jnp.ndarray,
    plan=None,
    mesh=None,
    static_w: bool = True,
):
    """points [M, C], idx [..., k] int32, w [..., k] → [..., C].

    out = Σ_j w_j · points[idx_j]

    With a `ScatterPlan` the backward runs the Pallas segment-sum; with a
    `mesh` as well (plan built with n_shards = mesh data-axis size) the
    leading (view) axis shards over the mesh and the [M, C] cotangent
    psums over ICI — the multi-view gradient all-reduce of SURVEY §5.
    """
    if plan is None:
        if static_w:
            return _splat_gather_static_w(points, idx, w)
        return _splat_gather(points, idx, w)
    _check_plan(plan, points.shape[0], idx, mesh)
    leaves = plan.leaves()
    fn = _planned_splat(mesh, True, len(leaves))
    return fn(points, idx, w, *leaves)


def splat_gather_batched(
    points_b: jnp.ndarray,      # [V, M, C] per-view point tensors
    idx: jnp.ndarray,           # [V, ..., k]
    w: jnp.ndarray,             # [V, ..., k]
    plan=None,                  # from build_batched_scatter_plan
    mesh=None,
):
    """Per-view splat: out[v] = Σ_j w[v]_j · points_b[v][idx[v]_j].

    The batched DeepFool walks every view's own perturbed copy of the
    point set in one step; its backward is a single combined-plan Pallas
    pass over the [V·M] output space instead of V separate scatters
    (idx/w are static — no cotangents)."""
    if plan is None:
        return jax.vmap(_splat_gather_static_w)(points_b, idx, w)
    V, M, C = points_b.shape
    _check_batched_plan(plan, V, M, idx, mesh)
    leaves = plan.leaves()
    fn = _planned_splat_batched(mesh, len(leaves))
    return fn(points_b, idx, w, *leaves)


def _check_batched_plan(plan, V, M, idx, mesh):
    from nerfail_tpu.ops.pallas.segsum_kernel import padded_points

    S = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    expect = (V // S) * padded_points(M)
    if plan.num_points != expect:
        raise ValueError(
            f"batched plan covers {plan.num_points} rows, step needs "
            f"{expect} (V={V}, M={M}, shards={S}) — stale plan?"
        )
    _check_pixels(plan, idx, S)


def _check_plan(plan, m, idx, mesh):
    if plan.num_points != m:
        raise ValueError(
            f"plan covers {plan.num_points} points, tensor has {m} — "
            "stale plan?"
        )
    S = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    if plan.n_shards != S:
        raise ValueError(
            f"plan has {plan.n_shards} shards, mesh data axis is {S}"
        )
    _check_pixels(plan, idx, S)


def _check_pixels(plan, idx, n_shards):
    n_pix = int(idx[..., 0].size) // n_shards
    if plan.n_pixels != n_pix:
        raise ValueError(
            f"plan was built for {plan.n_pixels} pixels/shard, "
            f"batch has {n_pix} — stale plan?"
        )


def _splat_fwd_impl(points, idx, w):
    gathered = jnp.take(points, idx, axis=0)          # [..., k, C]
    return jnp.sum(w[..., None] * gathered, axis=-2)  # [..., C]


def _d_points_segment_sum(g, idx, w, M):
    C = g.shape[-1]
    contrib = (w[..., None] * g[..., None, :]).reshape(-1, C)   # [P·k, C]
    return jax.ops.segment_sum(
        contrib, idx.reshape(-1), num_segments=M,
        indices_are_sorted=False,
    )


# ------------------------------------------------- unplanned, d_w computed


@jax.custom_vjp
def _splat_gather(points, idx, w):
    return _splat_fwd_impl(points, idx, w)


def _splat_fwd(points, idx, w):
    return _splat_fwd_impl(points, idx, w), (points, idx, w)


def _splat_bwd(res, g):
    points, idx, w = res
    d_points = _d_points_segment_sum(g, idx, w, points.shape[0])
    # d w: dot of g with the gathered rows (a second pair-count gather)
    gathered = jnp.take(points, idx, axis=0)                    # [..., k, C]
    d_w = jnp.sum(gathered * g[..., None, :], axis=-1)          # [..., k]
    return d_points, None, d_w


_splat_gather.defvjp(_splat_fwd, _splat_bwd)


# ------------------------------------------------- unplanned, static w


@jax.custom_vjp
def _splat_gather_static_w(points, idx, w):
    return _splat_fwd_impl(points, idx, w)


def _splat_static_fwd(points, idx, w):
    return _splat_fwd_impl(points, idx, w), (points.shape[0], idx, w)


def _splat_static_bwd(res, g):
    M, idx, w = res
    return _d_points_segment_sum(g, idx, w, M), None, None


_splat_gather_static_w.defvjp(_splat_static_fwd, _splat_static_bwd)


def splat_deepfool_engine(
    head_fn,                    # pix [V, ..., C] → logits [V, n_classes]
    points_b: jnp.ndarray,      # [V, M, C] per-view point tensors
    idx: jnp.ndarray,           # [V, ..., k]
    w: jnp.ndarray,             # [V, ..., k]
    plan,                       # from build_batched_scatter_plan
    num_classes: int,
    ori_label: jnp.ndarray,     # [V] clean predictions
    mesh=None,
):
    """One DeepFool iteration's jacobian quantities WITHOUT the jacobian.

    Returns (logits [V, n_cls], sq [V, n_cls], pick) where
    sq[v, k] = ‖∂(logit_k − logit_ori)/∂points_b[v]‖² and
    pick(k [V]) → gdiff [V, M, C] for each view's chosen class.

    The full per-class jacobian is [n_cls, V, M, C] ≈ 8 GB at reference
    scale (8×800², M=1.92M) — it OOMs a v5e outright. Instead:
      1. n_cls pullbacks through `head_fn` ONLY (composite+resize+
         classifier) give pixel-space cotangents G (~0.7 GB);
      2. Gdiff = G − G[ori] stacks classes into multi-channel plan walks
         whose kernel emits ONLY per-chunk squared sums
         (planned_segment_sq) — the norms fall out without the
         point-space tensors ever existing. Classes walk in groups of
         8//C (the packed [n_rows, pad8(ch+1), 2048] operand for all 32
         channels at once is ~11 GB at bench scale; per-group it stays
         under ~4 GB);
      3. `pick` runs one more C-channel pass for the chosen class only.
    Total: n_cls//2 + 1 plan walks per iteration (vs n_cls full splat
    backwards), each with 2× the MXU rows of a single-class backward.
    """
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        CHUNK, local_leaves, padded_points, planned_segment_sq_T,
        planned_segment_sum_T, shard_specs,
    )

    V, M, C = points_b.shape
    _check_batched_plan(plan, V, M, idx, mesh)
    S = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    mp = padded_points(M)
    nc_view = mp // CHUNK
    leaves = plan.leaves()

    pix = jax.vmap(_splat_fwd_impl)(points_b, idx, w)    # [V, ..., C]
    logits, pullback = jax.vjp(head_fn, pix)
    eye = jnp.eye(num_classes, dtype=logits.dtype)
    n_pix = pix.size // (V * C)
    # EVERYTHING below stays channel-major ([..., n_pix] minor): a
    # [..., n_pix, C≤32] array gets lane-padded up to 16× by the (8,128)
    # tiling — 9.8 GB for the full class stack at 8×800² (OOM), vs zero
    # padding with pixels on the lanes. The pullbacks therefore walk in
    # SEQUENTIAL class pairs (lax.map) whose cotangents transpose to
    # channel-major before the next pair runs: only one pair's C-minor
    # temp is ever live (~⅛ of the stack), which is what lets view_batch
    # reach 8 inside 16 GB (VERDICT r3 weak #4).
    # odd class counts fall back to one-at-a-time pullbacks (ADVICE r4)
    pull_group = 2 if num_classes % 2 == 0 else 1

    def pull_pair(E):                                    # E [pg, ncls]
        Gg = jax.vmap(
            lambda e: pullback(jnp.broadcast_to(e, (V, num_classes)))[0]
        )(E)                                             # [pg, V, ..., C]
        return jnp.moveaxis(Gg.reshape(pull_group, V, n_pix, C), 3, 1)

    G = jax.lax.map(
        pull_pair, eye.reshape(num_classes // pull_group, pull_group,
                               num_classes)
    ).reshape(num_classes, C, V, n_pix)                  # [ncls, C, V, pix]
    G_ori = jnp.take_along_axis(
        G, ori_label[None, None, :, None], axis=0
    )
    Gdiff = (G - G_ori).reshape(num_classes * C, V, n_pix)

    group = max(1, 8 // C)          # classes per norm walk (8 channels)
    while num_classes % group:      # any head size works, just less packed
        group -= 1
    n_groups = num_classes // group
    Ggrp = Gdiff.reshape(n_groups, group * C, V, n_pix)

    def sq_one_group(Gg):                                # [grp·C, V, pix]
        if mesh is None:
            return planned_segment_sq_T(
                Gg.reshape(group * C, -1), local_leaves(leaves), V * mp,
            )                                            # [V·nc, grp·C]
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        Gg = jax.lax.with_sharding_constraint(
            Gg, NamedSharding(mesh, P(None, "data", None))
        )

        def local_sq(g_l, *leaves_l):
            return planned_segment_sq_T(
                g_l.reshape(group * C, -1), local_leaves(leaves_l),
                (V // S) * mp,
            )

        return shard_map(
            local_sq, mesh=mesh,
            in_specs=(P(None, "data", None),)
            + shard_specs(leaves, mesh),
            out_specs=P("data", None), check_vma=False,
        )(Gg, *leaves)

    # lax.map forces the group walks SEQUENTIAL so only one group's
    # gather/pack temporaries are live at a time; a python loop lets the
    # XLA scheduler interleave all groups and sum their footprints
    sq_chunks = jax.lax.map(sq_one_group, Ggrp)  # [n_groups, V·nc, grp·C]
    sq = jnp.concatenate(
        [c.reshape(V, nc_view, group, C).sum(axis=(1, 3))
         for c in sq_chunks], axis=-1,
    )                                                    # [V, ncls]

    def pick(k: jnp.ndarray) -> jnp.ndarray:             # k [V] → [V, M, C]
        Gsel = jnp.take_along_axis(
            Gdiff.reshape(num_classes, C, V, n_pix),
            k[None, None, :, None], axis=0,
        )[0]                                             # [C, V, n_pix]
        if mesh is None:
            flat = planned_segment_sum_T(
                Gsel.reshape(C, -1), local_leaves(leaves), V * mp,
            )                                            # [C, V·mp]
        else:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            Gs = jax.lax.with_sharding_constraint(
                Gsel, NamedSharding(mesh, P(None, "data", None))
            )

            def local_sum(g_l, *leaves_l):
                return planned_segment_sum_T(
                    g_l.reshape(C, -1), local_leaves(leaves_l),
                    (V // S) * mp,
                )

            flat = shard_map(
                local_sum, mesh=mesh,
                in_specs=(P(None, "data", None),)
                + shard_specs(leaves, mesh),
                out_specs=P(None, "data"), check_vma=False,
            )(Gs, *leaves)
        out = flat.reshape(C, V, mp)[:, :, :M]           # [C, V, M]
        return jnp.moveaxis(out, 0, 2)                   # [V, M, C]

    return logits, sq, pick


# ------------------------------------------------- planned (Pallas backward)


@functools.lru_cache(maxsize=None)
def _planned_splat(mesh, reduce: bool, n_leaves: int):
    """custom_vjp splat whose backward is the planned Pallas segment-sum.

    Built per (mesh, reduce, n_leaves) — jax.sharding.Mesh is hashable,
    the backward needs the mesh statically for shard_map, and the plan's
    flat leaf count fixes the signature (ops/pallas/segsum_kernel
    `ScatterPlan.leaves`)."""

    @jax.custom_vjp
    def f(points, idx, w, *leaves):
        return _splat_fwd_impl(points, idx, w)

    def fwd(points, idx, w, *leaves):
        out = _splat_fwd_impl(points, idx, w)
        return out, (points.shape, idx.shape, leaves)

    def bwd(res, g):
        from nerfail_tpu.ops.pallas.segsum_kernel import (
            local_leaves, planned_segment_sum, planned_segment_sum_sharded,
        )

        points_shape, idx_shape, leaves = res
        M, C = points_shape
        if mesh is None:
            d_points = planned_segment_sum(
                g.reshape(-1, C), local_leaves(leaves), M,
            )
        else:
            V = idx_shape[0]
            d_points = planned_segment_sum_sharded(
                g.reshape(V, -1, C), leaves, M, mesh, reduce=True,
            )
        return (d_points, None, None) + (None,) * n_leaves

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _planned_splat_batched(mesh, n_leaves: int):
    """Per-view-points variant: cotangent stays view-local ([V, M, C])."""

    @jax.custom_vjp
    def f(points_b, idx, w, *leaves):
        return jax.vmap(_splat_fwd_impl)(points_b, idx, w)

    def fwd(points_b, idx, w, *leaves):
        out = jax.vmap(_splat_fwd_impl)(points_b, idx, w)
        return out, (points_b.shape, leaves)

    def bwd(res, g):
        from nerfail_tpu.ops.pallas.segsum_kernel import (
            local_leaves, padded_points, planned_segment_sum,
            planned_segment_sum_sharded,
        )

        points_shape, leaves = res
        V, M, C = points_shape
        mp = padded_points(M)   # view v owns rows [v·mp, v·mp + M)
        if mesh is None:
            flat = planned_segment_sum(
                g.reshape(-1, C), local_leaves(leaves), V * mp,
            )
        else:
            S = int(mesh.shape.get("data", 1))
            flat = planned_segment_sum_sharded(
                g.reshape(V, -1, C), leaves, (V // S) * mp, mesh,
                reduce=False,
            )
        return (flat.reshape(V, mp, C)[:, :M], None, None) \
            + (None,) * n_leaves

    f.defvjp(fwd, bwd)
    return f
