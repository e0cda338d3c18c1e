"""Planned segment-sum kernel vs jax.ops.segment_sum (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _as_args(plan):
    """LOCAL (shard-0) plan leaves as device arrays."""
    from nerfail_tpu.ops.pallas.segsum_kernel import local_leaves

    return tuple(jnp.asarray(a) for a in local_leaves(plan.leaves()))


def _dev_leaves(plan):
    return tuple(jnp.asarray(a) for a in plan.leaves())


def test_planned_matches_segment_sum(rng):
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        build_scatter_plan, planned_segment_sum,
    )

    M = 1500                      # not a multiple of CHUNK on purpose
    N = 20000
    idx = rng.integers(0, M, (N, 8)).astype(np.int32)
    w = rng.uniform(0, 1, (N, 8)).astype(np.float32)
    g = rng.standard_normal((N, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M)
    got = planned_segment_sum(jnp.asarray(g), _as_args(plan), M)
    contrib = (w[..., None] * g[:, None, :]).reshape(-1, 4)
    want = jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_skewed_popularity_stays_compact(rng):
    """Hot points must not blow up the plan (r2: global-max padding)."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        ROW_PB, build_scatter_plan, planned_segment_sum,
    )

    M = 4096
    N = 60000
    # 90% of pairs hit point 7 — one chunk is ~430k-hot, the rest sparse
    idx = rng.integers(0, M, (N, 8)).astype(np.int32)
    hot = rng.uniform(size=(N, 8)) < 0.9
    idx[hot] = 7
    w = rng.uniform(0, 1, (N, 8)).astype(np.float32)
    g = rng.standard_normal((N, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M)
    # row-based layout: total slots ≤ ~pairs + one width-class row per
    # chunk (+ quantized pad rows, ≤ 1/8 + a constant floor per class)
    n_chunks = -(-M // 512)
    slots = sum(p.pix_id.size for p in plan.parts)
    assert slots <= (N * 8 + n_chunks * ROW_PB) * 9 // 8 + 3 * 8 * ROW_PB
    assert plan.n_pairs == N * 8
    got = planned_segment_sum(jnp.asarray(g), _as_args(plan), M)
    contrib = (w[..., None] * g[:, None, :]).reshape(-1, 4)
    want = jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


def test_plan_is_host_resident(rng):
    from nerfail_tpu.ops.pallas.segsum_kernel import build_scatter_plan

    idx = rng.integers(0, 600, (50, 8)).astype(np.int32)
    w = rng.uniform(0, 1, (50, 8)).astype(np.float32)
    plan = build_scatter_plan(idx, w, 600)
    for a in plan.leaves():
        assert isinstance(a, np.ndarray)   # never device-resident by default
    assert plan.nbytes > 0


def test_pair_mask_drops_pairs(rng):
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        build_scatter_plan, planned_segment_sum,
    )

    M = 700
    B, H, W, k = 2, 8, 8, 8
    idx = rng.integers(0, M, (B, H, W, k)).astype(np.int32)
    w = rng.uniform(0, 1, (B, H, W, k)).astype(np.float32)
    mask = rng.uniform(size=(B, H, W, 1)) > 0.5
    g = rng.standard_normal((B * H * W, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M, pair_mask=mask)
    got = planned_segment_sum(jnp.asarray(g), _as_args(plan), M)
    keep = np.broadcast_to(mask, idx.shape).reshape(-1)
    contrib = (w.reshape(-1, k)[..., None]
               * g[:, None, :]).reshape(-1, 4) * keep[:, None]
    want = jax.ops.segment_sum(
        jnp.asarray(contrib),
        jnp.asarray(idx.reshape(-1)), num_segments=M,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_splat_gather_planned_grad_matches(rng):
    from nerfail_tpu.ops.pallas.segsum_kernel import build_scatter_plan
    from nerfail_tpu.ops.splat import splat_gather

    M = 600
    B, H, W, k = 1, 8, 8, 8
    points = jnp.asarray(rng.standard_normal((M, 4)).astype(np.float32))
    idx = rng.integers(0, M, (B, H, W, k)).astype(np.int32)
    w = jnp.asarray(rng.uniform(0, 1, (B, H, W, k)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, H, W, 4)).astype(np.float32))
    plan = build_scatter_plan(idx, np.asarray(w), M)
    idx_d = jnp.asarray(idx)

    out_ref, pull_ref = jax.vjp(
        lambda p: splat_gather(p, idx_d, w), points
    )
    out_pl, pull_pl = jax.vjp(
        lambda p: splat_gather(p, idx_d, w, plan=plan), points
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pull_pl(g)[0]), np.asarray(pull_ref(g)[0]),
        rtol=1e-5, atol=1e-4,
    )


def test_stale_plan_rejected(rng):
    """Consistency guard: a plan from another batch shape raises."""
    from nerfail_tpu.ops.pallas.segsum_kernel import build_scatter_plan
    from nerfail_tpu.ops.splat import splat_gather

    M = 600
    idx = jnp.asarray(rng.integers(0, M, (2, 8, 8, 8)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 8)).astype(np.float32))
    points = jnp.zeros((M, 4), jnp.float32)
    plan = build_scatter_plan(np.asarray(idx), np.asarray(w), M)

    with pytest.raises(ValueError, match="stale"):
        splat_gather(jnp.zeros((M + 512, 4)), idx, w, plan=plan)
    with pytest.raises(ValueError, match="stale"):
        splat_gather(points, idx[:1], w[:1], plan=plan)


def test_sharded_planned_matches_single(rng):
    """Mesh-sharded planned backward == single-device (VERDICT r2 #6)."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        build_scatter_plan, planned_segment_sum_sharded,
    )
    from nerfail_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, model_parallel=1)
    M = 900
    V, HW, k = 4, 64, 8
    idx = rng.integers(0, M, (V, HW, k)).astype(np.int32)
    w = rng.uniform(0, 1, (V, HW, k)).astype(np.float32)
    g = rng.standard_normal((V, HW, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M, n_shards=4)
    got = planned_segment_sum_sharded(
        jnp.asarray(g), _dev_leaves(plan), M, mesh,
    )
    contrib = (w[..., None] * g[..., None, :]).reshape(-1, 4)
    want = jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_nerfail_s_planned_step_matches_unplanned(rng):
    """The planned step must produce the same δ' as the default path."""
    from nerfail_tpu.attacks.nerfail_s import make_nerfail_s_step
    from nerfail_tpu.config import AttackConfig
    from nerfail_tpu.ops.pallas.segsum_kernel import build_scatter_plan

    Hs = 8
    P = 2
    n = 3
    M = P * Hs * Hs
    weights = rng.uniform(0, 1, (n, Hs, Hs, 8)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    idx = rng.integers(0, M, (n, Hs, Hs, 8)).astype(np.int32)
    ori = np.zeros((n, Hs, Hs, 4), np.float32)
    ori[..., :3] = 128.0
    ori[..., 3] = 255.0
    ori[0, :2] = 0.0        # some background pixels exercise the mask
    Wc = rng.standard_normal((Hs * Hs * 3, 4)).astype(np.float32) * 0.01
    logits_fn = lambda x: x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)
    labels = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, jnp.float32)
    d0 = np.zeros((P, Hs, Hs, 4), np.float32)
    d0[..., 3] = 255.0
    d0 = jnp.asarray(d0)

    cfg = AttackConfig(eps=32.0, a=2.0, batch_size=n)
    step = make_nerfail_s_step(logits_fn, cfg, None)
    step_p = make_nerfail_s_step(logits_fn, cfg, None, planned=True)
    plan = build_scatter_plan(idx, weights, M, pair_mask=ori[..., 3:] > 0)

    args = (d0, jnp.asarray(weights), jnp.asarray(idx), jnp.asarray(ori),
            labels, valid)
    d_ref, m_ref = step(d0, *args)
    d_pl, m_pl = step_p(d0, *args, *_dev_leaves(plan))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(m_pl["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)


def test_batched_deepfool_planned_matches_unplanned(rng):
    """NeRFail's DeepFool batch: planned Pallas backward == XLA scatter."""
    from nerfail_tpu.attacks.nerfail import make_batched_deepfool
    from nerfail_tpu.config import AttackConfig
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        build_batched_scatter_plan,
    )

    Hs, P, V = 8, 2, 3
    M = P * Hs * Hs
    weights = rng.uniform(0, 1, (V, Hs, Hs, 8)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    idx = rng.integers(0, M, (V, Hs, Hs, 8)).astype(np.int32)
    ori = np.zeros((V, Hs, Hs, 4), np.float32)
    ori[..., :3] = 128.0
    ori[..., 3] = 255.0
    Wc = rng.standard_normal((Hs * Hs * 3, 4)).astype(np.float32) * 0.01
    logits_fn = lambda x: x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)
    d0 = np.zeros((P, Hs, Hs, 4), np.float32)
    d0[..., 3] = 255.0
    d0 = jnp.asarray(d0)
    ori_logits = jnp.asarray(
        rng.standard_normal((V, 4)).astype(np.float32)
    )
    active = jnp.ones(V, bool)

    cfg = AttackConfig(eps=32.0, df_max_iter=6, batch_size=V)
    df = make_batched_deepfool(logits_fn, cfg, None, 4)
    df_p = make_batched_deepfool(logits_fn, cfg, None, 4, planned=True)
    plan = build_batched_scatter_plan(idx, weights, M)

    args = (d0, jnp.asarray(weights), jnp.asarray(idx), jnp.asarray(ori),
            ori_logits, active, 1.0, 0.5)
    rot_ref, it_ref, used_ref, _ = df(*args)
    rot_pl, it_pl, used_pl, _ = df_p(*args, *_dev_leaves(plan))
    np.testing.assert_array_equal(np.asarray(it_pl), np.asarray(it_ref))
    np.testing.assert_allclose(np.asarray(rot_pl), np.asarray(rot_ref),
                               rtol=1e-4, atol=1e-4)


def test_batched_plan_per_view_points(rng):
    """splat_gather_batched: per-view point tensors, combined plan."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        build_batched_scatter_plan,
    )
    from nerfail_tpu.ops.splat import splat_gather_batched

    V, M, HW, k = 3, 520, 40, 8
    pts = jnp.asarray(rng.standard_normal((V, M, 4)).astype(np.float32))
    idx = rng.integers(0, M, (V, HW, k)).astype(np.int32)
    w = rng.uniform(0, 1, (V, HW, k)).astype(np.float32)
    g = jnp.asarray(rng.standard_normal((V, HW, 4)).astype(np.float32))
    plan = build_batched_scatter_plan(idx, w, M)

    idx_d, w_d = jnp.asarray(idx), jnp.asarray(w)
    out_ref, pull_ref = jax.vjp(
        lambda p: splat_gather_batched(p, idx_d, w_d), pts
    )
    out_pl, pull_pl = jax.vjp(
        lambda p: splat_gather_batched(p, idx_d, w_d, plan=plan), pts
    )
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pull_pl(g)[0]), np.asarray(pull_ref(g)[0]),
        rtol=1e-5, atol=1e-4,
    )


def test_planned_segment_sq_matches_dense(rng):
    """Norm pass: per-chunk squared sums == square of the dense result."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        CHUNK, build_scatter_plan, planned_segment_sq, planned_segment_sum,
    )

    M = 1300
    N = 6000
    C = 16                     # multi-channel (the DeepFool norm stack)
    idx = rng.integers(0, M, (N, 8)).astype(np.int32)
    w = rng.uniform(0, 1, (N, 8)).astype(np.float32)
    g = rng.standard_normal((N, C)).astype(np.float32)
    plan = build_scatter_plan(idx, w, M)
    args = _as_args(plan)

    dense = planned_segment_sum(jnp.asarray(g), args, M)       # [M, C]
    n_chunks = -(-M // CHUNK)
    pad = n_chunks * CHUNK - M
    dense_p = jnp.pad(dense, ((0, pad), (0, 0)))
    want = jnp.sum(
        dense_p.reshape(n_chunks, CHUNK, C) ** 2, axis=1
    )
    got = planned_segment_sq(jnp.asarray(g), args, M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_empty_chunks_compact_away(rng):
    """Plans visit only NONEMPTY point chunks: with pairs confined to a
    thin id band, row count tracks the band (plus spill + 1 pad row),
    not the full chunk count — and expansion still yields exact dense
    zeros for the untouched chunks."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        CHUNK, ROW_PB, build_scatter_plan, planned_segment_sum,
    )

    M = 200 * CHUNK                 # 200 chunks...
    N = 4000
    lo, hi = 7 * CHUNK, 12 * CHUNK  # ...but only 5 receive pairs
    idx = rng.integers(lo, hi, (N, 8)).astype(np.int32)
    w = rng.uniform(0, 1, (N, 8)).astype(np.float32)
    g = rng.standard_normal((N, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M)
    touched = 5
    # slots scale with the touched band (+ class floors), NOT the 200
    # chunks: each touched chunk costs ≤ one row of its own width class
    slots = sum(p.pix_id.size for p in plan.parts)
    assert slots <= N * 8 + touched * ROW_PB + 3 * 8 * ROW_PB, (
        f"{slots} slots for {touched} touched chunks — "
        "empty chunks not compacted"
    )
    got = np.asarray(planned_segment_sum(jnp.asarray(g), _as_args(plan), M))
    contrib = (w[..., None] * g[:, None, :]).reshape(-1, 4)
    want = np.asarray(jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # untouched chunks are exactly zero (routed through the Z block)
    assert np.all(got[:lo] == 0.0) and np.all(got[hi:] == 0.0)


def test_adaptive_width_bounds_padding(rng):
    """At attack sparsity (most nonempty chunks carry a handful of
    pairs) per-chunk padding is bounded by the chunk's OWN width class —
    plan slots stay within ~2× the real pair count instead of the old
    fixed 2048-wide row per chunk (~88% padding, VERDICT r4 weak #5)."""
    from nerfail_tpu.ops.pallas.segsum_kernel import (
        CHUNK, build_scatter_plan, planned_segment_sum,
    )

    M = 400 * CHUNK
    N = 3000
    # ~40 pairs per chunk on average, spread over ALL chunks
    idx = rng.integers(0, M, (N, 8)).astype(np.int32)
    w = rng.uniform(0, 1, (N, 8)).astype(np.float32)
    g = rng.standard_normal((N, 4)).astype(np.float32)

    plan = build_scatter_plan(idx, w, M)
    slots = sum(p.pix_id.size for p in plan.parts)
    old_layout = 400 * 2048          # one fixed 2048-wide row per chunk
    assert slots <= old_layout // 8, (
        f"{slots} slots for {N * 8} pairs — width classes not engaged "
        f"(fixed-width layout would use {old_layout})"
    )
    got = planned_segment_sum(jnp.asarray(g), _as_args(plan), M)
    contrib = (w[..., None] * g[:, None, :]).reshape(-1, 4)
    want = jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_quantized_rows_share_shapes(rng):
    """Nearby batch sizes produce identical per-class row counts, so
    repeated attack batches reuse one jitted step instead of
    recompiling per batch's exact row count."""
    from nerfail_tpu.ops.pallas.segsum_kernel import build_scatter_plan

    M = 2000

    def shapes(n):
        idx = rng.integers(0, M, (n, 8)).astype(np.int32)
        w = rng.uniform(0, 1, (n, 8)).astype(np.float32)
        plan = build_scatter_plan(idx, w, M)
        return tuple(p.pix_id.shape for p in plan.parts)

    seen = {shapes(n) for n in (5000, 5005, 5010, 5020)}
    assert len(seen) == 1, f"row counts not quantized: {seen}"
