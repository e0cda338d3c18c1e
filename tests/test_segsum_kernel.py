"""Planned segment-sum kernel vs jax.ops.segment_sum (interpret on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    # planned_segment_sum is jitted at module level — drop its cache so
    # each test traces under the patched pallas_call
    from nerfail_tpu.ops.pallas import segsum_kernel

    segsum_kernel.planned_segment_sum._clear_cache()
    yield
    segsum_kernel.planned_segment_sum._clear_cache()


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
    got = planned_segment_sum(
        jnp.asarray(g), plan.pix_id, plan.w, plan.local, M
    )
    contrib = (w[..., None] * g[:, None, :]).reshape(-1, 4)
    want = jax.ops.segment_sum(
        jnp.asarray(contrib), jnp.asarray(idx.reshape(-1)), num_segments=M
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


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
    got = planned_segment_sum(
        jnp.asarray(g), plan.pix_id, plan.w, plan.local, M
    )
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
    d_pl, m_pl = step_p(d0, *args, plan.pix_id, plan.w, plan.local)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(m_pl["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
