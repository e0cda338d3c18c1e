"""Pallas k-NN kernel vs brute force / KD-tree (interpret mode on CPU)."""

import numpy as np
import pytest

from nerfail_tpu.ops.pallas.knn_kernel import (
    _candidates, _morton_order, _tile_bboxes, knn_pallas,
)


def _brute(q, p, k):
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.sqrt(np.take_along_axis(d2, idx, 1)), idx


@pytest.mark.parametrize("prune", [False, True])
def test_knn_pallas_matches_brute(prune):
    rng = np.random.default_rng(0)
    q = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    p = rng.uniform(-2, 2, (1100, 3)).astype(np.float32)
    d, i = knn_pallas(q, p, k=8, tq=64, tp=128, prune=prune, interpret=True)
    bd, bi = _brute(q, p, 8)
    np.testing.assert_allclose(d, bd, rtol=1e-5, atol=1e-6)
    # indices may differ only through exact distance ties (none expected
    # with random floats)
    np.testing.assert_array_equal(i, bi)


def test_knn_pallas_structured_surface():
    """Clustered surface-like data — the regime the bbox pruning targets."""
    rng = np.random.default_rng(1)
    theta = rng.uniform(0, 2 * np.pi, 2000)
    phi = rng.uniform(0, np.pi, 2000)
    p = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)], -1
    ).astype(np.float32)
    q = p[:400] + rng.normal(0, 0.01, (400, 3)).astype(np.float32)
    d, i = knn_pallas(q, p, k=8, tq=128, tp=256, prune=True, interpret=True)
    bd, bi = _brute(q, p, 8)
    np.testing.assert_allclose(d, bd, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, bi)


def test_knn_pallas_matches_host_tree():
    from nerfail_tpu.pointset.knn_build import knn_host_tree

    rng = np.random.default_rng(2)
    q = rng.uniform(-1, 1, (257, 3)).astype(np.float32)   # non-tile-multiple
    p = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)  # partial last tile
    d, i = knn_pallas(q, p, k=8, tq=64, tp=128, interpret=True)
    hd, hi = knn_host_tree(q, p, k=8)
    np.testing.assert_allclose(d, hd, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, hi)


def test_candidate_pruning_is_exact_and_prunes():
    """Every true 8-NN's tile must be in the candidate list, and far
    tiles must actually get pruned on clustered data."""
    rng = np.random.default_rng(3)
    # two well-separated clusters
    p = np.concatenate([
        rng.normal(0, 0.1, (512, 3)),
        rng.normal(5, 0.1, (512, 3)),
    ]).astype(np.float32)
    q = rng.normal(0, 0.1, (128, 3)).astype(np.float32)

    pperm = _morton_order(p)
    qperm = _morton_order(q)
    ps, qs = p[pperm], q[qperm]
    tp, tq = 128, 64
    p_lo, p_hi = _tile_bboxes(ps, tp)
    q_lo, q_hi = _tile_bboxes(qs, tq)
    cand = _candidates(q_lo, q_hi, p_lo, p_hi, len(p) // tp, 8, tp)

    _, bi = _brute(qs, ps, 8)
    needed_tiles = np.unique(bi // tp)
    for i in range(cand.shape[0]):
        got = set(cand[i][cand[i] >= 0].tolist())
        assert set(needed_tiles[np.isin(
            needed_tiles, list(got), invert=False
        )].tolist()) <= got or set(
            np.unique(bi[i * tq:(i + 1) * tq] // tp).tolist()
        ) <= got
    # the far cluster's tiles are pruned for near-origin queries
    assert (cand >= 0).sum() < cand.shape[0] * (len(p) // tp)


def test_morton_order_locality():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
    perm = _morton_order(x)
    xs = x[perm]
    # consecutive-tile bbox diagonal much smaller than global diagonal
    lo, hi = _tile_bboxes(xs, 256)
    diag = np.linalg.norm(hi - lo, axis=1).mean()
    assert diag < 0.75 * np.linalg.norm(x.max(0) - x.min(0))


def test_knn_pallas_grouped_calls_match_brute(monkeypatch):
    """Force the SMEM candidate budget low enough that one image sweep
    splits into many width-bucketed kernel calls (the full-scale path:
    640K queries × 1.92M points cannot prefetch one cand table)."""
    import nerfail_tpu.ops.pallas.knn_kernel as KK

    monkeypatch.setattr(KK, "_SMEM_CAND_INTS", 64)
    rng = np.random.default_rng(7)
    # near cluster + far shell → wildly different per-tile cand widths
    q = np.concatenate([
        rng.uniform(-1, 1, (512, 3)),
        rng.uniform(-8, 8, (256, 3)),
    ]).astype(np.float32)
    p = np.concatenate([
        rng.uniform(-1, 1, (1500, 3)),
        rng.uniform(-8, 8, (548, 3)),
    ]).astype(np.float32)
    prep = KK.KnnPrep(p, tp=128)
    d, i = knn_pallas(q, prep=prep, k=8, tq=64, interpret=True)
    bd, bi = _brute(q, p, 8)
    np.testing.assert_allclose(d, bd, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, bi)


def test_knn_prep_reused_across_images():
    rng = np.random.default_rng(8)
    p = rng.uniform(-2, 2, (900, 3)).astype(np.float32)
    prep = __import__(
        "nerfail_tpu.ops.pallas.knn_kernel", fromlist=["KnnPrep"]
    ).KnnPrep(p, tp=128)
    for seed in (1, 2):
        q = np.random.default_rng(seed).uniform(
            -2, 2, (200, 3)
        ).astype(np.float32)
        d, i = knn_pallas(q, prep=prep, k=8, tq=64, interpret=True)
        bd, bi = _brute(q, p, 8)
        np.testing.assert_allclose(d, bd, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i, bi)


def test_knn_query_plan_matches_direct():
    """A KnnQueryPlan built off the call path (as the table build's
    prefetch thread does) yields bit-identical results to the direct
    queries= path."""
    from nerfail_tpu.ops.pallas.knn_kernel import KnnPrep, KnnQueryPlan

    rng = np.random.default_rng(11)
    p = rng.uniform(-2, 2, (1000, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (260, 3)).astype(np.float32)
    prep = KnnPrep(p, tp=128)
    d1, i1 = knn_pallas(q, prep=prep, k=8, tq=64, interpret=True)
    plan = KnnQueryPlan(q, prep, k=8, tq=64)
    d2, i2 = knn_pallas(plan=plan, interpret=True)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)
    bd, bi = _brute(q, p, 8)
    np.testing.assert_allclose(d2, bd, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i2, bi)
