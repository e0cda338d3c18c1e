"""Tests for streaming k-NN, gaussian weights, and the splat op."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.ops.splat import splat_gather, _splat_fwd_impl
from nerfail_tpu.pointset.knn_build import build_index_and_dist, knn_topk
from nerfail_tpu.pointset.weights import gauss_weights

from numpy_ref import knn_np


class TestKNN:
    def test_matches_bruteforce(self, rng):
        q = rng.standard_normal((50, 3)).astype(np.float32)
        pts = rng.standard_normal((333, 3)).astype(np.float32)
        d, i = knn_topk(jnp.asarray(q), jnp.asarray(pts), k=8, s_tile=64)
        d_ref, i_ref = knn_np(q, pts, k=8)
        np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)
        # indices can differ on exact ties; distances define correctness
        got_d_from_idx = np.linalg.norm(q[:, None] - pts[np.asarray(i)], axis=-1)
        np.testing.assert_allclose(got_d_from_idx, d_ref, rtol=1e-4, atol=1e-5)

    def test_self_distance_zero(self, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        d, i = knn_topk(jnp.asarray(pts), jnp.asarray(pts), k=2, s_tile=32)
        np.testing.assert_allclose(np.asarray(d[:, 0]), 0.0, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(i[:, 0]), np.arange(100))

    def test_build_index_and_dist_shape(self, rng):
        cm = rng.standard_normal((6, 5, 3)).astype(np.float32)
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        dist, idx = build_index_and_dist(cm, jnp.asarray(pts), k=4, s_tile=16)
        assert dist.shape == (6, 5, 4) and idx.shape == (6, 5, 4)
        assert np.all(np.diff(dist, axis=-1) >= -1e-6)  # ascending


class TestGaussWeights:
    def test_formula(self, rng):
        d = np.abs(rng.standard_normal((4, 4, 8))).astype(np.float32) * 0.01
        w = np.asarray(gauss_weights(jnp.asarray(d), c=0.02, eps=0.001))
        raw = np.exp(-((d / 0.02) ** 2) / 2.0)
        want = raw / (raw.sum(-1, keepdims=True) + 0.001)
        np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-6)

    def test_far_points_zero(self):
        d = jnp.full((2, 2, 8), 100.0)  # exp(-huge) == 0 → sum == 0 → zeros
        w = np.asarray(gauss_weights(d))
        np.testing.assert_array_equal(w, 0.0)


class TestSplat:
    def test_forward(self, rng):
        pts = rng.standard_normal((20, 4)).astype(np.float32)
        idx = rng.integers(0, 20, (3, 3, 8)).astype(np.int32)
        w = rng.uniform(0, 1, (3, 3, 8)).astype(np.float32)
        out = np.asarray(splat_gather(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w)))
        want = (pts[idx] * w[..., None]).sum(-2)
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_custom_vjp_matches_autodiff(self, rng):
        pts = rng.standard_normal((16, 4)).astype(np.float32)
        idx = rng.integers(0, 16, (4, 5, 8)).astype(np.int32)
        w = rng.uniform(0, 1, (4, 5, 8)).astype(np.float32)
        jp, ji, jw = jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w)

        def loss_custom(p, ww):
            # static_w=False: full cotangents (the default skips d_w — every
            # attack treats the weight table as a constant)
            return jnp.sum(splat_gather(p, ji, ww, static_w=False) ** 2)

        def loss_auto(p, ww):
            return jnp.sum(_splat_fwd_impl(p, ji, ww) ** 2)

        gp_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(jp, jw)
        gp_a, gw_a = jax.grad(loss_auto, argnums=(0, 1))(jp, jw)
        np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a), rtol=1e-4, atol=1e-5)

    def test_default_path_skips_w_cotangent(self, rng):
        """The hot path returns d_points only; d_w comes back as zeros."""
        pts = rng.standard_normal((16, 4)).astype(np.float32)
        idx = rng.integers(0, 16, (4, 5, 8)).astype(np.int32)
        w = rng.uniform(0, 1, (4, 5, 8)).astype(np.float32)
        jp, ji, jw = jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w)

        def loss(p, ww):
            return jnp.sum(splat_gather(p, ji, ww) ** 2)

        gp, gw = jax.grad(loss, argnums=(0, 1))(jp, jw)
        gp_a = jax.grad(lambda p: jnp.sum(_splat_fwd_impl(p, ji, jw) ** 2))(jp)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_a),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(gw), 0.0)
