"""Unit tests for the pure-function NeRF math vs the numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfail_tpu.config import NeRFModelConfig
from nerfail_tpu.models.nerf import apply_nerf, init_nerf_params
from nerfail_tpu.ops.encoding import encoder_output_dim, positional_encoding
from nerfail_tpu.ops.rays import get_rays, get_rays_np
from nerfail_tpu.ops.sampling import sample_pdf, stratified_z_vals
from nerfail_tpu.ops.volume import exclusive_cumprod, raw2outputs

from numpy_ref import embed_np, mlp_np, raw2outputs_np, sample_pdf_np


class TestEncoding:
    def test_shape(self):
        x = jnp.zeros((7, 3))
        assert positional_encoding(x, 10).shape == (7, 63)
        assert positional_encoding(x, 4).shape == (7, 27)
        assert encoder_output_dim(3, 10) == 63
        assert encoder_output_dim(3, 4) == 27

    def test_matches_reference_layout(self, rng):
        x = rng.standard_normal((16, 3)).astype(np.float32)
        got = np.asarray(positional_encoding(jnp.asarray(x), 6))
        want = embed_np(x, 6)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_identity_when_zero_freqs(self):
        x = jnp.ones((4, 3))
        np.testing.assert_array_equal(positional_encoding(x, 0), x)


class TestRays:
    def test_jax_matches_numpy(self, rng):
        H, W = 12, 16
        K = np.array([[20.0, 0, 8.0], [0, 20.0, 6.0], [0, 0, 1]], np.float32)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[:3, 3] = [0.5, -0.2, 1.0]
        o_np, d_np = get_rays_np(H, W, K, c2w)
        o_j, d_j = get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(o_j), o_np, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d_j), d_np, rtol=1e-6)

    def test_center_pixel_points_forward(self):
        K = jnp.array([[10.0, 0, 2.0], [0, 10.0, 2.0], [0, 0, 1]])
        c2w = jnp.eye(4)[:3]
        _, d = get_rays(4, 4, K, c2w)
        # pixel (2,2) is the principal point → direction (0, 0, -1)
        np.testing.assert_allclose(np.asarray(d[2, 2]), [0, 0, -1], atol=1e-6)


class TestSampling:
    def test_deterministic_linspace(self):
        z = stratified_z_vals(5, 8, 2.0, 6.0)
        assert z.shape == (5, 8)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2, 6, 8), rtol=1e-6)

    def test_jitter_stays_in_bins(self):
        key = jax.random.PRNGKey(0)
        z = stratified_z_vals(64, 16, 2.0, 6.0, key=key)
        zd = stratified_z_vals(64, 16, 2.0, 6.0)
        mids = 0.5 * (zd[:, 1:] + zd[:, :-1])
        lower = jnp.concatenate([zd[:, :1], mids], axis=-1)
        upper = jnp.concatenate([mids, zd[:, -1:]], axis=-1)
        assert bool(jnp.all(z >= lower)) and bool(jnp.all(z <= upper))

    def test_lindisp(self):
        z = stratified_z_vals(1, 5, 1.0, 10.0, lindisp=True)
        np.testing.assert_allclose(
            np.asarray(1.0 / z[0]),
            np.linspace(1.0, 0.1, 5), rtol=1e-6,
        )

    def test_sample_pdf_matches_oracle(self, rng):
        bins = np.sort(rng.uniform(2, 6, size=(9, 13)), axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(9, 12)).astype(np.float32)
        got = np.asarray(
            sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 17, det=True)
        )
        want = sample_pdf_np(bins, weights, 17)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_sample_pdf_concentrates_mass(self):
        # all the weight in one bin → all samples land inside it
        bins = jnp.linspace(0.0, 1.0, 11)[None, :].repeat(3, 0)
        weights = jnp.zeros((3, 10)).at[:, 4].set(1.0)
        s = sample_pdf(bins, weights, 32, det=True)
        frac_in = jnp.mean(((s >= 0.4) & (s <= 0.5)).astype(jnp.float32))
        assert float(frac_in) > 0.9


class TestVolume:
    def test_exclusive_cumprod(self):
        x = jnp.array([[2.0, 3.0, 4.0]])
        np.testing.assert_allclose(
            np.asarray(exclusive_cumprod(x)), [[1.0, 2.0, 6.0]], rtol=1e-6
        )

    def test_matches_oracle(self, rng):
        N, S = 6, 11
        raw = rng.standard_normal((N, S, 4)).astype(np.float32)
        z = np.sort(rng.uniform(2, 6, (N, S)), axis=-1).astype(np.float32)
        d = rng.standard_normal((N, 3)).astype(np.float32)
        out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
        rgb, acc, depth, weights = raw2outputs_np(raw, z, d)
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), acc, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["weights"]), weights, rtol=1e-4, atol=1e-5)

    def test_white_background(self, rng):
        raw = np.full((2, 4, 4), -100.0, np.float32)  # zero density
        z = np.tile(np.linspace(2, 6, 4, dtype=np.float32), (2, 1))
        d = np.tile(np.array([0.0, 0, -1], np.float32), (2, 1))
        out = raw2outputs(
            jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkgd=True
        )
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-4)

    def test_opaque_first_sample(self):
        raw = np.zeros((1, 3, 4), np.float32)
        raw[0, 0, 3] = 1e8  # infinite density at first sample
        raw[0, :, :3] = 100.0  # rgb → sigmoid → 1
        z = np.array([[2.0, 3.0, 4.0]], np.float32)
        d = np.array([[0.0, 0, -1]], np.float32)
        out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(out["depth_map"]), [2.0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), [1.0], atol=1e-4)


class TestNeRFMLP:
    def test_matches_numpy_oracle(self, rng):
        cfg = NeRFModelConfig(netdepth=8, netwidth=32)
        params = init_nerf_params(jax.random.PRNGKey(1), cfg)
        x = rng.standard_normal((10, cfg.input_ch)).astype(np.float32)
        v = rng.standard_normal((10, cfg.input_ch_views)).astype(np.float32)
        got = np.asarray(apply_nerf(params, cfg, jnp.asarray(x), jnp.asarray(v)))
        want = mlp_np(
            {k: np.asarray(p) for k, p in params.items()}, x, v,
            depth=cfg.netdepth, skips=cfg.skips,
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_no_viewdirs_head(self):
        cfg = NeRFModelConfig(netdepth=2, netwidth=16, use_viewdirs=False)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        out = apply_nerf(params, cfg, jnp.ones((5, cfg.input_ch)))
        assert out.shape == (5, 4)

    def test_param_shapes(self):
        cfg = NeRFModelConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        assert params["pts_0_w"].shape == (63, 256)
        assert params["pts_5_w"].shape == (256 + 63, 256)  # skip after layer 4
        assert params["views_w"].shape == (256 + 27, 128)
        assert params["rgb_w"].shape == (128, 3)
