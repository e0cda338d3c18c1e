"""Reference-parity golden tests.

The fixtures in tests/golden/reference_goldens.npz were produced by
EXECUTING the reference PyTorch implementation (tools/make_goldens.py) with
its own `pytest=True` deterministic hooks (run_nerf.py:373-377,
run_nerf_helpers.py:214-223). These tests feed the identical seeded numpy
draws through our `t_rand`/`u` hooks and assert allclose on:

  sample_pdf draws, raw2outputs maps, a full coarse→fine render with
  identical (keras-format) weights, the splat forward image, and the pixel
  GRADIENT through splat→composite→classifier — the BASELINE.md
  "correctness" row.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "reference_goldens.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run tools/make_goldens.py")
    return np.load(GOLDEN)


class TestSamplePDF:
    def test_seeded(self, g):
        from nerfail_tpu.ops.sampling import sample_pdf

        bins = g["sample_pdf/bins"]
        w = g["sample_pdf/weights"]
        np.random.seed(0)     # the reference's pytest hook
        u = np.random.rand(4, 6).astype(np.float32)
        ours = sample_pdf(
            jnp.asarray(bins), jnp.asarray(w), 6, u=jnp.asarray(u)
        )
        np.testing.assert_allclose(
            np.asarray(ours), g["sample_pdf/samples"], rtol=1e-5, atol=1e-5
        )

    def test_det(self, g):
        from nerfail_tpu.ops.sampling import sample_pdf

        bins = g["sample_pdf/bins"]
        w = g["sample_pdf/weights"]
        ours = sample_pdf(jnp.asarray(bins), jnp.asarray(w), 6, det=True)
        np.testing.assert_allclose(
            np.asarray(ours), g["sample_pdf/samples_det"],
            rtol=1e-5, atol=1e-5,
        )


class TestRaw2Outputs:
    @pytest.mark.parametrize("tag,white", [("black", False), ("white", True)])
    def test_maps(self, g, tag, white):
        from nerfail_tpu.ops.volume import raw2outputs

        out = raw2outputs(
            jnp.asarray(g["raw2outputs/raw"]),
            jnp.asarray(g["raw2outputs/z_vals"]),
            jnp.asarray(g["raw2outputs/rays_d"]),
            raw_noise_std=0.0, white_bkgd=white,
        )
        for k, ref_k in (("rgb_map", "rgb"), ("disp_map", "disp"),
                         ("acc_map", "acc"), ("weights", "weights"),
                         ("depth_map", "depth")):
            np.testing.assert_allclose(
                np.asarray(out[k]), g[f"raw2outputs/{tag}/{ref_k}"],
                rtol=1e-4, atol=1e-5, err_msg=k,
            )


class TestFullRender:
    def test_coarse_fine_allclose(self, g):
        """Same weights, same seeded randoms → same rendered tile."""
        from nerfail_tpu.config import NeRFModelConfig, RenderConfig
        from nerfail_tpu.models.nerf import load_weights_from_keras
        from nerfail_tpu.render import render_rays

        mcfg = NeRFModelConfig(
            netdepth=2, netwidth=32, skips=(0,), multires=4,
            multires_views=2, density_init_bias=0.0,
        )
        rcfg = RenderConfig(
            N_samples=8, N_importance=8, perturb=1.0, white_bkgd=True,
            near=2.0, far=6.0, use_pallas=False,
        )
        wc = [g[f"render/weights_coarse/{i}"] for i in range(12)]
        wf = [g[f"render/weights_fine/{i}"] for i in range(12)]
        params_c = load_weights_from_keras(mcfg, wc)
        params_f = load_weights_from_keras(mcfg, wf)

        n_rays, n_samples = 4, 8
        np.random.seed(0)
        t_rand = np.random.rand(n_rays, n_samples).astype(np.float32)
        np.random.seed(0)
        u = np.random.rand(n_rays, n_samples).astype(np.float32)

        out = render_rays(
            params_c, params_f, mcfg, rcfg,
            jnp.asarray(g["render/rays_o"]), jnp.asarray(g["render/rays_d"]),
            train=True, t_rand=jnp.asarray(t_rand), u_pdf=jnp.asarray(u),
        )
        for k in ("rgb_map", "disp_map", "acc_map", "rgb0", "disp0",
                  "acc0", "z_std"):
            ours = np.asarray(out[k])
            ref = g[f"render/{k}"]
            # empty rays (acc≈0): torch's disp is 0/0=nan, ours is the
            # guarded 1e10 sentinel — both mean "no hit"
            empty = ~np.isfinite(ref)
            if empty.any():
                assert np.all(ours[empty] > 1e9), k
            np.testing.assert_allclose(
                ours[~empty], ref[~empty], rtol=2e-4, atol=2e-5, err_msg=k,
            )


class TestSplatGradient:
    def _logits_fn(self, g):
        Wc = jnp.asarray(g["gauss/Wc"])

        def logits_fn(x):     # x [B, H, W, 3] 0-255 → torch CHW flatten
            chw = jnp.transpose(x, (0, 3, 1, 2))
            return chw.reshape(x.shape[0], -1) @ Wc

        return logits_fn

    def test_forward_allclose(self, g):
        from nerfail_tpu.attacks.forward import splat_attack_forward

        out = splat_attack_forward(
            jnp.asarray(g["gauss/spatial"].reshape(-1, 4)),
            jnp.asarray(g["gauss/weights"]), jnp.asarray(g["gauss/idx"]),
            jnp.asarray(g["gauss/ori"]), self._logits_fn(g),
            eps=32.0, resize_to=None,
        )
        np.testing.assert_allclose(
            np.asarray(out["splat"]), g["gauss/splat"],
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["attacked_rgba"]), g["gauss/attacked_rgba"],
            rtol=1e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["logits"]), g["gauss/logits"],
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["ori_logits"]), g["gauss/ori_logits"],
            rtol=1e-3, atol=1e-3,
        )

    def test_pixel_gradient_allclose(self, g):
        """∂ logits[0,0] / ∂ point-set RGBA — the hot gradient of every
        attack iteration — must match the reference's autograd."""
        from nerfail_tpu.attacks.forward import splat_attack_forward

        logits_fn = self._logits_fn(g)
        p, H, W = g["gauss/spatial"].shape[:3]

        def f(delta):
            out = splat_attack_forward(
                delta.reshape(-1, 4), jnp.asarray(g["gauss/weights"]),
                jnp.asarray(g["gauss/idx"]), jnp.asarray(g["gauss/ori"]),
                logits_fn, eps=32.0, resize_to=None,
            )
            return out["logits"][0, 0]

        grad = jax.grad(f)(jnp.asarray(g["gauss/spatial"]))
        np.testing.assert_allclose(
            np.asarray(grad), g["gauss/grad"], rtol=1e-3, atol=1e-6,
        )
