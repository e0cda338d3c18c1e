"""Fused Pallas MLP kernel vs the plain XLA path (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfail_tpu.config import NeRFModelConfig
from nerfail_tpu.models.nerf import apply_nerf, init_nerf_params
from nerfail_tpu.ops.encoding import positional_encoding


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU, f32 matmuls so the
    math comparison against the XLA path is exact (the TPU runs bf16)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import nerfail_tpu.ops.pallas.mlp_kernel as mk

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    monkeypatch.setattr(mk, "MATMUL_DTYPE", jnp.float32)
    yield


def _reference_raw(params, cfg, pts, vd):
    enc_x = positional_encoding(pts, cfg.multires)
    enc_d = positional_encoding(vd, cfg.multires_views)
    return apply_nerf(params, cfg, enc_x, enc_d)


def test_fused_forward_matches_xla():
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused

    cfg = NeRFModelConfig(netdepth=8, netwidth=256)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (600, 3), minval=-2, maxval=2)
    vd = jax.random.normal(jax.random.PRNGKey(2), (600, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    got = nerf_mlp_fused(params, cfg, pts, vd)
    want = _reference_raw(params, cfg, pts, vd)
    assert got.shape == (600, 4)
    # bf16 matmul passes → loose-ish tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
    )


def test_fused_backward_matches_xla():
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused

    cfg = NeRFModelConfig(netdepth=4, netwidth=256)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-2, maxval=2)
    vd = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    def loss_fused(p, pts):
        return jnp.sum(jnp.tanh(
            nerf_mlp_fused(p, cfg, pts, vd, input_grads=True)
        ))

    def loss_ref(p, pts):
        return jnp.sum(jnp.tanh(_reference_raw(p, cfg, pts, vd)))

    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, pts)
    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, pts)

    for k in gp_r:
        a, b = np.asarray(gp_f[k]), np.asarray(gp_r[k])
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=0.05,
            err_msg=f"param grad mismatch: {k}",
        )
    scale = max(np.abs(np.asarray(gx_r)).max(), 1e-3)
    np.testing.assert_allclose(
        np.asarray(gx_f) / scale, np.asarray(gx_r) / scale, atol=0.05
    )


def test_fused_rejects_no_viewdirs():
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused

    cfg = NeRFModelConfig(use_viewdirs=False)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        nerf_mlp_fused(params, cfg, jnp.zeros((4, 3)), None)


def test_input_grads_flag_gates_d_pts():
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused

    cfg = NeRFModelConfig(netdepth=2, netwidth=256)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    def loss(p, pts, ig):
        return jnp.sum(nerf_mlp_fused(p, cfg, pts, vd, input_grads=ig))

    gp0, gx0 = jax.grad(loss, argnums=(0, 1))(params, pts, False)
    gp1, gx1 = jax.grad(loss, argnums=(0, 1))(params, pts, True)
    assert float(jnp.abs(gx0).max()) == 0.0          # compiled out
    assert float(jnp.abs(gx1).max()) > 0.0
    for k in gp0:                                     # param grads unaffected
        np.testing.assert_allclose(
            np.asarray(gp0[k]), np.asarray(gp1[k]), rtol=1e-6, atol=1e-6
        )
