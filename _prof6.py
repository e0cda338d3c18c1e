"""Chained host-loop timings (data-dependent args => no dedupe)."""
import time
import jax, jax.numpy as jnp, numpy as np
from nerfail_tpu.config import NeRFModelConfig, RenderConfig
from nerfail_tpu.models.nerf import init_nerf_params, apply_nerf
from nerfail_tpu.ops.encoding import positional_encoding
from nerfail_tpu.ops.pallas import mlp_kernel as mk
from nerfail_tpu.render import render_rays

mcfg = NeRFModelConfig()
params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
P = 1024 * 256
fwd_flops = 2 * P * 0.625e6

def bench_chain(f, x0, name, iters=30, flops=None):
    x = f(x0)
    np.asarray(x).ravel()[:1]      # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    np.asarray(x).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {dt*1000:8.2f} ms{extra}", flush=True)
    return dt

@jax.jit
def f_fwd(pts):
    vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
    raw = mk.nerf_mlp_fused(params, mcfg, pts, vd)
    return pts + 1e-12 * raw[:, :3]
pts0 = jax.random.uniform(jax.random.PRNGKey(1), (P, 3))
bench_chain(f_fwd, pts0, "fused MLP fwd 262k (chained)", flops=fwd_flops)

@jax.jit
def f_xla(pts):
    vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
    ex = positional_encoding(pts, mcfg.multires)
    ed = positional_encoding(vd, mcfg.multires_views)
    raw = apply_nerf(params, mcfg, ex, ed)
    return pts + 1e-12 * raw[:, :3]
bench_chain(f_xla, pts0, "XLA encode+MLP fwd 262k (chained)", flops=fwd_flops)

def loss(p, pts):
    vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
    return jnp.sum(mk.nerf_mlp_fused(p, mcfg, pts, vd))
g = jax.jit(jax.grad(loss, argnums=1))
@jax.jit
def f_fb(pts):
    return pts + 1e-12 * g(params, pts)
bench_chain(f_fb, pts0, "fused MLP fwd+bwd(pts) 262k (chained)", flops=3*fwd_flops)
