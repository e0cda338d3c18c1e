"""Trustworthy timings: data-dependent chains inside one jit."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from nerfail_tpu.config import NeRFModelConfig, RenderConfig, TrainConfig
from nerfail_tpu.models.nerf import init_nerf_params, apply_nerf
from nerfail_tpu.ops.encoding import positional_encoding
from nerfail_tpu.ops.pallas import mlp_kernel as mk
from nerfail_tpu.render import render_rays

REPS = 10

def chain_bench(make_fn, x0, name, per_iter_flops=None):
    """f: x -> x (same shape); run REPS sequential apps inside one jit."""
    f = make_fn()
    @jax.jit
    def run(x):
        def body(i, x):
            return f(x)
        return jax.lax.fori_loop(0, REPS, body, x)
    o = run(x0); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run(x0); jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / REPS
    extra = f"  {per_iter_flops/dt/1e12:6.1f} TF/s" if per_iter_flops else ""
    print(f"{name:46s} {dt*1000:8.2f} ms{extra}")
    return dt

mcfg = NeRFModelConfig()
params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
P = 1024 * 256

# fwd kernel: x (pts) -> pts' (feed raw output back into pts-like shape)
def mk_fwd():
    def f(pts):
        vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
        raw = mk.nerf_mlp_fused(params, mcfg, pts, vd)     # [P, 4]
        return pts + 1e-12 * raw[:, :3]
    return f
pts0 = jax.random.uniform(jax.random.PRNGKey(1), (P, 3))
fwd_flops = 2 * P * 0.625e6
chain_bench(mk_fwd, pts0, "fused MLP fwd 262k", fwd_flops)

# fwd+bwd
def mk_fb():
    def loss(p, pts):
        vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
        return jnp.sum(mk.nerf_mlp_fused(p, mcfg, pts, vd))
    g = jax.grad(loss)
    def f(pts):
        gr = g(params, pts)
        return pts + 1e-12 * gr["pts_0_w"][0, :3]
    return f
chain_bench(mk_fb, pts0, "fused MLP fwd+bwd(params) 262k", 3 * fwd_flops)

# XLA fwd and fwd+bwd
def mk_xla_fwd():
    def f(pts):
        vd = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-6)
        ex = positional_encoding(pts, mcfg.multires)
        ed = positional_encoding(vd, mcfg.multires_views)
        raw = apply_nerf(params, mcfg, ex, ed)
        return pts + 1e-12 * raw[:, :3]
    return f
chain_bench(mk_xla_fwd, pts0, "XLA MLP fwd 262k", fwd_flops)

# full render_rays fwd+bwd (train path)
rcfg = RenderConfig(N_samples=64, N_importance=128)
key = jax.random.PRNGKey(2)
def mk_render_fb():
    def loss(p, ro, rd):
        out = render_rays(p["coarse"], p["fine"], mcfg, rcfg, ro, rd, key=key, train=True)
        return jnp.sum(out["rgb_map"]) + jnp.sum(out["rgb0"])
    g = jax.grad(loss, argnums=(1,))
    ro0 = jnp.zeros((1024, 3)) + jnp.array([0., 0., 4.])
    def f(rd):
        gr = g({"coarse": params, "fine": params}, ro0, rd)[0]
        return rd + 1e-12 * gr
    return f
th = jnp.linspace(-0.3, 0.3, 1024)
rd0 = jnp.stack([jnp.sin(th), jnp.zeros_like(th), -jnp.cos(th)], -1)
chain_bench(mk_render_fb, rd0, "render_rays fwd + d/d rays 1024x(64+128)")
