import time, functools
import jax, jax.numpy as jnp, numpy as np
from nerfail_tpu.config import NeRFModelConfig
from nerfail_tpu.models.nerf import init_nerf_params, apply_nerf
from nerfail_tpu.ops.encoding import positional_encoding
from nerfail_tpu.ops.pallas import mlp_kernel as mk

def bench(f, *args, iters=30, name=""):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return dt

mcfg = NeRFModelConfig()
params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
P = 1024 * 256
pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3)) * 2 - 1
vd = jnp.zeros((P, 3)) + jnp.array([0., 0., -1.])

for tile in (1024, 2048, 4096, 8192):
    mk.FWD_TILE = tile
    mk._fused_call._clear_cache() if hasattr(mk._fused_call, "_clear_cache") else None
    f = jax.jit(lambda p: jnp.sum(mk.nerf_mlp_fused(p, mcfg, pts, vd)))
    bench(f, params, name=f"fused fwd tile={tile}")

# XLA baseline fwd
def xla_fwd(p):
    ex = positional_encoding(pts, mcfg.multires)
    ed = positional_encoding(vd, mcfg.multires_views)
    return jnp.sum(apply_nerf(p, mcfg, ex, ed))
bench(jax.jit(xla_fwd), params, name="XLA fwd (encode+MLP)")
bench(jax.jit(jax.grad(xla_fwd)), params, name="XLA fwd+bwd")

# pure matmul roofline probe: same matmul chain shapes, no pallas
def chain(p):
    x = jnp.zeros((P, 64), jnp.bfloat16) + 0.1
    h = x
    W0 = p["pts_0_w"]
    h = jnp.maximum(jax.lax.dot_general(h, jnp.zeros((64,256), jnp.bfloat16), (((1,),(0,)),((),())), preferred_element_type=jnp.float32), 0.).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(jax.lax.dot_general(h, jnp.zeros((256,256), jnp.bfloat16), (((1,),(0,)),((),())), preferred_element_type=jnp.float32), 0.).astype(jnp.bfloat16)
    return jnp.sum(h.astype(jnp.float32))
bench(jax.jit(chain), params, name="bare XLA bf16 matmul chain 262k")
