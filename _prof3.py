"""Fwd-kernel variants: bf16 intermediates, fused bias+relu placement."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nerfail_tpu.config import NeRFModelConfig
from nerfail_tpu.models.nerf import init_nerf_params
from nerfail_tpu.ops.pallas import mlp_kernel as mk

def bench(f, *args, iters=30, name=""):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")

mcfg = NeRFModelConfig()
params = init_nerf_params(jax.random.PRNGKey(0), mcfg)
P = 1024 * 256
pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3)) * 2 - 1
vd = jnp.zeros((P, 3)) + jnp.array([0., 0., -1.])

# baseline
f0 = jax.jit(lambda p: jnp.sum(mk.nerf_mlp_fused(p, mcfg, pts, vd)))
bench(f0, params, name="fwd baseline (f32 intermediates)")

DOT = functools.partial(jax.lax.dot_general, preferred_element_type=jnp.float32)
def mm(a, b):
    return DOT(a, b, (((1,), (0,)), ((), ())))

def fwd_kernel_bf16(depth, skips, enc_x_ref, enc_d_ref, *refs):
    n_w = depth + 4; n_b = depth + 2
    w_refs = refs[:n_w]; b_refs = refs[n_w:n_w+n_b]; out_ref = refs[-1]
    x = enc_x_ref[:].astype(jnp.bfloat16)
    h = x
    for i in range(depth):
        z = mm(h, w_refs[i][:]) + b_refs[i][:]
        h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    feature = (mm(h, w_refs[depth][:]) + b_refs[depth][:]).astype(jnp.bfloat16)
    hv = jnp.concatenate([feature, enc_d_ref[:].astype(jnp.bfloat16)], axis=-1)
    hv = jnp.maximum(mm(hv, w_refs[depth+1][:]) + b_refs[depth+1][:], 0.0).astype(jnp.bfloat16)
    alpha = mm(h, w_refs[depth+2][:])
    rgb = mm(hv, w_refs[depth+3][:])
    out_ref[:] = rgb + alpha

def run_variant(kernel, tile, name):
    from nerfail_tpu.ops.pallas.mlp_kernel import _prep, _pad_cols, _round_up
    from nerfail_tpu.ops.encoding import positional_encoding
    def call(p):
        enc_x = positional_encoding(pts, mcfg.multires)
        enc_d = positional_encoding(vd, mcfg.multires_views)
        enc_x = _pad_cols(enc_x, 64); enc_d = _pad_cols(enc_d, 32)
        ws, bs, _ = _prep(p, mcfg)
        ws = tuple(w.astype(jnp.bfloat16) for w in ws)
        bs = tuple(b for b in bs)
        n = enc_x.shape[0]
        grid = (n // tile,)
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
        out = pl.pallas_call(
            functools.partial(kernel, mcfg.netdepth, tuple(mcfg.skips)),
            grid=grid,
            in_specs=[pl.BlockSpec((tile, 64), lambda i: (i, 0)),
                      pl.BlockSpec((tile, 32), lambda i: (i, 0)),
                      *[full(w) for w in ws], *[full(b) for b in bs]],
            out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
        )(enc_x, enc_d, *ws, *bs)
        return jnp.sum(out)
    f = jax.jit(call)
    bench(f, params, name=name)

run_variant(fwd_kernel_bf16, 2048, "fwd bf16 intermediates tile=2048")
run_variant(fwd_kernel_bf16, 4096, "fwd bf16 intermediates tile=4096")
run_variant(fwd_kernel_bf16, 8192, "fwd bf16 intermediates tile=8192")
