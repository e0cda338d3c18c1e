"""Isolated Mosaic matmul chain: what's the real roof for [T,256]x[256,256]?"""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(f, *args, iters=50, name="", flops=None):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/iters
    extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:44s} {dt*1000:8.2f} ms{extra}")

P = 1024 * 256
DEPTH = 8
W = 256

def chain_kernel(x_ref, w_ref, o_ref):
    h = x_ref[:].astype(jnp.bfloat16)
    w = w_ref[:]
    for i in range(DEPTH):
        h = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
    o_ref[:] = h.astype(jnp.float32)

def run(tile):
    x = jnp.ones((P, W), jnp.float32)
    wmat = jnp.ones((W, W), jnp.bfloat16) * 0.01
    f = jax.jit(lambda x, w: pl.pallas_call(
        chain_kernel, grid=(P // tile,),
        in_specs=[pl.BlockSpec((tile, W), lambda i: (i, 0)),
                  pl.BlockSpec((W, W), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32))(x, w).sum())
    flops = 2 * P * W * W * DEPTH
    bench(f, x, wmat, name=f"pallas chain x8 [T={tile},256]@[256,256]", flops=flops)

run(512); run(2048)

# pure relu chain (VPU roof probe)
def relu_kernel(x_ref, o_ref):
    h = x_ref[:]
    for i in range(DEPTH):
        h = jnp.maximum(h * 1.0001, 0.0)
    o_ref[:] = h
x = jnp.ones((P, W), jnp.float32)
f = jax.jit(lambda x: pl.pallas_call(
    relu_kernel, grid=(P // 2048,),
    in_specs=[pl.BlockSpec((2048, W), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((2048, W), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32))(x).sum())
bench(f, x, name="pallas relu-chain x8 [2048,256] f32")

# XLA same matmul chain
def xla_chain(x, w):
    h = x.astype(jnp.bfloat16)
    for i in range(DEPTH):
        h = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
    return h.astype(jnp.float32).sum()
f = jax.jit(xla_chain)
bench(f, jnp.ones((P, W), jnp.float32), jnp.ones((W, W), jnp.bfloat16) * 0.01,
      name="XLA chain x8 [262144,256]@[256,256]", flops=2*P*W*W*DEPTH)
