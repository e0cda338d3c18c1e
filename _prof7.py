"""Roofline probe: chained matmul throughput vs width on v5e."""
import time
import jax, jax.numpy as jnp, numpy as np

def bench_chain(f, x0, name, iters=20, flops=None):
    x = f(x0); np.asarray(x).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    np.asarray(x).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {dt*1000:8.2f} ms{extra}", flush=True)

P = 262144
for Wd, depth in ((256, 8), (512, 8), (1024, 8)):
    w = jnp.asarray(np.random.randn(Wd, Wd) * 0.05, jnp.bfloat16)
    @jax.jit
    def chain(x, w=w, depth=depth):
        h = x.astype(jnp.bfloat16)
        for _ in range(depth):
            h = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)
        return h.astype(jnp.float32) * 1e-3
    x0 = jnp.asarray(np.random.randn(P, Wd), jnp.float32)
    bench_chain(chain, x0, f"XLA chain x{depth} [{P},{Wd}]@[{Wd},{Wd}]",
                flops=2 * P * Wd * Wd * depth)

# with relu between (the MLP's actual pattern)
Wd = 256
w = jnp.asarray(np.random.randn(Wd, Wd) * 0.05, jnp.bfloat16)
@jax.jit
def chain_relu(x):
    h = x.astype(jnp.bfloat16)
    for _ in range(8):
        h = jnp.maximum(jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32), 0.).astype(jnp.bfloat16)
    return h.astype(jnp.float32) * 1e-3
x0 = jnp.asarray(np.random.randn(P, Wd), jnp.float32)
bench_chain(chain_relu, x0, "XLA chain+relu x8 [262144,256]",
            flops=2 * P * Wd * Wd * 8)
