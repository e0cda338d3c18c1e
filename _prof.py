import time
import jax, jax.numpy as jnp, numpy as np
from nerfail_tpu.config import NeRFModelConfig, RenderConfig, TrainConfig
from nerfail_tpu.train.nerf_trainer import create_train_state, make_train_step, make_optimizer
from nerfail_tpu.render import render_rays, query_network
from nerfail_tpu.ops.sampling import sample_pdf, stratified_z_vals
from nerfail_tpu.ops.volume import raw2outputs
from nerfail_tpu.ops.encoding import positional_encoding

def bench(f, *args, iters=20, name=""):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt

mcfg = NeRFModelConfig()
rcfg = RenderConfig(N_samples=64, N_importance=128)
tcfg = TrainConfig(N_rand=1024, precrop_iters=0)
state = create_train_state(jax.random.PRNGKey(0), mcfg, rcfg, tcfg)
H = W = 800
images = jnp.zeros((4, H, W, 3), jnp.float32)
poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (4, 4, 4))
K = jnp.array([[800.0, 0, 400], [0, 800.0, 400], [0, 0, 1]], jnp.float32)
step = make_train_step(mcfg, rcfg, tcfg, precrop=False)
opt = make_optimizer(tcfg).init(state.params)
key = jax.random.PRNGKey(1)
bench(lambda: step(state.params, opt, images, poses, K, key)[2]["loss"], name="full train step")

# forward-only render_rays
rays_o = jnp.zeros((1024, 3)) + jnp.array([0., 0., 4.])
th = jnp.linspace(-0.3, 0.3, 1024)
rays_d = jnp.stack([jnp.sin(th), jnp.zeros_like(th), -jnp.cos(th)], -1)
fwd = jax.jit(lambda p: render_rays(p["coarse"], p["fine"], mcfg, rcfg, rays_o, rays_d, key=key, train=True)["rgb_map"])
bench(fwd, state.params, name="render_rays fwd only")

# fwd+bwd without optimizer
def loss(p):
    out = render_rays(p["coarse"], p["fine"], mcfg, rcfg, rays_o, rays_d, key=key, train=True)
    return jnp.sum(out["rgb_map"]) + jnp.sum(out["rgb0"])
g = jax.jit(jax.grad(loss))
bench(lambda: g(state.params)["coarse"]["pts_0_w"], name="render_rays fwd+bwd")

# MLP kernel alone at 262144 points
P = 1024 * 256
pts = jnp.zeros((P, 3)) + 0.1
vd = jnp.zeros((P, 3)) + jnp.array([0., 0., -1.])
def mlp_fwd(p):
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused
    return nerf_mlp_fused(p, mcfg, pts, vd)
f1 = jax.jit(lambda p: jnp.sum(mlp_fwd(p)))
bench(f1, state.params["coarse"], name="fused MLP fwd 262k pts")
f2 = jax.jit(jax.grad(lambda p: jnp.sum(mlp_fwd(p))))
bench(lambda: f2(state.params["coarse"])["pts_0_w"], name="fused MLP fwd+bwd 262k pts")

# sample_pdf alone
z = jnp.broadcast_to(jnp.linspace(2., 6., 64), (1024, 64))
wts = jax.random.uniform(key, (1024, 62))
f3 = jax.jit(lambda w: sample_pdf(0.5*(z[:, 1:]+z[:, :-1]), w, 128, det=False, key=key))
bench(f3, wts, name="sample_pdf 1024x128")

# raw2outputs fwd+bwd
raw = jax.random.normal(key, (1024, 192, 4))
zv = jnp.sort(jax.random.uniform(key, (1024, 192)) * 4 + 2, -1)
f4 = jax.jit(jax.grad(lambda r: jnp.sum(raw2outputs(r, zv, rays_d, white_bkgd=True)["rgb_map"])))
bench(f4, raw, name="raw2outputs fwd+bwd 1024x192")

# positional encoding materialization
f5 = jax.jit(lambda x: jnp.sum(positional_encoding(x, 10)))
bench(f5, pts, name="pos-enc 262k x 63 fwd")
