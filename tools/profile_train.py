"""Decompose the full-config train step's 13.3 ms (VERDICT r2 #5).

Times each stage of the step in isolation on the TPU so the MFU work
targets the real bottleneck instead of guesses:

  step          full train step (sample+render+grad+Adam)     [reference]
  grad          value_and_grad of the loss only (no Adam)
  fwd           render_rays forward only
  mlp_fwd       fused Pallas MLP, 262144 pts forward
  mlp_fwdbwd    fused Pallas MLP forward+backward (custom VJP)
  mlp_xla       same in plain XLA (encode+apply_nerf) fwd+bwd
  enc           positional encoding fwd (262144 pts, 63+27ch)
  glue          sample_pdf + sort + raw2outputs fwd+bwd at step shapes
  adam          optimizer.update + apply_updates alone

Run: env PYTHONPATH=/root/repo python tools/profile_train.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def _fence(x):
    np.asarray(x).ravel()[:1]


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fence(jax_leaf(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(jax_leaf(out))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def jax_leaf(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)[0]


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from nerfail_tpu.config import (
        ExperimentConfig, NeRFModelConfig, RenderConfig, TrainConfig,
    )
    from nerfail_tpu.data.blender import white_background_composite
    from nerfail_tpu.data.synthetic import make_box_scene
    from nerfail_tpu.models.nerf import apply_nerf, init_nerf_params
    from nerfail_tpu.ops.encoding import positional_encoding
    from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused
    from nerfail_tpu.ops.sampling import sample_pdf, stratified_z_vals
    from nerfail_tpu.ops.volume import raw2outputs
    from nerfail_tpu.render import render_rays
    from nerfail_tpu.train.nerf_trainer import (
        create_train_state, make_optimizer, make_train_step,
    )

    mcfg = NeRFModelConfig()
    rcfg = RenderConfig(N_samples=64, N_importance=128)
    tcfg = TrainConfig(N_rand=1024, precrop_iters=0)
    cfg = ExperimentConfig(model=mcfg, render=rcfg, train=tcfg)

    scene = make_box_scene(n_train=8, n_val=1, n_test=1, H=800, W=800)
    targets = white_background_composite(scene.images)

    key = jax.random.PRNGKey(0)
    state = create_train_state(key, mcfg, rcfg, tcfg)
    params = state.params
    images = jnp.asarray(targets[scene.i_train])
    poses = jnp.asarray(scene.poses[scene.i_train])
    K = jnp.asarray(scene.K)

    res = {}

    # ---- full step -----------------------------------------------------
    step_fn = make_train_step(mcfg, rcfg, tcfg, precrop=False)
    opt_state = state.opt_state

    def full(params, opt_state, k):
        p, o, m = step_fn(params, opt_state, images, poses, K, k)
        return m["loss"]

    res["step_ms"] = timeit(full, params, opt_state, key)

    # ---- ray batch fixture ----------------------------------------------
    N = tcfg.N_rand
    kk = jax.random.split(key, 4)
    rays_o = jax.random.uniform(kk[0], (N, 3)) * 0.1
    rays_d = jax.random.normal(kk[1], (N, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = jax.random.uniform(kk[2], (N, 3))

    def loss_fn(p, k):
        out = render_rays(
            p["coarse"], p["fine"], mcfg, rcfg, rays_o, rays_d,
            key=k, train=True,
        )
        return jnp.mean((out["rgb_map"] - target) ** 2) + \
            jnp.mean((out["rgb0"] - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    res["grad_ms"] = timeit(lambda: grad_fn(params, kk[3])[0])

    fwd_fn = jax.jit(loss_fn)
    res["fwd_ms"] = timeit(lambda: fwd_fn(params, kk[3]))

    # ---- MLP isolation ---------------------------------------------------
    P = N * (rcfg.N_samples + rcfg.N_samples + rcfg.N_importance)
    pts = jax.random.uniform(kk[0], (P, 3)) * 2 - 1
    dirs = jax.random.normal(kk[1], (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pc = params["coarse"]

    mlp_f = jax.jit(lambda p: nerf_mlp_fused(p, mcfg, pts, dirs).sum())
    res["mlp_fwd_ms"] = timeit(lambda: mlp_f(pc))

    mlp_g = jax.jit(jax.grad(
        lambda p: nerf_mlp_fused(p, mcfg, pts, dirs).sum()
    ))
    res["mlp_fwdbwd_ms"] = timeit(lambda: jax_leaf(mlp_g(pc)))

    def xla_mlp(p):
        e = positional_encoding(pts, mcfg.multires)
        ed = positional_encoding(dirs, mcfg.multires_views)
        return apply_nerf(p, mcfg, e, ed).sum()

    res["mlp_xla_fwd_ms"] = timeit(lambda: jax.jit(xla_mlp)(pc))
    xla_g = jax.jit(jax.grad(xla_mlp))
    res["mlp_xla_fwdbwd_ms"] = timeit(lambda: jax_leaf(xla_g(pc)))

    enc = jax.jit(lambda: (
        positional_encoding(pts, mcfg.multires).sum()
        + positional_encoding(dirs, mcfg.multires_views).sum()
    ))
    res["enc_fwd_ms"] = timeit(enc)

    # ---- glue: sampling + sort + compositing fwd+bwd ---------------------
    def glue(raw_c, raw_f, k):
        z = stratified_z_vals(N, rcfg.N_samples, rcfg.near, rcfg.far,
                              False, key=k)
        c = raw2outputs(raw_c, z, rays_d, white_bkgd=True)
        zm = 0.5 * (z[..., 1:] + z[..., :-1])
        zs = sample_pdf(zm, c["weights"][..., 1:-1], rcfg.N_importance,
                        det=False, key=k)
        za = jnp.sort(jnp.concatenate([z, zs], -1), -1)
        f = raw2outputs(raw_f, za, rays_d, white_bkgd=True)
        return jnp.mean(f["rgb_map"]) + jnp.mean(c["rgb_map"])

    raw_c = jax.random.normal(kk[0], (N, rcfg.N_samples, 4))
    raw_f = jax.random.normal(
        kk[1], (N, rcfg.N_samples + rcfg.N_importance, 4))
    glue_g = jax.jit(jax.grad(glue, argnums=(0, 1)))
    res["glue_fwdbwd_ms"] = timeit(lambda: glue_g(raw_c, raw_f, kk[2])[0])

    # ---- Adam ------------------------------------------------------------
    optimizer = make_optimizer(tcfg)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def adam(params, opt_state):
        u, o = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, u), o

    res["adam_ms"] = timeit(lambda: jax_leaf(adam(params, opt_state)[0]))

    for k, v in res.items():
        print(f"{k:22s} {v:8.2f} ms")
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
