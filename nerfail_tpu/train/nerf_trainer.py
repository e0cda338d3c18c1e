"""NeRF training: fully on-device jitted update step.

The reference's hot loop (run_nerf.py:727-845) does per-step host work:
`np.random.choice` pixel selection, host-side ray assembly, then a GPU
render+backward. Here the *entire* step — image choice, pixel sampling
(with the precrop schedule), ray generation, coarse+fine render, loss,
Adam update, LR decay — is one compiled XLA program over device-resident
images+poses, so the steady state is zero host↔device traffic.

Loss, schedule, and hyperparameters match the reference:
  loss   = MSE(fine) + MSE(coarse)                 (run_nerf.py:781-789)
  lr     = lrate · 0.1^(step / (lrate_decay·1000)) (run_nerf.py:796-800)
  Adam   betas (0.9, 0.999)                        (run_nerf.py:196)
  precrop: first `precrop_iters` steps sample from the center
           `precrop_frac` crop                     (run_nerf.py:744-773)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfail_tpu.config import (
    ExperimentConfig,
    NeRFModelConfig,
    RenderConfig,
    TrainConfig,
)
from nerfail_tpu.models.nerf import Params, init_nerf_params
from nerfail_tpu.ops.rays import ndc_rays
from nerfail_tpu.render import render_full_image, render_rays
from nerfail_tpu.train.checkpoint import (
    checkpoint_path,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@dataclass
class NeRFTrainState:
    params: Dict[str, Params]      # {"coarse": ..., "fine": ...}
    opt_state: Any
    step: int


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=tcfg.lrate,
        transition_steps=tcfg.lrate_decay * 1000,
        decay_rate=0.1,
        staircase=False,
    )
    return optax.adam(schedule, b1=0.9, b2=0.999)


def create_train_state(
    key: jax.Array,
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    tcfg: TrainConfig,
) -> NeRFTrainState:
    kc, kf = jax.random.split(key)
    params = {"coarse": init_nerf_params(kc, mcfg)}
    params["fine"] = (
        init_nerf_params(kf, mcfg) if rcfg.N_importance > 0 else params["coarse"]
    )
    opt_state = make_optimizer(tcfg).init(params)
    return NeRFTrainState(params=params, opt_state=opt_state, step=0)


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse)


def _sample_rays_in_jit(
    key: jax.Array,
    images: jnp.ndarray,   # [N_img, H, W, 3] white-composited targets
    poses: jnp.ndarray,    # [N_img, 4, 4]
    K: jnp.ndarray,
    n_rand: int,
    precrop: bool,
    precrop_frac: float,
    single_image: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample N_rand (ray_o, ray_d, target) on device.

    single_image=True reproduces the reference's one-image-per-step regime
    (no_batching); False samples pixels across random images, equivalent to
    the reference's global ray batching after shuffle (run_nerf.py:693-714).
    """
    n_img, H, W = images.shape[0], images.shape[1], images.shape[2]
    k_img, k_y, k_x = jax.random.split(key, 3)

    if precrop:
        dH = int(H // 2 * precrop_frac)
        dW = int(W // 2 * precrop_frac)
        y_lo, y_hi = H // 2 - dH, H // 2 + dH
        x_lo, x_hi = W // 2 - dW, W // 2 + dW
    else:
        y_lo, y_hi, x_lo, x_hi = 0, H, 0, W

    ys = jax.random.randint(k_y, (n_rand,), y_lo, y_hi)
    xs = jax.random.randint(k_x, (n_rand,), x_lo, x_hi)
    if single_image:
        img_idx = jnp.broadcast_to(
            jax.random.randint(k_img, (), 0, n_img), (n_rand,)
        )
    else:
        img_idx = jax.random.randint(k_img, (n_rand,), 0, n_img)

    c2w = poses[img_idx]                                    # [R, 4, 4]
    dirs = jnp.stack(
        [
            (xs.astype(jnp.float32) - K[0, 2]) / K[0, 0],
            -(ys.astype(jnp.float32) - K[1, 2]) / K[1, 1],
            -jnp.ones((n_rand,), jnp.float32),
        ],
        axis=-1,
    )
    rays_d = jnp.einsum(
        "rc,rkc->rk", dirs, c2w[:, :3, :3],
        precision=jax.lax.Precision.HIGHEST,
    )
    rays_o = c2w[:, :3, 3]
    target = images[img_idx, ys, xs]
    return rays_o, rays_d, target


def make_train_step(
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    tcfg: TrainConfig,
    precrop: bool,
    mesh=None,
    debug_numerics: bool = False,
) -> Callable:
    """Build the jitted train step for one precrop phase.

    Two compiled variants exist over the run (precrop on/off) because the
    pixel-sampling bounds are shape-static; the trainer swaps at
    `precrop_iters` exactly like the reference branches at run_nerf.py:749.

    With a `mesh`, the sampled ray batch is sharding-constrained onto the
    "data" axis (DP over rays); combined with tensor-parallel param
    shardings (parallel/shard.py) XLA inserts the grad psum/reduces over
    ICI automatically.

    `debug_numerics` adds a fused NaN/Inf scan over the rendered maps and
    the loss to the step metrics (the reference's DEBUG contains-nan check,
    run_nerf.py:414-416) — one extra all-reduce bit, no host sync until the
    driver reads the metric.
    """
    optimizer = make_optimizer(tcfg)

    @jax.jit
    def step_fn(params, opt_state, images, poses, K, key):
        k_sample, k_render = jax.random.split(key)
        rays_o, rays_d, target = _sample_rays_in_jit(
            k_sample, images, poses, K, tcfg.N_rand,
            precrop, tcfg.precrop_frac, tcfg.no_batching,
        )
        viewdirs = None
        near = far = None
        if rcfg.ndc:
            # forward-facing LLFF: viewdirs from the raw rays, then NDC
            # reparameterization with near/far = 0/1 (run_nerf.py:117-123)
            viewdirs = rays_d / jnp.linalg.norm(
                rays_d, axis=-1, keepdims=True
            )
            rays_o, rays_d = ndc_rays(
                images.shape[1], images.shape[2], K[0, 0], 1.0,
                rays_o, rays_d,
            )
            near, far = 0.0, 1.0
        if mesh is not None:
            from nerfail_tpu.parallel.shard import constrain_data

            rays_o = constrain_data(rays_o, mesh)
            rays_d = constrain_data(rays_d, mesh)
            target = constrain_data(target, mesh)
            if viewdirs is not None:
                viewdirs = constrain_data(viewdirs, mesh)

        def loss_fn(p):
            out = render_rays(
                p["coarse"], p["fine"], mcfg, rcfg, rays_o, rays_d,
                viewdirs=viewdirs, near=near, far=far,
                key=k_render, train=True,
            )
            loss_fine = img2mse(out["rgb_map"], target)
            loss = loss_fine
            if "rgb0" in out:
                loss = loss + img2mse(out["rgb0"], target)
            return loss, (loss_fine, out)

        (loss, (loss_fine, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "psnr": mse2psnr(loss_fine)}
        if debug_numerics:
            finite = jnp.isfinite(loss)
            for k in ("rgb_map", "disp_map", "acc_map"):
                if k in out:
                    finite &= jnp.all(jnp.isfinite(out[k]))
            metrics["finite"] = finite
        return params, opt_state, metrics

    return step_fn


def make_multi_train_step(
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    tcfg: TrainConfig,
    precrop: bool,
    k: int,
    mesh=None,
    debug_numerics: bool = False,
) -> Callable:
    """`k` train steps per dispatch via lax.scan — one XLA program does k
    full (sample → render → grad → Adam) iterations, amortizing host
    dispatch/launch latency k× (the reference host-loops every step;
    run_nerf.py:727). Returns (params, opt_state, base_key, images, poses,
    K) → (params', opt_state', last-step metrics). Step i derives its RNG
    as fold_in(base_key, i), matching the single-step trainer's stream."""
    step_fn = make_train_step(
        mcfg, rcfg, tcfg, precrop, mesh=mesh, debug_numerics=debug_numerics,
    )

    @jax.jit
    def multi(params, opt_state, images, poses, K, base_key):
        def body(carry, i):
            params, opt_state = carry
            key = jax.random.fold_in(base_key, i)
            params, opt_state, metrics = step_fn(
                params, opt_state, images, poses, K, key
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(k)
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return params, opt_state, last

    return multi


def dump_run_config(logdir: str, cfg) -> None:
    """Write `args.txt` (flat `key = value` lines) and `config.json` into
    the run directory — the reference snapshots its flags and config file
    per run (run_nerf.py:644-653) so an experiment is reproducible from
    its log directory alone."""
    import dataclasses
    import json

    os.makedirs(logdir, exist_ok=True)
    d = dataclasses.asdict(cfg)
    with open(os.path.join(logdir, "args.txt"), "w") as f:
        for section, values in sorted(d.items()):
            if isinstance(values, dict):
                for k, v in sorted(values.items()):
                    f.write(f"{section}.{k} = {v}\n")
            else:
                f.write(f"{section} = {values}\n")
    with open(os.path.join(logdir, "config.json"), "w") as f:
        json.dump(d, f, indent=2, default=str)


def train_nerf(
    cfg: ExperimentConfig,
    images: np.ndarray,        # [N, H, W, 3] float32 targets (white-composited)
    poses: np.ndarray,         # [N, 4, 4]
    K: np.ndarray,
    i_train: np.ndarray,
    seed: int = 0,
    logdir: Optional[str] = None,
    n_iters: Optional[int] = None,
    log_fn: Callable[[int, Dict[str, float]], None] = None,
    test_render: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    spiral_poses: Optional[np.ndarray] = None,
    ft_path: Optional[str] = None,
    mesh=None,
    debug_numerics: bool = False,
) -> NeRFTrainState:
    """Host driver: auto-resume, jitted steps, periodic checkpoint/render.

    Mirrors the reference train() orchestration (run_nerf.py:537-888) minus
    dataset loading (the caller passes arrays). `ft_path` overrides the
    latest-checkpoint scan like the reference's --ft_path
    (run_nerf.py:216-223).

    With a `mesh` the params are laid out tensor-parallel over the "model"
    axis, the per-step ray batch is sharded over "data", and the image feed
    is replicated onto every chip (images are read inside the jitted step by
    gather — SURVEY.md §5 collectives spec); XLA inserts the grad psum.
    In multi-process runs each host feeds its process-local copy.
    """
    mcfg, rcfg, tcfg = cfg.model, cfg.render, cfg.train
    n_iters = n_iters or tcfg.N_iters
    if logdir:
        dump_run_config(logdir, cfg)

    key = jax.random.PRNGKey(seed)
    state = create_train_state(key, mcfg, rcfg, tcfg)

    if ft_path or logdir:
        ckpt = ft_path or latest_checkpoint(logdir)
        if ckpt:
            restored = load_checkpoint(
                ckpt,
                {"params": state.params, "opt_state": state.opt_state, "step": 0},
            )
            state = NeRFTrainState(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=int(restored["step"]),
            )
            print(f"[train] resumed from {ckpt} at step {state.step}")

    train_images = jnp.asarray(images[i_train])
    train_poses = jnp.asarray(poses[i_train])
    K_dev = jnp.asarray(K)

    params, opt_state = state.params, state.opt_state
    if mesh is not None:
        from nerfail_tpu.parallel.multihost import replicate_global
        from nerfail_tpu.parallel.shard import replicate, shard_nerf_params

        params = {k: shard_nerf_params(mesh, p) for k, p in params.items()}
        if state.step == 0:
            # fresh start: moments inherit the param shardings via zeros_like
            opt_state = make_optimizer(tcfg).init(params)
        else:
            # resumed moments start replicated; the first step's output
            # shardings settle them onto the param layout
            opt_state = replicate(mesh, opt_state)
        # image/pose feed: replicated, multi-process-safe (SURVEY §7
        # "multi-host input pipeline")
        train_images, train_poses, K_dev = replicate_global(
            mesh, (train_images, train_poses, K_dev)
        )

    step_pre = make_train_step(
        mcfg, rcfg, tcfg, precrop=True, mesh=mesh,
        debug_numerics=debug_numerics,
    )
    step_main = make_train_step(
        mcfg, rcfg, tcfg, precrop=False, mesh=mesh,
        debug_numerics=debug_numerics,
    )
    t0 = time.time()
    for i in range(state.step, n_iters):
        step_key = jax.random.fold_in(key, i)
        fn = step_pre if i < tcfg.precrop_iters else step_main
        params, opt_state, metrics = fn(
            params, opt_state, train_images, train_poses, K_dev, step_key
        )
        if debug_numerics and (i + 1) % tcfg.i_print == 0 \
                and not bool(metrics["finite"]):
            # the reference's "! [Numerical Error] contains nan or inf"
            # (run_nerf.py:414-416), promoted to a hard stop
            raise FloatingPointError(
                f"[Numerical Error] render output contains nan/inf at "
                f"step {i + 1}"
            )
        if log_fn is not None and (i + 1) % tcfg.i_print == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_s"] = tcfg.i_print / max(time.time() - t0, 1e-9)
            t0 = time.time()
            log_fn(i + 1, m)
        if logdir and (i + 1) % tcfg.i_weights == 0:
            save_checkpoint(
                checkpoint_path(logdir, i + 1),
                {"params": params, "opt_state": opt_state, "step": i + 1},
            )
        # periodic test-set render + PSNR (run_nerf.py:834-840) and spiral
        # video (run_nerf.py:818-825)
        if test_render is not None and (i + 1) % tcfg.i_testset == 0:
            test_imgs, test_poses = test_render
            psnr = eval_psnr(
                NeRFTrainState(params, opt_state, i + 1), cfg,
                test_imgs, test_poses, K,
                np.arange(min(len(test_poses), 8)),
            )
            if log_fn is not None:
                log_fn(i + 1, {"testset_psnr": psnr})
        if logdir and spiral_poses is not None and (i + 1) % tcfg.i_video == 0:
            from nerfail_tpu.render_path import render_path

            H_img, W_img = images.shape[1:3]
            render_path(
                params, cfg, spiral_poses, H_img, W_img, np.asarray(K),
                video_path=os.path.join(
                    logdir, f"spiral_{i + 1:06d}.mp4"
                ),
            )

    state = NeRFTrainState(params=params, opt_state=opt_state, step=n_iters)
    if logdir:
        save_checkpoint(
            checkpoint_path(logdir, n_iters),
            {"params": params, "opt_state": opt_state, "step": n_iters},
        )
    return state


def eval_psnr(
    state: NeRFTrainState,
    cfg: ExperimentConfig,
    images: np.ndarray,
    poses: np.ndarray,
    K: np.ndarray,
    idxs: np.ndarray,
) -> float:
    """Mean test-set PSNR (the reference prints this at i_testset)."""
    H, W = images.shape[1:3]
    total = 0.0
    for i in idxs:
        out = render_full_image(
            state.params["coarse"], state.params["fine"],
            cfg.model, cfg.render, H, W, jnp.asarray(K), jnp.asarray(poses[i]),
        )
        mse = float(jnp.mean((out["rgb_map"] - images[i]) ** 2))
        total += -10.0 * np.log10(mse)
    return total / len(idxs)
