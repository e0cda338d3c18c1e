"""Benchmark: full lego-config NeRF training throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only published speed number — nerf-pytorch at
~7 train iters/s (1024 rays/iter, lego low-res, RTX 2080 Ti;
BASELINE.md). We measure the FULL config (800² scene, 8×256 MLP,
64 coarse + 128 fine samples, N_rand=1024) — a strictly harder workload
than the baseline's low-res run.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nerfail_tpu.config import (
        ExperimentConfig, NeRFModelConfig, RenderConfig, TrainConfig,
    )
    from nerfail_tpu.data.blender import white_background_composite
    from nerfail_tpu.data.synthetic import make_box_scene
    from nerfail_tpu.train.nerf_trainer import (
        create_train_state, make_train_step,
    )

    mcfg = NeRFModelConfig()                       # 8×256, 63/27-ch encodings
    rcfg = RenderConfig(N_samples=64, N_importance=128)
    tcfg = TrainConfig(N_rand=1024, precrop_iters=0)
    cfg = ExperimentConfig(model=mcfg, render=rcfg, train=tcfg)

    # 800² procedural scene — content is irrelevant to throughput
    scene = make_box_scene(n_train=8, n_val=1, n_test=1, H=800, W=800)
    targets = white_background_composite(scene.images)

    key = jax.random.PRNGKey(0)
    state = create_train_state(key, mcfg, rcfg, tcfg)
    step_fn = make_train_step(mcfg, rcfg, tcfg, precrop=False)

    images = jnp.asarray(targets[scene.i_train])
    poses = jnp.asarray(scene.poses[scene.i_train])
    K = jnp.asarray(scene.K)
    params, opt_state = state.params, state.opt_state

    # warmup (compile + first steps). NOTE: block_until_ready does not
    # reliably synchronize through the axon tunnel — force a scalar
    # readback (np.asarray) to fence true device execution.
    for i in range(3):
        params, opt_state, m = step_fn(
            params, opt_state, images, poses, K, jax.random.fold_in(key, i)
        )
    float(np.asarray(m["loss"]))

    n_iters = 100
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, m = step_fn(
            params, opt_state, images, poses, K,
            jax.random.fold_in(key, 100 + i),
        )
    float(np.asarray(m["loss"]))   # true sync fence
    dt = time.perf_counter() - t0

    iters_per_s = n_iters / dt
    baseline_iters_per_s = 7.0   # nerf-pytorch, RTX 2080 Ti (BASELINE.md)
    print(json.dumps({
        "metric": "nerf_train_iters_per_s_full_lego_config",
        "value": round(iters_per_s, 2),
        "unit": "iters/s (1024 rays, 64+128 samples, 8x256 MLP)",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 2),
    }))


if __name__ == "__main__":
    main()
