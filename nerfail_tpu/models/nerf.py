"""The NeRF MLP as a pure function over an explicit parameter pytree.

Architecture matches the reference `NeRF` module (run_nerf_helpers.py:71-123):
8×256 ReLU trunk with a skip concat of the encoded input after layer 4
(`skips=[4]`, run_nerf.py:188), then a view-dependent head:
    alpha_linear   : W → 1          (density)
    feature_linear : W → W
    views_linears  : W+27 → W//2    (single layer, ReLU)
    rgb_linear     : W//2 → 3
Without viewdirs a single output_linear W → 4 is used.

We hand-roll the params (dict of jnp arrays) instead of using a module
system: the pytree maps 1:1 onto pjit shardings (hidden axis → "model"
mesh axis) and feeds straight into the fused Pallas kernel, which wants raw
weight matrices. Init matches torch.nn.Linear's U(±1/√fan_in) so layer-scale
statistics line up with the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import NeRFModelConfig

Params = Dict[str, jnp.ndarray]


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    W = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return W, b


def init_nerf_params(
    key: jax.Array, cfg: NeRFModelConfig, dtype=jnp.float32
) -> Params:
    D, W = cfg.netdepth, cfg.netwidth
    in_ch, in_ch_views = cfg.input_ch, cfg.input_ch_views
    params: Params = {}
    keys = jax.random.split(key, D + 5)

    fan_in = in_ch
    for i in range(D):
        params[f"pts_{i}_w"], params[f"pts_{i}_b"] = _linear_init(
            keys[i], fan_in, W, dtype
        )
        fan_in = W + in_ch if i in cfg.skips else W

    if cfg.use_viewdirs:
        params["alpha_w"], params["alpha_b"] = _linear_init(keys[D], W, 1, dtype)
        params["alpha_b"] = params["alpha_b"] + cfg.density_init_bias
        params["feature_w"], params["feature_b"] = _linear_init(
            keys[D + 1], W, W, dtype
        )
        params["views_w"], params["views_b"] = _linear_init(
            keys[D + 2], W + in_ch_views, W // 2, dtype
        )
        params["rgb_w"], params["rgb_b"] = _linear_init(
            keys[D + 3], W // 2, 3, dtype
        )
    else:
        params["output_w"], params["output_b"] = _linear_init(
            keys[D], W, cfg.output_ch, dtype
        )
        params["output_b"] = params["output_b"].at[3].add(cfg.density_init_bias)
    return params


def apply_nerf(
    params: Params,
    cfg: NeRFModelConfig,
    x: jnp.ndarray,
    views: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[N, input_ch] (+ [N, input_ch_views]) → [N, 4] raw rgb+sigma."""
    h = x
    for i in range(cfg.netdepth):
        h = jnp.dot(h, params[f"pts_{i}_w"]) + params[f"pts_{i}_b"]
        h = jax.nn.relu(h)
        if i in cfg.skips:
            h = jnp.concatenate([x, h], axis=-1)

    if cfg.use_viewdirs:
        alpha = jnp.dot(h, params["alpha_w"]) + params["alpha_b"]
        feature = jnp.dot(h, params["feature_w"]) + params["feature_b"]
        h = jnp.concatenate([feature, views], axis=-1)
        h = jax.nn.relu(jnp.dot(h, params["views_w"]) + params["views_b"])
        rgb = jnp.dot(h, params["rgb_w"]) + params["rgb_b"]
        return jnp.concatenate([rgb, alpha], axis=-1)

    return jnp.dot(h, params["output_w"]) + params["output_b"]


def nerf_param_count(params: Params) -> int:
    return sum(int(p.size) for p in params.values())


def load_weights_from_keras(
    cfg: NeRFModelConfig, weights: list, dtype=jnp.float32
) -> Params:
    """Build a param pytree from the official TF/Keras weight list.

    Parity with `NeRF.load_weights_from_keras` (run_nerf_helpers.py:125-152):
    the list alternates [kernel, bias] per layer in order trunk(D) →
    feature → views → rgb → alpha. Keras kernels are already [in, out], so
    unlike the torch port (which transposes into its [out, in] Linear
    layout) they map straight onto our [in, out] matrices.
    """
    assert cfg.use_viewdirs, "keras import requires use_viewdirs"
    params: Params = {}
    idx = 0

    def take():
        nonlocal idx
        w = jnp.asarray(np.asarray(weights[idx]), dtype)
        b = jnp.asarray(np.asarray(weights[idx + 1]), dtype)
        idx += 2
        return w, b

    for i in range(cfg.netdepth):
        params[f"pts_{i}_w"], params[f"pts_{i}_b"] = take()
    params["feature_w"], params["feature_b"] = take()
    params["views_w"], params["views_b"] = take()
    params["rgb_w"], params["rgb_b"] = take()
    params["alpha_w"], params["alpha_b"] = take()
    return params
