"""Volume-rendering compositing (the reference's `raw2outputs`).

Numerics deliberately match run_nerf.py:262-305:
  dists   = z[i+1] - z[i], sentinel 1e10 for the last sample, scaled by |d|
  alpha   = 1 - exp(-relu(sigma + noise) · dist)
  T       = exclusive cumprod of (1 - alpha + 1e-10)
  weights = alpha · T
  rgb_map = Σ w · sigmoid(rgb_raw);  white_bkgd adds (1 - acc)
  disp    = 1 / max(1e-10, depth / acc)

The exclusive cumprod is the sequential dependency of the whole renderer;
we compute it with `jnp.cumprod` on a shifted sequence, which XLA lowers to
a log-depth parallel scan that fuses with the surrounding elementwise ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """cumprod shifted right by one with a leading 1 (torch.cumprod of
    cat([ones, x[..., :-1]]) — run_nerf.py:295)."""
    ones = jnp.ones_like(jnp.take(x, jnp.array([0]), axis=axis))
    shifted = jnp.concatenate(
        [ones, jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    return jnp.cumprod(shifted, axis=axis)


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
):
    """Composite raw MLP outputs along each ray.

    raw: [N, S, 4] (rgb logits + sigma), z_vals: [N, S], rays_d: [N, 3].
    Returns dict(rgb_map, disp_map, acc_map, weights, depth_map).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    sigma = raw[..., 3]
    if noise is None and raw_noise_std > 0.0 and key is not None:
        noise = jax.random.normal(key, sigma.shape, sigma.dtype) * raw_noise_std
    if noise is not None:
        sigma = sigma + noise

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    transmittance = exclusive_cumprod(1.0 - alpha + 1e-10, axis=-1)
    weights = alpha * transmittance

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "weights": weights,
        "depth_map": depth_map,
    }
