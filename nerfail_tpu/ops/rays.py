"""Camera-ray generation and NDC reparameterization.

Semantics match the reference `get_rays`/`get_rays_np`/`ndc_rays`
(run_nerf_helpers.py:157-196): OpenGL-style camera with +x right, +y up,
-z forward; pixel (i, j) maps to direction
((i-cx)/fx, -(j-cy)/fy, -1) rotated by c2w.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Per-pixel rays for an H×W image.

    Returns (rays_o, rays_d) each [H, W, 3]. K is the 3×3 intrinsics,
    c2w the 3×4 (or 4×4) camera-to-world matrix.
    """
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )
    # full f32 precision: ray geometry must not go through bf16 MXU passes
    rays_d = jnp.einsum(
        "hwc,rc->hwr", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K: np.ndarray, c2w: np.ndarray):
    """Numpy twin of get_rays for host-side dataset precomputation."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    dirs = np.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -np.ones_like(i)],
        axis=-1,
    )
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift rays to the z=-near plane and map to NDC (forward-facing LLFF)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
