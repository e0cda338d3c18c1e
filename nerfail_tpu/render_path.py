"""Batch pose rendering + image/video artifact writing.

The reference's `render_path` (run_nerf.py:137-175) and the render-only
short-circuit (run_nerf.py:670-688, nerf_render_only.py): loop over poses,
render each, save `NNN.png` (to8b) and optionally per-image coord `.npy`
maps and an mp4 spiral video. `render_factor` renders at reduced
resolution for fast previews.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import ExperimentConfig
from nerfail_tpu.render import render_full_image


def to8b(x: np.ndarray) -> np.ndarray:
    """float [0,1] → uint8 (run_nerf_helpers.py:11)."""
    return (255.0 * np.clip(x, 0.0, 1.0)).astype(np.uint8)


def render_path(
    params: Dict,
    cfg: ExperimentConfig,
    poses: np.ndarray,          # [N, 4, 4] (or [N, 3, 5] llff)
    H: int,
    W: int,
    K: np.ndarray,
    save_dir: Optional[str] = None,
    render_factor: int = 0,
    save_coords: bool = False,
    video_path: Optional[str] = None,
    fps: int = 30,
):
    """Render every pose; returns (rgbs [N,H,W,3], disps [N,H,W]).

    save_dir writes NNN.png (+ NNN.npy coord maps when save_coords, the
    nerf_to_coord.py:172-173 artifact). video_path writes an mp4 like the
    reference's spiral videos (run_nerf.py:818-825).
    """
    if render_factor > 0:
        H, W = H // render_factor, W // render_factor
        K = K.copy()
        K[:2] = K[:2] / render_factor

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    rgbs, disps = [], []
    K_d = jnp.asarray(K)
    for i in range(poses.shape[0]):
        out = render_full_image(
            params["coarse"], params.get("fine"), cfg.model, cfg.render,
            H, W, K_d, jnp.asarray(poses[i][:3, :4]),
        )
        rgb = np.asarray(out["rgb_map"])
        rgbs.append(rgb)
        disps.append(np.asarray(out["disp_map"]))
        if save_dir:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(save_dir, f"{i:03d}.png"), to8b(rgb))
            if save_coords:
                np.save(
                    os.path.join(save_dir, f"{i:03d}.npy"),
                    np.asarray(out["pts_max"]),
                )
    rgbs = np.stack(rgbs)
    disps = np.stack(disps)

    if video_path:
        import imageio.v2 as imageio

        os.makedirs(os.path.dirname(video_path) or ".", exist_ok=True)
        try:
            imageio.mimwrite(video_path, to8b(rgbs), fps=fps, quality=8)
        except (ValueError, TypeError):
            # no ffmpeg backend in this environment → animated GIF
            gif = os.path.splitext(video_path)[0] + ".gif"
            imageio.mimwrite(gif, to8b(rgbs), duration=1000.0 / fps)
    return rgbs, disps
