"""Spatial-point-set extraction: render → per-pixel 3D coords → point set S.

Replaces the nerf_to_coord.py / create_index_and_dist.py stages:
  * `extract_coord_maps` renders each pose and keeps the `pts_max` output
    (dominant 3D sample per ray — a first-class renderer output here, see
    render.py, vs the reference's forked renderer nerf_to_coord.py:418-423)
  * `build_point_set` stacks the p selected mask views into S [p·H·W, 3]
    (create_index_and_dist.py:57-61)

Artifacts are plain .npz arrays under an artifact dir (one file per split),
not 400 pickled .pth files.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import ExperimentConfig, PointSetConfig
from nerfail_tpu.pointset.knn_build import build_index_and_dist
from nerfail_tpu.pointset.weights import gauss_weights
from nerfail_tpu.render import render_full_image


def extract_coord_maps(
    params: Dict,
    cfg: ExperimentConfig,
    poses: np.ndarray,      # [N, 4, 4]
    H: int,
    W: int,
    K: np.ndarray,
    save_dir: Optional[str] = None,
    save_rgb: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render every pose; return (coords [N,H,W,3], rgbs [N,H,W,3])."""
    coords, rgbs = [], []
    K_d = jnp.asarray(K)
    for i in range(poses.shape[0]):
        out = render_full_image(
            params["coarse"], params["fine"], cfg.model, cfg.render,
            H, W, K_d, jnp.asarray(poses[i]),
        )
        coords.append(np.asarray(out["pts_max"]))
        rgbs.append(np.asarray(out["rgb_map"]))
    coords = np.stack(coords)
    rgbs = np.stack(rgbs)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.savez_compressed(os.path.join(save_dir, "coords.npz"), coords=coords)
        if save_rgb:
            np.savez_compressed(os.path.join(save_dir, "rgbs.npz"), rgbs=rgbs)
    return coords, rgbs


def build_point_set(
    mask_coord_maps: np.ndarray,   # [p, H, W, 3] coord maps of the mask views
) -> np.ndarray:
    """S = union of the p views' pixel coords, [p·H·W, 3]
    (create_index_and_dist.py:57-61 stacking order: view-major)."""
    p, H, W, _ = mask_coord_maps.shape
    return mask_coord_maps.reshape(p * H * W, 3)


def build_neighbor_tables(
    coord_maps: np.ndarray,        # [N, H, W, 3] coords of the split to process
    point_set: np.ndarray,         # [M, 3]
    pcfg: PointSetConfig = PointSetConfig(),
    save_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(weights [N,H,W,k], idx [N,H,W,k]) — the index_and_weight artifact
    ([2,H,W,8] per image in the reference, GaussNet.py:161-186)."""
    S = jnp.asarray(point_set)
    all_w, all_i = [], []
    for n in range(coord_maps.shape[0]):
        dist, idx = build_index_and_dist(
            coord_maps[n], S, k=pcfg.k,
            q_chunk=pcfg.q_chunk, s_tile=pcfg.s_chunk,
        )
        w = np.asarray(gauss_weights(jnp.asarray(dist), pcfg.gauss_c, pcfg.gauss_eps))
        all_w.append(w)
        all_i.append(idx)
    weights = np.stack(all_w)
    idxs = np.stack(all_i)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez_compressed(save_path, weights=weights, idx=idxs)
    return weights, idxs
