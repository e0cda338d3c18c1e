"""The volume renderer: coarse→fine hierarchical rendering of ray batches.

Re-designs the reference call chain `render → batchify_rays → render_rays →
run_network` (run_nerf.py:27-134,308-418) as pure jitted functions:

  * `render_rays`       — one static-shape ray tile end to end (the hot path)
  * `render_full_image` — builds per-pixel rays and lax.map's ray tiles
  * `query_network`     — encode + MLP, optionally via the fused Pallas kernel

Differences from the reference that are deliberate TPU-first choices:
  - no Python chunk loops: `lax.map` over fixed tiles (utils/chunk.py)
  - randomness via explicit jax.random keys, not global torch RNG
  - the coarse and fine passes share one compiled program
  - `pts_max` (the pixel→3D map of nerf_to_coord.py:418-423) is a regular
    output of the fine pass, not a forked copy of the renderer
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nerfail_tpu.config import NeRFModelConfig, RenderConfig
from nerfail_tpu.models.nerf import Params, apply_nerf
from nerfail_tpu.ops.encoding import positional_encoding
from nerfail_tpu.ops.rays import get_rays, ndc_rays
from nerfail_tpu.ops.sampling import sample_pdf, stratified_z_vals
from nerfail_tpu.ops.volume import raw2outputs
from nerfail_tpu.utils.chunk import chunked_map


def query_network(
    params: Params,
    mcfg: NeRFModelConfig,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Evaluate the NeRF at [N, S, 3] points (+ per-ray [N, 3] viewdirs).

    Mirrors `run_network` (run_nerf.py:37-51): flatten → embed → MLP →
    reshape. With use_pallas=True the encode+MLP runs as one fused VMEM
    kernel (ops/pallas/mlp_kernel.py) so the 63/27-channel encodings never
    touch HBM. None = auto: fused kernel on TPU (1.5× faster there), plain
    XLA elsewhere (CPU tests, interpret-free).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and mcfg.use_viewdirs and viewdirs is not None
        )
    n_rays, n_samples = pts.shape[:2]
    if use_pallas:
        from nerfail_tpu.ops.pallas.mlp_kernel import nerf_mlp_fused

        vd = None
        if mcfg.use_viewdirs and viewdirs is not None:
            vd = jnp.broadcast_to(
                viewdirs[:, None, :], (n_rays, n_samples, 3)
            ).reshape(-1, 3)
        raw = nerf_mlp_fused(params, mcfg, pts.reshape(-1, 3), vd)
        return raw.reshape(n_rays, n_samples, 4)

    flat = pts.reshape(-1, 3)
    embedded = positional_encoding(flat, mcfg.multires)
    emb_views = None
    if mcfg.use_viewdirs and viewdirs is not None:
        vd = jnp.broadcast_to(viewdirs[:, None, :], (n_rays, n_samples, 3))
        emb_views = positional_encoding(vd.reshape(-1, 3), mcfg.multires_views)
    raw = apply_nerf(params, mcfg, embedded, emb_views)
    return raw.reshape(n_rays, n_samples, 4)


def render_rays(
    params_coarse: Params,
    params_fine: Optional[Params],
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray] = None,
    near=None,
    far=None,
    key: Optional[jax.Array] = None,
    train: bool = False,
    t_rand: Optional[jnp.ndarray] = None,
    u_pdf: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a [N, 3] ray batch; the reference's render_rays+raw2outputs.

    Returns rgb/disp/acc maps (fine), coarse `rgb0/disp0/acc0`, `z_std`,
    and `pts_max` — the dominant 3D point per ray (argmax of fine
    compositing weights; nerf_to_coord.py:418-421).

    `t_rand`/`u_pdf` inject explicit stratified-jitter and inverse-CDF
    uniforms — the reference's `pytest=True` deterministic hooks
    (run_nerf.py:373-377, run_nerf_helpers.py:214-223) for allclose
    parity tests.
    """
    n_rays = rays_o.shape[0]
    near = rcfg.near if near is None else near
    far = rcfg.far if far is None else far
    if viewdirs is None and mcfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    perturb_on = train and rcfg.perturb > 0.0
    noise_on = train and rcfg.raw_noise_std > 0.0
    if key is not None:
        k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)
    else:
        k_strat = k_pdf = k_noise_c = k_noise_f = None

    z_vals = stratified_z_vals(
        n_rays, rcfg.N_samples, near, far, rcfg.lindisp,
        key=k_strat if perturb_on else None, t_rand=t_rand,
    )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]

    raw = query_network(params_coarse, mcfg, pts, viewdirs, rcfg.use_pallas)
    coarse = raw2outputs(
        raw, z_vals, rays_d,
        raw_noise_std=rcfg.raw_noise_std if noise_on else 0.0,
        white_bkgd=rcfg.white_bkgd,
        key=k_noise_c if noise_on else None,
    )

    out: Dict[str, jnp.ndarray] = {}
    if rcfg.N_importance > 0:
        fine_params = params_fine if params_fine is not None else params_coarse
        z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            z_mids, coarse["weights"][..., 1:-1], rcfg.N_importance,
            det=not perturb_on and u_pdf is None, key=k_pdf, u=u_pdf,
        )
        z_samples = jax.lax.stop_gradient(z_samples)  # run_nerf.py:394
        z_all = jnp.sort(
            jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1
        )
        pts_f = (
            rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., :, None]
        )
        raw_f = query_network(fine_params, mcfg, pts_f, viewdirs, rcfg.use_pallas)
        fine = raw2outputs(
            raw_f, z_all, rays_d,
            raw_noise_std=rcfg.raw_noise_std if noise_on else 0.0,
            white_bkgd=rcfg.white_bkgd,
            key=k_noise_f if noise_on else None,
        )
        out["rgb_map"] = fine["rgb_map"]
        out["disp_map"] = fine["disp_map"]
        out["acc_map"] = fine["acc_map"]
        out["depth_map"] = fine["depth_map"]
        out["rgb0"] = coarse["rgb_map"]
        out["disp0"] = coarse["disp_map"]
        out["acc0"] = coarse["acc_map"]
        out["z_std"] = jnp.std(z_samples, axis=-1)
        # pixel→3D map: dominant sample of the *fine* pass after z-merge
        # (nerf_to_coord.py:407-421 — easy to get subtly wrong, see SURVEY §7).
        idx_max = jnp.argmax(fine["weights"], axis=-1)
        out["pts_max"] = jnp.take_along_axis(
            pts_f, idx_max[:, None, None], axis=1
        )[:, 0, :]
    else:
        out["rgb_map"] = coarse["rgb_map"]
        out["disp_map"] = coarse["disp_map"]
        out["acc_map"] = coarse["acc_map"]
        out["depth_map"] = coarse["depth_map"]
        idx_max = jnp.argmax(coarse["weights"], axis=-1)
        out["pts_max"] = jnp.take_along_axis(
            pts, idx_max[:, None, None], axis=1
        )[:, 0, :]
    return out


@partial(jax.jit, static_argnames=("mcfg", "rcfg", "H", "W"))
def render_full_image(
    params_coarse: Params,
    params_fine: Optional[Params],
    mcfg: NeRFModelConfig,
    rcfg: RenderConfig,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Render a full pose deterministically (test-time: perturb=0, noise=0).

    Returns dict of [H, W, ...] maps including `pts_max` [H, W, 3] — the
    per-image world-coordinate map the point-set stage consumes
    (nerf_to_coord.py saves these as NNN.npy).
    """
    rays_o, rays_d = get_rays(H, W, K, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    if rcfg.ndc:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o, rays_d = ndc_rays(H, W, K[0, 0], 1.0, rays_o, rays_d)
        near, far = 0.0, 1.0
    else:
        viewdirs = None
        near, far = rcfg.near, rcfg.far

    def tile_fn(tile):
        o, d = tile["o"], tile["d"]
        vd = tile.get("vd")
        return render_rays(
            params_coarse, params_fine, mcfg, rcfg, o, d, vd,
            near=near, far=far, key=None, train=False,
        )

    batch = {"o": rays_o, "d": rays_d}
    if viewdirs is not None:
        batch["vd"] = viewdirs
    out = chunked_map(tile_fn, batch, rcfg.chunk)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((H, W) + a.shape[1:]), out
    )
