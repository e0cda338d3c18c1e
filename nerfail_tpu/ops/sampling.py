"""Ray sampling: stratified coarse z-values and hierarchical inverse-CDF.

Matches the reference semantics:
  - stratified sampling with per-bin jitter: run_nerf.py:357-381
  - `sample_pdf` hierarchical sampling: run_nerf_helpers.py:200-243

TPU-first details: everything is static-shape and vectorized over the ray
axis; randomness comes from explicit `jax.random` keys (pass key=None for
the deterministic path — midpoints for stratified, linspace for pdf — which
is what the reference uses at test time, perturb=0 / det=True).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    n_rays: int,
    N_samples: int,
    near,
    far,
    lindisp: bool = False,
    key: Optional[jax.Array] = None,
    t_rand: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[n_rays, N_samples] depths in [near, far].

    near/far may be scalars or [n_rays, 1] arrays. With `key` (or explicit
    `t_rand` in [0,1), for parity tests) samples are jittered uniformly
    within each stratum, else bin midpoints-free linspace is returned
    exactly as the reference's perturb=0 path.
    """
    t_vals = jnp.linspace(0.0, 1.0, N_samples, dtype=dtype)
    near = jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, (n_rays, N_samples))

    if key is None and t_rand is None:
        return z_vals

    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    if t_rand is None:
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_samples: int,
    det: bool = False,
    key: Optional[jax.Array] = None,
    u: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of N_samples depths from a piecewise-constant pdf.

    bins: [..., M+1] bin edges (the z midpoints from the coarse pass);
    weights: [..., M] unnormalized densities (coarse weights[1:-1]).
    det=True → uniform linspace probes (the reference's test-time path);
    otherwise uniform randoms from `key` (or explicit `u` for parity tests).

    The caller is responsible for `stop_gradient` (reference detaches at
    run_nerf.py:394).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M+1]

    if u is None:
        if det:
            u = jnp.linspace(0.0, 1.0, N_samples, dtype=cdf.dtype)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
        else:
            u = jax.random.uniform(
                key, cdf.shape[:-1] + (N_samples,), dtype=cdf.dtype
            )

    # Interval lookup WITHOUT gathers: take_along_axis is slow on TPU (the
    # scatter/gather unit), but since cdf and bins are both ascending, the
    # searchsorted-right neighbors are expressible as masked lane
    # reductions over a [.., N_probes, M+1] broadcast — pure VPU work.
    #   below = last j with cdf_j <= u   → masked max
    #   above = first j with cdf_j > u   → masked min (empty → last entry)
    ge = u[..., :, None] >= cdf[..., None, :]           # [.., N, M+1]
    cdf_b = jnp.broadcast_to(cdf[..., None, :], ge.shape)
    bins_b = jnp.broadcast_to(bins[..., None, :], ge.shape)
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)

    cdf_below = jnp.max(jnp.where(ge, cdf_b, neg), axis=-1)
    cdf_above = jnp.min(jnp.where(ge, pos, cdf_b), axis=-1)
    bins_below = jnp.max(jnp.where(ge, bins_b, neg), axis=-1)
    bins_above = jnp.min(jnp.where(ge, pos, bins_b), axis=-1)
    # u >= cdf_0 = 0 always holds, so 'below' is never empty; 'above' is
    # empty only when u >= cdf_last — clamp to the last entry like the
    # reference's min(inds, M) (run_nerf_helpers.py:226-227).
    cdf_above = jnp.where(jnp.isinf(cdf_above), cdf[..., -1:], cdf_above)
    bins_above = jnp.where(jnp.isinf(bins_above), bins[..., -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
