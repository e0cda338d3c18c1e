"""Independent numpy implementations of the reference semantics.

Written from the SURVEY.md behavioural description (not copied from the
reference) purely as a test oracle: slow, obvious, loop-based numpy that the
vectorized JAX ops must match allclose. This substitutes for the reference's
`pytest=True` deterministic-parity hooks (run_nerf.py:373-377 etc.) without
depending on /root/reference at test time.
"""

from __future__ import annotations

import numpy as np


def embed_np(x: np.ndarray, num_freqs: int) -> np.ndarray:
    """[N, d] → [N, d(1+2F)] with [x, sin(xf), cos(xf)] per freq block."""
    outs = [x]
    for i in range(num_freqs):
        f = 2.0 ** i
        outs.append(np.sin(x * f))
        outs.append(np.cos(x * f))
    return np.concatenate(outs, axis=-1)


def raw2outputs_np(raw, z_vals, rays_d, white_bkgd=False):
    """Loop-based compositing oracle (run_nerf.py:262-305 semantics)."""
    N, S, _ = raw.shape
    rgb_map = np.zeros((N, 3))
    acc = np.zeros(N)
    depth = np.zeros(N)
    weights = np.zeros((N, S))
    for n in range(N):
        dnorm = np.linalg.norm(rays_d[n])
        T = 1.0
        for s in range(S):
            dist = (z_vals[n, s + 1] - z_vals[n, s]) if s < S - 1 else 1e10
            dist *= dnorm
            sigma = max(raw[n, s, 3], 0.0)
            alpha = 1.0 - np.exp(-sigma * dist)
            w = alpha * T
            weights[n, s] = w
            rgb = 1.0 / (1.0 + np.exp(-raw[n, s, :3]))
            rgb_map[n] += w * rgb
            acc[n] += w
            depth[n] += w * z_vals[n, s]
            T *= 1.0 - alpha + 1e-10
    if white_bkgd:
        rgb_map += (1.0 - acc)[:, None]
    return rgb_map, acc, depth, weights


def sample_pdf_np(bins, weights, n_samples):
    """Deterministic (linspace-probe) inverse-CDF oracle."""
    w = weights + 1e-5
    pdf = w / w.sum(axis=-1, keepdims=True)
    cdf = np.concatenate(
        [np.zeros(pdf.shape[:-1] + (1,)), np.cumsum(pdf, axis=-1)], axis=-1
    )
    u = np.linspace(0.0, 1.0, n_samples)
    out = np.zeros(bins.shape[:-1] + (n_samples,))
    for n in range(bins.shape[0]):
        inds = np.searchsorted(cdf[n], u, side="right")
        below = np.clip(inds - 1, 0, cdf.shape[-1] - 1)
        above = np.clip(inds, 0, cdf.shape[-1] - 1)
        denom = cdf[n][above] - cdf[n][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u - cdf[n][below]) / denom
        out[n] = bins[n][below] + t * (bins[n][above] - bins[n][below])
    return out


def mlp_np(params, x, views, depth=8, skips=(4,)):
    """Plain-loop NeRF MLP oracle with viewdir head."""
    def lin(h, w, b):
        return h @ np.asarray(w) + np.asarray(b)

    h = x
    for i in range(depth):
        h = np.maximum(lin(h, params[f"pts_{i}_w"], params[f"pts_{i}_b"]), 0.0)
        if i in skips:
            h = np.concatenate([x, h], axis=-1)
    alpha = lin(h, params["alpha_w"], params["alpha_b"])
    feat = lin(h, params["feature_w"], params["feature_b"])
    h = np.concatenate([feat, views], axis=-1)
    h = np.maximum(lin(h, params["views_w"], params["views_b"]), 0.0)
    rgb = lin(h, params["rgb_w"], params["rgb_b"])
    return np.concatenate([rgb, alpha], axis=-1)


def knn_np(queries, points, k=8):
    """Brute-force k-NN oracle: returns (dists, idx) sorted ascending."""
    d = np.linalg.norm(queries[:, None, :] - points[None, :, :], axis=-1)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=-1), idx
