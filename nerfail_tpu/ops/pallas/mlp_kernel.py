"""Fused NeRF-MLP Pallas kernel with recompute-in-VMEM backward.

Why: the XLA path materializes every 256-wide activation
([N·S, 256] ≈ 268 MB per layer at the full config) to HBM in forward AND
backward — the renderer is HBM-bound at ~30 TFLOP/s. This kernel runs the
whole trunk + viewdir head per point-tile inside VMEM:

  forward : out = MLP(enc_x, enc_d); nothing but [T, 64]/[T, 32] inputs and
            [T, 8] raw outputs cross HBM
  backward: custom VJP re-runs the forward per tile, stashing the layer
            activations in a VMEM scratch (D×[T,256] ≈ 4 MB at T=512),
            then backprops in-tile; dW accumulates across the sequential
            grid into constant-index outputs

Matmuls run as bf16 MXU passes with f32 accumulation
(preferred_element_type) — the standard TPU mixed-precision contract.

Layout: all dims pre-padded lane-friendly outside the kernel
(63→64 enc_x, 27→32 enc_d, skip rows 319→320, head cols 3/1→8); padded
rows/cols are zero so they contribute nothing.

Supports the reference architecture family: any depth, one optional skip
concat (default after layer 4, run_nerf.py:188), viewdir head
(run_nerf_helpers.py:71-123).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfail_tpu.config import NeRFModelConfig
from nerfail_tpu.ops.encoding import positional_encoding

# forward keeps only one [T, 320] activation live; backward stashes all D
# layer activations in VMEM (D·T·256·2B in bf16) so its tile stays smaller.
# 1024 measured fastest for the fwd on v5e (39.7 TF/s vs 34.6 @2048 and
# 25.8 @512, chained-dispatch timing r3) — the kernel is MXU-pass-bound at
# the reference's 256-wide shape, not DMA-bound, so moderate tiles win.
FWD_TILE = 1024
BWD_TILE = 512
TILE = BWD_TILE  # alignment granularity for input padding
_DOT = functools.partial(
    jax.lax.dot_general, preferred_element_type=jnp.float32
)

# matmul input dtype: bf16 = single MXU pass (production); tests flip to
# f32 to validate the kernel math bit-for-bit against the XLA path.
MATMUL_DTYPE = jnp.bfloat16


def _mm(a, b):
    """[m,k]@[k,n] with bf16 MXU passes, f32 accumulate."""
    return _DOT(
        a.astype(MATMUL_DTYPE), b.astype(MATMUL_DTYPE),
        (((1,), (0,)), ((), ())),
    )


def _mm_tA(a, b):
    """aᵀ@b ([k,m],[k,n]→[m,n])."""
    return _DOT(
        a.astype(MATMUL_DTYPE), b.astype(MATMUL_DTYPE),
        (((0,), (0,)), ((), ())),
    )


def _mm_tB(a, b):
    """a@bᵀ ([m,k],[n,k]→[m,n])."""
    return _DOT(
        a.astype(MATMUL_DTYPE), b.astype(MATMUL_DTYPE),
        (((1,), (1,)), ((), ())),
    )


# ---------------------------------------------------------------- forward


def _fwd_kernel(depth, skips, enc_x_ref, enc_d_ref, *refs):
    n_w = depth + 4                 # W0..W_{D-1}, feature, views, alpha, rgb
    n_b = depth + 2                 # b0..b_{D-1}, feature_b, views_b
    w_refs = refs[:n_w]
    b_refs = refs[n_w:n_w + n_b]
    out_ref = refs[-1]

    x = enc_x_ref[:]                                    # [T, 64]
    h = x
    for i in range(depth):
        h = jnp.maximum(_mm(h, w_refs[i][:]) + b_refs[i][:], 0.0)
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)

    feature = _mm(h, w_refs[depth][:]) + b_refs[depth][:]       # [T, 256]
    hv = jnp.concatenate([feature, enc_d_ref[:]], axis=-1)      # [T, 288]
    hv = jnp.maximum(_mm(hv, w_refs[depth + 1][:]) + b_refs[depth + 1][:], 0.0)
    alpha = _mm(h, w_refs[depth + 2][:])                        # [T, 8]
    rgb = _mm(hv, w_refs[depth + 3][:])                         # [T, 8]
    out_ref[:] = rgb + alpha                                    # disjoint cols


# ---------------------------------------------------------------- backward


def _bwd_kernel(depth, skips, enc_x_ref, enc_d_ref, *refs):
    n_w = depth + 4
    n_b = depth + 2
    w_refs = refs[:n_w]
    b_refs = refs[n_w:n_w + n_b]
    g_ref = refs[n_w + n_b]
    # outputs: d_enc_x, d_enc_d, dW*, db*
    d_enc_x_ref = refs[n_w + n_b + 1]
    d_enc_d_ref = refs[n_w + n_b + 2]
    dw_refs = refs[n_w + n_b + 3: n_w + n_b + 3 + n_w]
    db_refs = refs[n_w + n_b + 3 + n_w:]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        for r in list(dw_refs) + list(db_refs):
            r[:] = jnp.zeros_like(r)

    # ---- recompute forward, stashing layer inputs AND relu outputs ----
    # stash in MATMUL_DTYPE: the matmuls re-cast to it anyway, so nothing
    # is lost on the dW path, and the live-VMEM footprint halves (bf16)
    x = enc_x_ref[:]
    h = x
    hs = []            # input to layer i
    outs = []          # relu output of layer i (pre-skip-concat)
    for i in range(depth):
        hs.append(h.astype(MATMUL_DTYPE))
        h = jnp.maximum(_mm(h, w_refs[i][:]) + b_refs[i][:], 0.0)
        outs.append(h.astype(MATMUL_DTYPE))
        if i in skips:
            h = jnp.concatenate([x.astype(h.dtype), h], axis=-1)
    trunk = h                                               # [T, 256]
    feature = _mm(trunk, w_refs[depth][:]) + b_refs[depth][:]
    hv_in = jnp.concatenate([feature, enc_d_ref[:]], axis=-1)
    hv = jnp.maximum(
        _mm(hv_in, w_refs[depth + 1][:]) + b_refs[depth + 1][:], 0.0
    )

    g = g_ref[:]                                            # [T, 8]

    # ---- head backward ----
    # out = hv @ rgb_w + trunk @ alpha_w (disjoint cols, shared g)
    dw_refs[depth + 3][:] += _mm_tA(hv, g)                  # d rgb_w
    dw_refs[depth + 2][:] += _mm_tA(trunk, g)               # d alpha_w
    d_hv = _mm_tB(g, w_refs[depth + 3][:])                  # [T, 128]
    d_hv = jnp.where(hv > 0, d_hv, 0.0)
    db_refs[depth + 1][:] += jnp.sum(d_hv, axis=0, keepdims=True)
    dw_refs[depth + 1][:] += _mm_tA(hv_in, d_hv)            # d views_w
    d_hv_in = _mm_tB(d_hv, w_refs[depth + 1][:])            # [T, W+vd_pad]
    W = trunk.shape[-1]
    d_feature = d_hv_in[:, :W]
    d_enc_d_ref[:] = d_hv_in[:, W:]
    db_refs[depth][:] += jnp.sum(d_feature, axis=0, keepdims=True)
    dw_refs[depth][:] += _mm_tA(trunk, d_feature)           # d feature_w
    d_trunk = _mm_tB(d_feature, w_refs[depth][:])
    d_trunk += _mm_tB(g, w_refs[depth + 2][:])              # alpha branch

    # ---- trunk backward ----
    d_h = d_trunk                                           # grad of layer-i output
    d_x = jnp.zeros_like(x)
    for i in reversed(range(depth)):
        if i in skips:
            # h was concat([x, relu_out]) after layer i
            d_x += d_h[:, : x.shape[-1]]
            d_h = d_h[:, x.shape[-1]:]
        # relu mask in f32: Mosaic has no bf16 vector compare on v5e
        d_z = jnp.where(outs[i].astype(jnp.float32) > 0, d_h, 0.0)
        db_refs[i][:] += jnp.sum(d_z, axis=0, keepdims=True)
        dw_refs[i][:] += _mm_tA(hs[i], d_z)
        d_h = _mm_tB(d_z, w_refs[i][:])
    d_x += d_h
    d_enc_x_ref[:] = d_x


# ---------------------------------------------------------------- plumbing


def _pad_cols(a, n):
    return jnp.pad(a, ((0, 0), (0, n - a.shape[1])))


def _pad_rows(a, n):
    return jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))


def _prep(params: Dict, cfg: NeRFModelConfig):
    """Pad params to lane-friendly shapes; returns (ws, bs, meta)."""
    D, W = cfg.netdepth, cfg.netwidth
    in_pad = _round_up(cfg.input_ch, 64)
    vd_pad = _round_up(cfg.input_ch_views, 32)
    ws, bs = [], []
    for i in range(D):
        w = params[f"pts_{i}_w"]
        rows = in_pad if i == 0 else (
            W + in_pad if (i - 1) in cfg.skips else W
        )
        if (i - 1) in cfg.skips:
            # rows are [x(63) | h(W)] in apply_nerf order → re-pad x block
            w = jnp.concatenate(
                [_pad_rows(w[: cfg.input_ch], in_pad), w[cfg.input_ch:]], 0
            )
        else:
            w = _pad_rows(w, rows)
        ws.append(w)
        bs.append(params[f"pts_{i}_b"][None, :])
    ws.append(params["feature_w"])                       # [W, W]
    bs.append(params["feature_b"][None, :])
    vw = params["views_w"]                               # [W+27, W//2]
    vw = jnp.concatenate(
        [vw[:W], _pad_rows(vw[W:], vd_pad)], axis=0
    )                                                    # [W+vd_pad, W//2]
    ws.append(vw)
    bs.append(params["views_b"][None, :])
    # alpha packed into col 3, rgb into cols 0..2, so the two head matmuls
    # add into disjoint lanes of the [T, 8] output
    aw = jnp.zeros((W, 8), params["alpha_w"].dtype)
    aw = aw.at[:, 3:4].set(params["alpha_w"])
    ws.append(aw)                                        # [W, 8]
    ws.append(_pad_cols(params["rgb_w"], 8))             # [W//2, 8] cols 0..2
    return ws, bs, (in_pad, vd_pad)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _unpack_head_bias(params):
    # head biases (rgb_b, alpha_b) are folded into the output outside the
    # kernel — cheap elementwise add on [N, 8]
    return params["rgb_b"], params["alpha_b"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_call(static, enc_x, enc_d, ws, bs):
    return _run_fwd(static, enc_x, enc_d, ws, bs)


def _run_fwd(static, enc_x, enc_d, ws, bs):
    depth, skips = static
    # one XLA-level cast per call instead of a VPU cast per grid step;
    # also halves the per-step weight VMEM traffic (bf16)
    ws = tuple(w.astype(MATMUL_DTYPE) for w in ws)
    n = enc_x.shape[0]
    tile = FWD_TILE if n % FWD_TILE == 0 else TILE
    grid = (n // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth, skips),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, enc_d.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(w) for w in ws],
            *[full(b) for b in bs],
        ],
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
    )(enc_x, enc_d, *ws, *bs)
    return out


def _fused_fwd(static, enc_x, enc_d, ws, bs):
    return _run_fwd(static, enc_x, enc_d, ws, bs), (enc_x, enc_d, ws, bs)


def _fused_bwd(static, res, g):
    depth, skips = static
    enc_x, enc_d, ws, bs = res
    ws = tuple(w.astype(MATMUL_DTYPE) for w in ws)
    n = enc_x.shape[0]
    tile = BWD_TILE
    grid = (n // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(enc_x.shape, jnp.float32),
        jax.ShapeDtypeStruct(enc_d.shape, jnp.float32),
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws),
        tuple(jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs),
    )
    flat_outs = pl.pallas_call(
        functools.partial(_bwd_kernel, depth, skips),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, enc_d.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(w) for w in ws],
            *[full(b) for b in bs],
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, enc_d.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(s.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for s in out_shapes[2]],
            *[pl.BlockSpec(s.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for s in out_shapes[3]],
        ],
        out_shape=[
            out_shapes[0], out_shapes[1], *out_shapes[2], *out_shapes[3],
        ],
    )(enc_x, enc_d, *ws, *bs, g)
    d_enc_x, d_enc_d = flat_outs[0], flat_outs[1]
    n_w = depth + 4
    d_ws = tuple(flat_outs[2:2 + n_w])
    d_bs = tuple(flat_outs[2 + n_w:])
    return d_enc_x, d_enc_d, d_ws, d_bs


_fused_call.defvjp(_fused_fwd, _fused_bwd)


def nerf_mlp_fused(
    params: Dict,
    cfg: NeRFModelConfig,
    pts: jnp.ndarray,                 # [P, 3] flat points
    viewdirs: Optional[jnp.ndarray],  # [P, 3] flat dirs (required)
) -> jnp.ndarray:
    """Drop-in for encode+apply_nerf: [P, 3](+dirs) → [P, 4] raw rgbσ."""
    assert cfg.use_viewdirs and viewdirs is not None, (
        "fused kernel requires the viewdir head; use the XLA path otherwise"
    )
    P = pts.shape[0]
    enc_x = positional_encoding(pts, cfg.multires)
    enc_d = positional_encoding(viewdirs, cfg.multires_views)
    in_pad = _round_up(cfg.input_ch, 64)
    vd_pad = _round_up(cfg.input_ch_views, 32)
    enc_x = _pad_cols(enc_x, in_pad)
    enc_d = _pad_cols(enc_d, vd_pad)

    n = _round_up(P, TILE)
    if n != P:
        enc_x = jnp.pad(enc_x, ((0, n - P), (0, 0)))
        enc_d = jnp.pad(enc_d, ((0, n - P), (0, 0)))

    ws, bs, _ = _prep(params, cfg)
    out = _fused_call(
        (cfg.netdepth, tuple(cfg.skips)), enc_x, enc_d, tuple(ws), tuple(bs)
    )
    rgb_b, alpha_b = params["rgb_b"], params["alpha_b"]
    raw = jnp.concatenate(
        [out[:, :3] + rgb_b, out[:, 3:4] + alpha_b], axis=-1
    )
    return raw[:P]
