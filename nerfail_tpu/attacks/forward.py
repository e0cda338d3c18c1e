"""The differentiable attack forward: 3D splat → composite → classify.

Re-designs `gauss_net.forward` (model/GaussNet.py:46-159) as a pure
function. Semantics preserved exactly (all in 0-255 pixel space):

  s        = perturbation point set, [M, 4] RGBA (M = p·H·W)
  splat    = Σ_j w_j · s[idx_j]                     (8-NN gaussian gather)
  α        = splat_alpha / 255                      (GaussNet.py:85)
  r        = clip(splat_rgb · α, -ε, +ε)            (ε-clip INSIDE forward,
                                                     GaussNet.py:106-110)
  attacked = clip(where(ori_α>0, ori_rgb + r, 0) ∥ ori_α, 0, 255)
  white    = where(α>0, rgb, 255) for both attacked and clean
  resize   = bilinear to the classifier's input size (differentiable —
             attack grads flow through it)
  logits   = classifier(white_attacked), classifier(white_clean)

plus `universal_2D_net` (GaussNet.py:340-385) for the 2D baselines.

The backward path (classifier grad → resize → composite → scatter-add into
the point set) is the hot op of every attack iteration; the splat gather
carries a custom segment-sum VJP (ops/splat.py).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.ops.splat import splat_gather, splat_gather_batched


def make_classifier_logits_fn(
    model: nn.Module, params, extra
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Eval-mode classifier: [B, S, S, 3] 0-255 floats → [B, C] logits."""

    def logits_fn(x: jnp.ndarray) -> jnp.ndarray:
        out = model.apply({"params": params, **extra}, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    return logits_fn


def white_composite_255(rgb: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """rgb where alpha>0 else 255 (GaussNet.py:127-145)."""
    return jnp.where(alpha > 0, rgb, 255.0)


@lru_cache(maxsize=8)
def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear-resize weights along one axis, as numpy.

    Bilinear resize is a separable linear map, so resizing the identity
    yields its exact matrix (incl. jax.image.resize's antialiased kernel
    when downscaling). Computed eagerly on the CPU backend (eager op
    dispatch to a remote TPU is pathologically slow) and cached as a
    host numpy array so the result is a trace-safe constant — a cached
    jnp array built during a trace would leak the tracer.
    """
    cpu = jax.devices("cpu")[0]
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        eye = jnp.eye(n_in, dtype=jnp.float32)
        w = jax.image.resize(eye, (n_out, n_in), method="bilinear")
    return np.asarray(w)


def _resize_axis(x: jnp.ndarray, n_out: int, axis: int) -> jnp.ndarray:
    """Resize one axis of x via a 2D matmul with the bilinear matrix."""
    A = jnp.asarray(_resize_weights(x.shape[axis], n_out))
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    y = jax.lax.dot_general(
        x.reshape(-1, x.shape[-1]), A,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(y.reshape(*lead, n_out), -1, axis)


def resize_batch(x: jnp.ndarray, size: Optional[int]) -> jnp.ndarray:
    """Differentiable bilinear resize of [B, H, W, C] to [B, size, size, C].

    Runs as two flat 2D matmuls (W then H axis) instead of
    jax.image.resize's gather path — the gather and its transposed
    scatter were ~100× slower than the MXU contraction on TPU for the
    attack's 800→299 case (and a 4D einsum formulation compiled to
    pathological layouts); the matrices reproduce jax.image.resize's
    bilinear numerics exactly (linear map of the identity)."""
    if size is None or x.shape[1] == size:
        return x
    y = _resize_axis(x, size, axis=2)
    return _resize_axis(y, size, axis=1)


def splat_attack_forward(
    point_rgba: jnp.ndarray,     # [M, 4] point set (0-255), or [B, M, 4]
    weights: jnp.ndarray,        # [B, H, W, 8]
    idx: jnp.ndarray,            # [B, H, W, 8] int32 into point set
    ori_img: jnp.ndarray,        # [B, H, W, 4] clean RGBA (0-255)
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    eps: Optional[float] = None,
    resize_to: Optional[int] = 299,
    plan=None,                   # ScatterPlan for the splat backward
    mesh=None,                   # shard the view axis + planned backward
) -> Dict[str, jnp.ndarray]:
    """Returns dict(splat, attacked_rgba, logits, ori_logits, eps_stats).

    A 3D `point_rgba` [B, M, 4] means each view carries its own perturbed
    copy of the point set (the batched-DeepFool inner state); `plan` must
    then come from build_batched_scatter_plan."""
    if point_rgba.ndim == 3:
        splat = splat_gather_batched(
            point_rgba, idx, weights, plan=plan, mesh=mesh
        )
    else:
        splat = splat_gather(
            point_rgba, idx, weights, plan=plan, mesh=mesh
        )                                                      # [B,H,W,4]
    out = composite_after_splat(splat, ori_img, eps=eps)
    cla_ori = white_composite_255(ori_img[..., :3], ori_img[..., 3:4])
    out["splat"] = splat
    out["logits"] = logits_fn(resize_batch(out.pop("cla_x"), resize_to))
    out["ori_logits"] = logits_fn(resize_batch(cla_ori, resize_to))
    return out


def composite_after_splat(
    splat: jnp.ndarray,          # [B, H, W, 4] splatted perturbation
    ori_img: jnp.ndarray,        # [B, H, W, 4] clean RGBA (0-255)
    eps: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Everything between the splat output and the classifier input
    (GaussNet.py:85-154) — split out so the batched-DeepFool jacobian can
    pull back through this head alone (ops/splat.splat_logits_and_jacobian)
    and run ONE multi-channel planned segment-sum for all classes."""
    alpha = splat[..., 3:4] / 255.0
    ori_alpha = ori_img[..., 3:4]

    r = splat[..., :3] * alpha
    # effective 3D perturbation range diagnostic (GaussNet.py:89-103)
    r_masked = jnp.where(alpha > 0, r, 0.0)
    eps_stats = (jnp.min(r_masked), jnp.max(r_masked))
    if eps is not None:
        r = jnp.clip(r, -eps, eps)

    x_rgb = ori_img[..., :3] + r
    x_rgb = jnp.where(ori_alpha > 0, x_rgb, 0.0)
    x_rgba = jnp.clip(
        jnp.concatenate([x_rgb, ori_alpha], axis=-1), 0.0, 255.0
    )
    return {
        "attacked_rgba": x_rgba,
        "cla_x": white_composite_255(x_rgba[..., :3], ori_alpha),
        "eps_min": eps_stats[0],
        "eps_max": eps_stats[1],
    }


def universal_2d_forward(
    delta: jnp.ndarray,          # [H, W, 3] or [B, H, W, 3] (0-255 space)
    ori_img: jnp.ndarray,        # [B, H, W, 4] clean RGBA (0-255)
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    resize_to: Optional[int] = 299,
) -> Dict[str, jnp.ndarray]:
    """2D baseline forward (universal_2D_net, GaussNet.py:356-385):
    broadcast-add the perturbation, clip, white-composite, classify."""
    ori_alpha = ori_img[..., 3:4]
    if delta.ndim == 3:
        delta = delta[None]
    x_rgb = jnp.clip(ori_img[..., :3] + delta, 0.0, 255.0)
    cla_x = white_composite_255(x_rgb, ori_alpha)
    cla_ori = white_composite_255(ori_img[..., :3], ori_alpha)
    logits = logits_fn(resize_batch(cla_x, resize_to))
    ori_logits = logits_fn(resize_batch(cla_ori, resize_to))
    return {
        "attacked_rgb": cla_x,
        "logits": logits,
        "ori_logits": ori_logits,
    }


def gauss_get_r(
    point_rgba: jnp.ndarray,     # [M, 4] perturbation point set (0-255)
    dist: jnp.ndarray,           # [B, H, W, 8] raw 8-NN distances
    idx: jnp.ndarray,            # [B, H, W, 8]
    c: float = 0.02,
    eps_reg: float = 0.001,
) -> jnp.ndarray:
    """Split variant 1 (GaussNet.py:189-268 `gauss_get_r`): convert raw
    distances to gaussian weights inline, then splat → effective per-pixel
    perturbation r [B, H, W, 3] (alpha-modulated)."""
    from nerfail_tpu.pointset.weights import gauss_weights

    w = gauss_weights(dist, c=c, eps=eps_reg)
    splat = splat_gather(point_rgba, idx, w)
    return splat[..., :3] * (splat[..., 3:4] / 255.0)


def gauss_get_img(
    r: jnp.ndarray,              # [B, H, W, 3] effective perturbation
    ori_img: jnp.ndarray,        # [B, H, W, 4] clean RGBA (0-255)
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    eps: Optional[float] = None,
    resize_to: Optional[int] = 299,
) -> Dict[str, jnp.ndarray]:
    """Split variant 2 (GaussNet.py:271-337 `gauss_get_img`): composite a
    precomputed r onto the clean image and classify both."""
    ori_alpha = ori_img[..., 3:4]
    if eps is not None:
        r = jnp.clip(r, -eps, eps)
    x_rgb = jnp.where(ori_alpha > 0, ori_img[..., :3] + r, 0.0)
    x_rgba = jnp.clip(
        jnp.concatenate([x_rgb, ori_alpha], axis=-1), 0.0, 255.0
    )
    cla_x = white_composite_255(x_rgba[..., :3], ori_alpha)
    cla_ori = white_composite_255(ori_img[..., :3], ori_alpha)
    return {
        "attacked_rgba": x_rgba,
        "logits": logits_fn(resize_batch(cla_x, resize_to)),
        "ori_logits": logits_fn(resize_batch(cla_ori, resize_to)),
    }


def zero_init_mask(mask_images: jnp.ndarray) -> jnp.ndarray:
    """Initial perturbation stack: RGB zeroed, alpha kept
    (attack_NeRFail.py:276-282). mask_images: [p, H, W, 4] 0-255."""
    return jnp.concatenate(
        [jnp.zeros_like(mask_images[..., :3]), mask_images[..., 3:4]],
        axis=-1,
    )
