"""UAP-2D baseline: DeepFool-driven universal 2D perturbation.

Re-designs attack_UAP_2D.py (reference :219-374): one shared [H, W, 3]
perturbation over all views; per epoch, for each still-correct view run
DeepFool (2D forward) and accumulate + L∞-project the delta
(`project_perturbation`, :224-229,319).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import AttackConfig
from nerfail_tpu.attacks.checkpoint import (
    clear_attack_state, load_attack_state, save_attack_state,
)
from nerfail_tpu.attacks.deepfool import deepfool
from nerfail_tpu.attacks.forward import universal_2d_forward
from nerfail_tpu.attacks.nerfail_s import AttackResult


def project_perturbation(eps: float, p, delta: jnp.ndarray) -> jnp.ndarray:
    """L∞ clamp or L2 rescale (attack_UAP_2D.py:224-229)."""
    if p == 2:
        norm = jnp.linalg.norm(delta.reshape(-1))
        return delta * jnp.minimum(1.0, eps / jnp.maximum(norm, 1e-12))
    return jnp.clip(delta, -eps, eps)


def uap_2d_attack(
    ori_imgs: np.ndarray,        # [N, H, W, 4] 0-255
    logits_fn: Callable,
    cfg: AttackConfig,
    resize_to: Optional[int] = 299,
    log_fn: Optional[Callable] = None,
    epochs: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
) -> AttackResult:
    n, H, W = ori_imgs.shape[:3]
    epochs = epochs if epochs is not None else cfg.attack_epochs
    delta = jnp.zeros((H, W, 3), jnp.float32)
    result = AttackResult(delta=np.asarray(delta))

    start_epoch = 0
    if checkpoint_path:
        state = load_attack_state(checkpoint_path)
        if state is not None:
            arrays, meta = state
            delta = jnp.asarray(arrays["delta"])
            result.delta = arrays["best_delta"]
            result.best_attack_acc = meta["best_attack_acc"]
            result.history = meta["history"]
            start_epoch = meta["epoch"] + 1

    def view_logits(d, ori):
        out = universal_2d_forward(d, ori[None], logits_fn, resize_to)
        return out["logits"][0]

    @jax.jit
    def eval_view(d, ori):
        out = universal_2d_forward(d, ori[None], logits_fn, resize_to)
        return out["logits"][0], out["ori_logits"][0]

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        attacked_correct = 0
        for v in range(n):
            ori = jnp.asarray(ori_imgs[v])
            logits, ori_logits = eval_view(delta, ori)
            pred = int(jnp.argmax(logits))
            ori_pred = int(jnp.argmax(ori_logits))
            attacked_correct += int(pred == ori_pred)
            if pred != ori_pred:
                continue
            res = deepfool(
                lambda d: view_logits(d, ori), delta, ori_logits,
                num_classes=int(ori_logits.shape[-1]),
                max_iter=cfg.df_max_iter, m1=cfg.m1, m2=cfg.m2,
                overshoot=cfg.overshoot, targeted=cfg.targeted,
                target_label=cfg.target_label, preserve_alpha=False,
            )
            if int(res.iters) < cfg.df_max_iter:
                delta = project_perturbation(cfg.eps, np.inf, delta + res.rot)

        entry = {
            "epoch": epoch,
            "attack_acc": attacked_correct / n,
            "time_s": time.time() - t0,
        }
        result.history.append(entry)
        if log_fn:
            log_fn(epoch, entry)
        if entry["attack_acc"] < result.best_attack_acc:
            result.best_attack_acc = entry["attack_acc"]
            result.delta = np.asarray(delta)
        if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
            save_attack_state(
                checkpoint_path,
                {"delta": np.asarray(delta), "best_delta": result.delta},
                {"epoch": epoch,
                 "best_attack_acc": result.best_attack_acc,
                 "history": result.history},
            )
    clear_attack_state(checkpoint_path)
    return result
