"""UAP-2D baseline: DeepFool-driven universal 2D perturbation.

Re-designs attack_UAP_2D.py (reference :219-374): one shared [H, W, 3]
perturbation over all views; per epoch, for each still-correct view run
DeepFool (2D forward) and accumulate + L∞-project the delta
(`project_perturbation`, :224-229,319).

Unlike the reference's strictly per-view python loop (one host-synced
DeepFool per image), views are processed in `cfg.view_batch`-sized groups
through `deepfool_batch` — the same batched while_loop engine as NeRFail —
so the classifier forward/backward runs at batch width and the host syncs
once per group. view_batch=1 reproduces the reference's sequential
accumulation order exactly.
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
from nerfail_tpu.attacks.deepfool import deepfool_batch
from nerfail_tpu.attacks.forward import universal_2d_forward
from nerfail_tpu.attacks.nerfail import _nerfail_batch_ids
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
    view_batch = max(cfg.view_batch, 1)
    delta = jnp.zeros((H, W, 3), jnp.float32)
    result = AttackResult(delta=np.asarray(delta))
    fp = {"n_views": n, "view_shape": list(ori_imgs.shape[1:]),
          "eps": cfg.eps, "targeted": cfg.targeted, "epochs": epochs,
          "engine": "uap2d"}

    start_epoch = 0
    if checkpoint_path:
        state = load_attack_state(checkpoint_path, fingerprint=fp)
        if state is not None:
            arrays, meta = state
            delta = jnp.asarray(arrays["delta"])
            result.delta = arrays["best_delta"]
            result.best_attack_acc = meta["best_attack_acc"]
            result.history = meta["history"]
            start_epoch = meta["epoch"] + 1

    num_classes = None

    @jax.jit
    def eval_batch(d, ori):
        out = universal_2d_forward(d, ori, logits_fn, resize_to)
        return out["logits"], out["ori_logits"]

    @jax.jit
    def df_group(d, ori, ori_logits, active, m1, m2):
        def logits_fn_b(delta_b):
            out = universal_2d_forward(
                delta_b, ori, logits_fn, resize_to
            )
            return out["logits"]

        res = deepfool_batch(
            logits_fn_b, d, ori_logits, num_classes=num_classes,
            max_iter=cfg.df_max_iter, m1=m1, m2=m2,
            overshoot=cfg.overshoot, targeted=cfg.targeted,
            target_label=cfg.target_label, preserve_alpha=False,
        )
        complete = res.iters < cfg.df_max_iter
        use = active & complete
        rot_sum = jnp.einsum(
            "v,v...->...", use.astype(d.dtype), res.rot
        )
        return rot_sum, use

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        attacked_correct = 0
        for s in range(0, n, view_batch):
            ids, valid = _nerfail_batch_ids(s, n, view_batch)
            ori = jnp.asarray(ori_imgs[ids], jnp.float32)
            logits, ori_logits = eval_batch(delta, ori)
            preds = np.argmax(np.asarray(logits), -1)
            ori_preds = np.argmax(np.asarray(ori_logits), -1)
            same = (preds == ori_preds) & valid
            attacked_correct += int(same.sum())
            if not same.any():
                continue
            if num_classes is None:
                num_classes = int(logits.shape[-1])
            rot_sum, used = df_group(
                delta, ori, ori_logits, jnp.asarray(same), cfg.m1, cfg.m2
            )
            if int(np.asarray(used).sum()):
                delta = project_perturbation(
                    cfg.eps, np.inf, delta + rot_sum
                )

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
                fingerprint=fp,
            )
    clear_attack_state(checkpoint_path)
    return result
