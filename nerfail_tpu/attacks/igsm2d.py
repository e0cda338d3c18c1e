"""IGSM-2D baseline: per-view 2D sign-step perturbations.

Re-designs attack_IGSM_2D.py (reference :250-432): a perturbation bank
[N, H, W, 3], one slice per view; each batch does CE backward, sign step,
ε-ball clamp, write-back. Here the bank slices for a batch update in one
jitted program; the bank lives on host (it can exceed HBM at 400×800²).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfail_tpu.config import AttackConfig
from nerfail_tpu.attacks.checkpoint import (
    clear_attack_state, load_attack_state, save_attack_state,
)
from nerfail_tpu.attacks.forward import universal_2d_forward
from nerfail_tpu.attacks.nerfail_s import AttackResult


def make_igsm2d_step(
    logits_fn: Callable, cfg: AttackConfig, resize_to: Optional[int]
) -> Callable:
    @jax.jit
    def step(delta_b, ori_img, labels):
        def loss_fn(d):
            out = universal_2d_forward(d, ori_img, logits_fn, resize_to)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                out["logits"], labels
            ).mean()
            mse = jnp.mean((out["attacked_rgb"] - ori_img[..., :3]) ** 2)
            return (1.0 - cfg.beta) * ce + cfg.beta * mse, out

        (loss, out), grad = jax.value_and_grad(loss_fn, has_aux=True)(delta_b)
        direction = -1.0 if cfg.targeted else 1.0
        new_delta = delta_b + direction * cfg.a * jnp.sign(grad)
        new_delta = jnp.clip(new_delta, -cfg.eps, cfg.eps)
        preds = jnp.argmax(out["logits"], axis=-1)
        ori_preds = jnp.argmax(out["ori_logits"], axis=-1)
        return new_delta, {
            "loss": loss,
            "attacked_correct": jnp.sum(preds == labels),
            "clean_correct": jnp.sum(ori_preds == labels),
        }

    return step


def igsm_2d_attack(
    ori_imgs: np.ndarray,        # [N, H, W, 4] 0-255
    labels: np.ndarray,
    logits_fn: Callable,
    cfg: AttackConfig,
    resize_to: Optional[int] = 299,
    log_fn: Optional[Callable] = None,
    epochs: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
) -> AttackResult:
    """Per-view bank engine. `checkpoint_every` defaults to 10 (not 1):
    each save rewrites the full [N, H, W, 3] bank ×2 (≈6 GB at 400×800²),
    so per-epoch saves would dominate a 100-epoch run's wall-clock; the
    best bank is additionally written only on epochs where it improved."""
    n, H, W = ori_imgs.shape[:3]
    bank = np.zeros((n, H, W, 3), np.float32)
    step_fn = make_igsm2d_step(logits_fn, cfg, resize_to)
    bs = cfg.batch_size
    epochs = epochs if epochs is not None else cfg.attack_epochs
    # best init = snapshot of the initial bank (the reference clones it,
    # attack_IGSM_2D.py:253); a live alias would mutate with the bank
    result = AttackResult(delta=bank.copy())
    fp = {"n_views": n, "view_shape": list(ori_imgs.shape[1:]),
          "eps": cfg.eps, "a": cfg.a, "targeted": cfg.targeted,
          "epochs": epochs, "engine": "igsm2d"}

    start_epoch = 0
    best_path = checkpoint_path + ".best.npz" if checkpoint_path else None
    if checkpoint_path:
        state = load_attack_state(checkpoint_path, fingerprint=fp)
        if state is not None:
            arrays, meta = state
            bank = arrays["bank"]
            best = load_attack_state(best_path, fingerprint=fp)
            result.delta = (best[0]["best_bank"] if best is not None
                            else bank.copy())
            result.best_attack_acc = meta["best_attack_acc"]
            result.history = meta["history"]
            start_epoch = meta["epoch"] + 1

    best_dirty = start_epoch == 0     # first save must seed the best file
    for epoch in range(start_epoch, epochs):
        attacked_correct = clean_correct = 0
        t0 = time.time()
        for s in range(0, n, bs):
            b = slice(s, min(s + bs, n))
            new_delta, m = step_fn(
                jnp.asarray(bank[b]), jnp.asarray(ori_imgs[b]),
                jnp.asarray(labels[b]),
            )
            bank[b] = np.asarray(new_delta)
            attacked_correct += int(m["attacked_correct"])
            clean_correct += int(m["clean_correct"])
        entry = {
            "epoch": epoch,
            "attack_acc": attacked_correct / n,
            "clean_acc": clean_correct / n,
            "time_s": time.time() - t0,
        }
        result.history.append(entry)
        if log_fn:
            log_fn(epoch, entry)
        if entry["attack_acc"] < result.best_attack_acc:
            result.best_attack_acc = entry["attack_acc"]
            result.delta = bank.copy()
            best_dirty = True
        if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
            # the best bank lives in its own file, rewritten only when it
            # actually improved since the last save — the live bank alone
            # is ~3 GB at 400×800² and already dominates the save
            if best_dirty:
                save_attack_state(
                    best_path, {"best_bank": result.delta}, {},
                    fingerprint=fp,
                )
                best_dirty = False
            save_attack_state(
                checkpoint_path, {"bank": bank},
                {"epoch": epoch,
                 "best_attack_acc": result.best_attack_acc,
                 "history": result.history},
                fingerprint=fp,
            )
    clear_attack_state(checkpoint_path)
    clear_attack_state(best_path)
    return result
