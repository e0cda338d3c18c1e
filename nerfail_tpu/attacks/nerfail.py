"""NeRFail: DeepFool-based universal 3D point-set attack.

Re-designs attack_NeRFail.py (reference :28-523). Structure:

  outer loop (host): epochs over views with the reference's control plane —
    * per view: if attacked prediction still equals the clean prediction,
      run margin-DeepFool through the splat and accumulate its delta into
      the shared point-set tensor (:394-408)
    * m2 ×10 escalation when >50% of recent DeepFool calls hit max_iter
      (:410-418)
    * m1 bisection over [m1_lo, m1_hi] driven by whether any view changed
      the tensor / final-epoch flags (:434-472)
    * best-tensor tracking by attack accuracy (:490-503)

  inner loop (device): one jitted `deepfool` per view — lax.while_loop +
  one jacrev per iteration (attacks/deepfool.py) instead of the
  reference's 14 serialized autograd.grad calls per iteration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import AttackConfig
from nerfail_tpu.attacks.deepfool import deepfool
from nerfail_tpu.attacks.forward import splat_attack_forward
from nerfail_tpu.attacks.nerfail_s import AttackResult


def make_view_logits_fn(
    logits_fn: Callable, cfg: AttackConfig, resize_to: Optional[int]
):
    """(δ [p,H,W,4], w, idx, ori) → [C] attacked logits for one view."""

    def view_logits(delta, weights, idx, ori_img):
        out = splat_attack_forward(
            delta.reshape(-1, 4), weights[None], idx[None], ori_img[None],
            logits_fn, eps=cfg.eps, resize_to=resize_to,
        )
        return out["logits"][0]

    return view_logits


def nerfail_attack(
    delta0: np.ndarray,          # [p, H, W, 4] zero-init mask stack
    weights: np.ndarray,         # [N, H, W, 8]
    idx: np.ndarray,             # [N, H, W, 8]
    ori_imgs: np.ndarray,        # [N, H, W, 4] 0-255
    logits_fn: Callable,
    cfg: AttackConfig,
    resize_to: Optional[int] = 299,
    log_fn: Optional[Callable] = None,
    epochs: Optional[int] = None,
    m2_max_limit: float = 1e6,
    accumulate_incomplete: bool = False,
) -> AttackResult:
    n = ori_imgs.shape[0]
    epochs = epochs if epochs is not None else cfg.attack_epochs
    view_logits = make_view_logits_fn(logits_fn, cfg, resize_to)

    @jax.jit
    def eval_view(delta, w, i, ori):
        out = splat_attack_forward(
            delta.reshape(-1, 4), w[None], i[None], ori[None],
            logits_fn, eps=cfg.eps, resize_to=resize_to,
        )
        return out["logits"][0], out["ori_logits"][0]

    def run_deepfool(delta, w, i, ori, ori_logits, m1, m2):
        fn = lambda d: view_logits(d, w, i, ori)
        return deepfool(
            fn, delta, ori_logits,
            num_classes=int(ori_logits.shape[-1]),
            max_iter=cfg.df_max_iter, m1=float(m1), m2=float(m2),
            overshoot=cfg.overshoot,
            targeted=cfg.targeted, target_label=cfg.target_label,
        )

    delta = jnp.asarray(delta0)
    result = AttackResult(delta=np.asarray(delta0))
    best_m1 = None

    # ---- reference control-plane state (attack_NeRFail.py:45-46,410-472) --
    m1_lo, m1_hi = 0.0, cfg.m1
    m1, m2 = cfg.m1, cfg.m2
    no_attack_after_m2 = attacks_after_m2 = 0
    epoch = 0
    while epoch < epochs:
        t0 = time.time()
        tensor_changed = False
        attacked_correct = clean_correct = still_same = 0
        df_calls = df_iters_total = 0
        for v in range(n):
            w = jnp.asarray(weights[v])
            i = jnp.asarray(idx[v])
            ori = jnp.asarray(ori_imgs[v])
            logits, ori_logits = eval_view(delta, w, i, ori)
            pred = int(jnp.argmax(logits))
            ori_pred = int(jnp.argmax(ori_logits))
            attacked_correct += int(pred == ori_pred)
            if pred != ori_pred:
                continue
            still_same += 1
            res = run_deepfool(delta, w, i, ori, ori_logits, m1, m2)
            iters = int(res.iters)
            df_calls += 1
            df_iters_total += iters
            if iters < cfg.df_max_iter or accumulate_incomplete:
                delta = delta + res.rot
                tensor_changed = True
                attacks_after_m2 += 1
            elif m2 < m2_max_limit:
                no_attack_after_m2 += 1
                attacks_after_m2 += 1
                if (attacks_after_m2 > 10
                        and no_attack_after_m2 / attacks_after_m2 > 0.5):
                    m2 *= 10.0
                    no_attack_after_m2 = attacks_after_m2 = 0

        attack_acc = attacked_correct / n
        entry = {
            "epoch": epoch, "m1": m1, "m2": m2,
            "attack_acc": attack_acc,
            "deepfool_calls": df_calls,
            "mean_df_iters": df_iters_total / max(df_calls, 1),
            "time_s": time.time() - t0,
        }
        result.history.append(entry)
        if log_fn:
            log_fn(epoch, entry)

        # best-tensor tracking (attack_NeRFail.py:490-503)
        if best_m1 is None or (
            attack_acc <= result.best_attack_acc and m1 == best_m1
        ) or (best_m1 is not None and m1 > best_m1 and attack_acc < 1.0):
            result.best_attack_acc = attack_acc
            best_m1 = m1
            result.delta = np.asarray(delta)

        # m1 bisection state machine (attack_NeRFail.py:434-472)
        if not tensor_changed:
            if m1_lo < m1 - 1 and epoch == 0:
                m1_hi = m1
                m1 = int((m1 + m1_lo) / 2)
                m2 = cfg.m2
                epoch = 0
            elif m1_lo < m1 and epoch == 0:
                m1_hi = m1
                m1 = m1_lo
                m2 = cfg.m2
                epoch = 0
            else:
                break
        elif epoch == epochs - 1:
            if m1 < m1_hi - 1:
                m1_lo = m1
                m1 = int((m1 + m1_hi) / 2)
                m2 = cfg.m2
                epoch = 0
            elif m1 < m1_hi:
                m1_lo = m1
                m1 = m1_hi
                m2 = cfg.m2
                epoch = 0
            else:
                epoch += 1
        else:
            epoch += 1

    return result
