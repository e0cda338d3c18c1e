"""Attack evaluation harness — the reference `test_for_inception`
(model_test.py:41-421) as a function over arrays.

Given attacked + original images of the target class (plus the other
classes' clean images for overall accuracy), computes:
  - per-class accuracy and loss
  - attack success rate on the target class
  - misclassification histogram
  - perturbation budget stats (e/L2/L0/PSNR)
Every attack engine calls this at the end, like the reference scripts do
(attack_NeRFail.py:517-523 etc.).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from nerfail_tpu.eval.metrics import (
    attack_success_rate,
    misclassification_histogram,
    perturbation_stats,
)


def predict_all(
    logits_fn: Callable, images: np.ndarray, batch_size: int = 16
) -> np.ndarray:
    preds = []
    for s in range(0, images.shape[0], batch_size):
        logits = logits_fn(jnp.asarray(images[s:s + batch_size]))
        preds.append(np.argmax(np.asarray(logits), axis=-1))
    return np.concatenate(preds) if preds else np.zeros((0,), np.int64)


def evaluate_attack(
    logits_fn: Callable,
    attacked_images: np.ndarray,     # [N, S, S, 3] white-composited 0-255
    original_images: np.ndarray,     # [N, S, S, 3]
    true_label: int,
    other_images: Optional[np.ndarray] = None,   # clean imgs, other classes
    other_labels: Optional[np.ndarray] = None,
    num_classes: int = 8,
    batch_size: int = 16,
) -> Dict:
    preds_att = predict_all(logits_fn, attacked_images, batch_size)
    preds_ori = predict_all(logits_fn, original_images, batch_size)

    out: Dict = {
        "asr": attack_success_rate(preds_att, true_label),
        "clean_acc_target_class": float(np.mean(preds_ori == true_label)),
        "attacked_acc_target_class": float(np.mean(preds_att == true_label)),
        "misclass_histogram": misclassification_histogram(
            preds_att, num_classes
        ).tolist(),
        **perturbation_stats(attacked_images, original_images),
    }
    if other_images is not None and other_labels is not None:
        preds_other = predict_all(logits_fn, other_images, batch_size)
        out["other_class_acc"] = float(np.mean(preds_other == other_labels))
    return out
