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

import os
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import SCENE_CLASSES
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


def logits_all(
    logits_fn: Callable, images: np.ndarray, batch_size: int = 16
) -> np.ndarray:
    out = []
    for s in range(0, images.shape[0], batch_size):
        out.append(np.asarray(logits_fn(jnp.asarray(images[s:s + batch_size]))))
    return (
        np.concatenate(out) if out else np.zeros((0, 0), np.float32)
    )


def _ce_loss(logits: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-sample softmax cross-entropy (the reference's criterion)."""
    m = logits.max(axis=-1, keepdims=True)
    lse = m[..., 0] + np.log(np.exp(logits - m).sum(axis=-1))
    return lse - logits[np.arange(len(labels)), labels]


def annotate_predictions(
    images: np.ndarray,          # [N, S, S, 3] 0-255 (originals to annotate)
    logits: np.ndarray,          # [N, C]
    out_dir: str,
    indices: Optional[np.ndarray] = None,
    class_names: Sequence[str] = SCENE_CLASSES,
) -> None:
    """Write r_<i>.png with the predicted class + softmax confidence drawn
    on (model_test.py:310-319 annotated-image dump)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    colors = [
        (230, 60, 60), (60, 180, 60), (60, 60, 230), (200, 180, 40),
        (180, 60, 200), (40, 190, 190), (130, 130, 130), (250, 140, 20),
    ]
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    n = images.shape[0]
    idxs = indices if indices is not None else np.arange(n)
    for j in range(n):
        pred = int(np.argmax(logits[j]))
        text = f"{class_names[pred]}: {100.0 * probs[j, pred]:.2f}%"
        img = np.ascontiguousarray(
            np.clip(images[j], 0, 255).astype(np.uint8)
        )
        cv2.putText(
            img, text, (img.shape[1] // 8, img.shape[0] // 8),
            fontFace=cv2.FONT_HERSHEY_TRIPLEX, fontScale=max(
                img.shape[0] / 800.0, 0.3
            ),
            color=colors[pred % len(colors)], thickness=1,
        )
        import imageio.v2 as imageio

        imageio.imwrite(os.path.join(out_dir, f"r_{int(idxs[j])}.png"), img)


def evaluate_testset(
    logits_fn: Callable,
    images: np.ndarray,          # [N, S, S, 3] 0-255, ALL classes' test imgs
    labels: np.ndarray,          # [N] true class per image
    attacked_class: Optional[int] = None,
    original_images: Optional[np.ndarray] = None,  # originals for the
                                                   # attacked-class rows
    num_classes: int = 8,
    batch_size: int = 16,
    annotate_dir: Optional[str] = None,
    annotate_images: Optional[np.ndarray] = None,
    indices: Optional[np.ndarray] = None,
) -> Dict:
    """The reference's full `test_for_inception` report (model_test.py:41-421):
    overall + per-class loss/acc over all classes, and — for the attacked
    class — ASR, the misclassification "to" table, and perturbation stats
    vs the originals. Optional annotated-image dump."""
    logits = logits_all(logits_fn, images, batch_size)
    preds = np.argmax(logits, axis=-1)
    losses = _ce_loss(logits, labels)

    per_class = {}
    for c in range(num_classes):
        m = labels == c
        if not m.any():
            continue
        per_class[str(c)] = {
            "loss": float(losses[m].mean()),
            "acc": float((preds[m] == c).mean()),
            "n": int(m.sum()),
        }

    out: Dict = {
        "overall_loss": float(losses.mean()) if len(losses) else 0.0,
        "overall_acc": float((preds == labels).mean()) if len(preds) else 0.0,
        "per_class": per_class,
    }

    if attacked_class is not None:
        m = labels == attacked_class
        preds_att = preds[m]
        out["asr"] = attack_success_rate(preds_att, attacked_class)
        out["misclass_histogram"] = misclassification_histogram(
            preds_att, num_classes
        ).tolist()
        # "ground truth X, now Y — Z%" table (model_test.py:375-378)
        n_att = max(len(preds_att), 1)
        out["misclass_to_pct"] = {
            str(k): 100.0 * float((preds_att == k).sum()) / n_att
            for k in np.unique(preds_att)
        }
        if original_images is not None:
            out.update(
                perturbation_stats(images[m], original_images)
            )
        if annotate_dir is not None:
            ann = annotate_images if annotate_images is not None else images[m]
            ann_idx = indices[m] if indices is not None else None
            annotate_predictions(
                ann, logits[m], annotate_dir, indices=ann_idx
            )
    return out


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
