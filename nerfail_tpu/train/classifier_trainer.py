"""Classifier training — the reference model_train.py harness, TPU-style.

Parity points (model_train.py:100-195):
  - 8-class dataset of per-scene renders, RGBA→white-bg RGB, 0-255 floats
  - SGD lr=1e-3 momentum=0.9, cross-entropy; inception aux-logits ×0.4
  - batch 16, 200 epochs; periodic checkpoints + best-val-accuracy save

Design: one jitted step handling both plain-logits and (logits, aux) models,
with flax mutable batch_stats threaded explicitly. Data is fed as
device-resident class-balanced shuffled batches.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfail_tpu.train.checkpoint import save_checkpoint, load_checkpoint


@dataclass
class ClassifierState:
    params: Any
    extra: Dict[str, Any]     # batch_stats etc. (possibly empty)
    opt_state: Any
    step: int = 0


def init_classifier(
    model: nn.Module, key: jax.Array, input_size: Optional[int],
    optimizer: optax.GradientTransformation,
) -> ClassifierState:
    size = input_size or 800
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    # init in train mode so train-only branches (inception aux head) get
    # their params created too
    variables = model.init({"params": key, "dropout": key}, dummy, train=True)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return ClassifierState(
        params=params, extra=extra, opt_state=optimizer.init(params), step=0
    )


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_classifier_train_step(
    model: nn.Module,
    optimizer: optax.GradientTransformation,
    aux_weight: float = 0.4,
) -> Callable:
    """Jitted SGD step; handles (logits, aux) tuples and batch_stats."""

    @jax.jit
    def step(state_params, state_extra, opt_state, x, y, key):
        def loss_fn(p):
            mutable = [k for k in state_extra] or False
            out = model.apply(
                {"params": p, **state_extra}, x, train=True,
                mutable=mutable, rngs={"dropout": key},
            )
            if mutable:
                out, new_extra = out
            else:
                new_extra = state_extra
            if isinstance(out, tuple):
                logits, aux = out
                loss = cross_entropy(logits, y) + aux_weight * cross_entropy(aux, y)
            else:
                logits = out
                loss = cross_entropy(logits, y)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, (new_extra, acc)

        (loss, (new_extra, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state_params)
        updates, opt_state = optimizer.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        return params, dict(new_extra), opt_state, {"loss": loss, "acc": acc}

    return step


def make_classifier_eval_fn(model: nn.Module) -> Callable:
    @jax.jit
    def eval_fn(params, extra, x):
        return model.apply({"params": params, **extra}, x, train=False)

    return eval_fn


def train_classifier(
    model: nn.Module,
    images: np.ndarray,           # [N, S, S, 3] 0-255 floats (already resized)
    labels: np.ndarray,           # [N] int
    val_images: np.ndarray,
    val_labels: np.ndarray,
    epochs: int = 200,
    batch_size: int = 16,
    lr: float = 1e-3,
    momentum: float = 0.9,
    seed: int = 0,
    logdir: Optional[str] = None,
    log_fn: Optional[Callable] = None,
    aux_weight: float = 0.4,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> ClassifierState:
    """`optimizer` overrides the reference-parity SGD(momentum=.9)
    (model_train.py:148-152) — e.g. optax.adam for quickly-converging
    demo/test classifiers."""
    if optimizer is None:
        optimizer = optax.sgd(lr, momentum=momentum)
    key = jax.random.PRNGKey(seed)
    state = init_classifier(model, key, images.shape[1], optimizer)
    step_fn = make_classifier_train_step(model, optimizer, aux_weight)
    eval_fn = make_classifier_eval_fn(model)

    n = images.shape[0]
    n_batches = n // batch_size
    images_d = jnp.asarray(images)
    labels_d = jnp.asarray(labels)
    params, extra, opt_state = state.params, state.extra, state.opt_state
    best_acc, step = -1.0, 0

    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        perm = rng.permutation(n)[: n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size)
        tr_loss = tr_acc = 0.0
        for b in range(n_batches):
            bidx = jnp.asarray(perm[b])
            params, extra, opt_state, m = step_fn(
                params, extra, opt_state,
                images_d[bidx], labels_d[bidx],
                jax.random.fold_in(key, step),
            )
            tr_loss += float(m["loss"]); tr_acc += float(m["acc"]); step += 1

        val_acc = evaluate_accuracy(
            eval_fn, params, extra, val_images, val_labels, batch_size
        )
        if log_fn:
            log_fn(epoch, {
                "loss": tr_loss / max(n_batches, 1),
                "acc": tr_acc / max(n_batches, 1),
                "val_acc": val_acc,
            })
        if logdir and val_acc > best_acc:
            best_acc = val_acc
            save_checkpoint(
                os.path.join(logdir, "best.ckpt"),
                {"params": params, "extra": extra},
            )
        if logdir and (epoch + 1) % 50 == 0:
            save_checkpoint(
                os.path.join(logdir, f"epoch_{epoch+1:04d}.ckpt"),
                {"params": params, "extra": extra},
            )

    return ClassifierState(params, dict(extra), opt_state, step)


def evaluate_accuracy(
    eval_fn, params, extra, images: np.ndarray, labels: np.ndarray,
    batch_size: int = 16,
) -> float:
    correct = 0
    n = images.shape[0]
    for s in range(0, n, batch_size):
        x = jnp.asarray(images[s:s + batch_size])
        logits = eval_fn(params, extra, x)
        if isinstance(logits, tuple):
            logits = logits[0]
        correct += int(np.sum(np.argmax(np.asarray(logits), -1) == labels[s:s + batch_size]))
    return correct / max(n, 1)


def load_classifier(path: str, model: nn.Module, input_size: Optional[int]):
    """Restore a best.ckpt into (params, extra)."""
    dummy_opt = optax.sgd(1e-3)
    key = jax.random.PRNGKey(0)
    state = init_classifier(model, key, input_size, dummy_opt)
    restored = load_checkpoint(
        path, {"params": state.params, "extra": state.extra}
    )
    return restored["params"], restored["extra"]
