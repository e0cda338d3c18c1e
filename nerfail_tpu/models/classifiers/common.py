"""Shared pieces for the classifier zoo.

Contract (matches the reference harness): models take NHWC float images in
**0-255 scale** (MyDataset.py:94 feeds raw cv2 floats; gauss_net never
normalizes) and return logits [B, num_classes]. Each model internally maps
0-255 → [-1, 1] as its first op so optimization is sane; gradients still
flow to the 0-255 input, preserving the attack semantics.

All models are flax.linen NHWC — the TPU-native layout (channels-last maps
convolutions directly onto the MXU without transposes).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


def scale_input(x: jnp.ndarray) -> jnp.ndarray:
    """0-255 float → [-1, 1]."""
    return x / 127.5 - 1.0


class ConvBN(nn.Module):
    """Conv + BatchNorm + ReLU, the standard inception/resnet brick."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, self.strides, self.padding,
            use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def max_pool(x, window=(3, 3), strides=(2, 2), padding="VALID"):
    return nn.max_pool(x, window, strides, padding)


def avg_pool(x, window=(3, 3), strides=(1, 1), padding="SAME"):
    return nn.avg_pool(x, window, strides, padding)


def avg_pool_nopad(x, window=(3, 3), strides=(1, 1)):
    """SAME avg-pool that divides by the number of REAL elements in each
    window (torch's count_include_pad=False) — flax's nn.avg_pool divides
    by the full window size, which differs at the borders. The inception
    family uses the torch semantics (IncResv2.py Mixed_5b branch3)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
    summed = nn.pool(x, 0.0, jnp.add, window, strides, "SAME")
    count = nn.pool(ones, 0.0, jnp.add, window, strides, "SAME")
    return summed / count


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))
