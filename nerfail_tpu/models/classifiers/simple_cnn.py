"""SimpleCNN — the `my_model` entry of the zoo.

Capability-parity with the reference MyCNN (model/MyModel.py:5-53): a
7-stage conv(3×3)+ReLU+maxpool(2) pyramid 32→64→128→256→256→128→64 over the
raw 800² render, followed by two fully-connected layers. We use a global
average pool before the head instead of a hard-coded flatten so the model
accepts any input resolution (the reference is pinned to 800²).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import scale_input, global_avg_pool


class SimpleCNN(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        for feats in (32, 64, 128, 256, 256, 128, 64):
            x = nn.Conv(feats, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            if min(x.shape[1], x.shape[2]) >= 2:  # guard small test inputs
                x = nn.max_pool(x, (2, 2), (2, 2))
        x = global_avg_pool(x)
        x = nn.relu(nn.Dense(512)(x))
        return nn.Dense(self.num_classes)(x)


class MyCNN(nn.Module):
    """Exact twin of the reference MyCNN (model/MyModel.py:5-53).

    Unlike SimpleCNN above, this keeps every reference quirk so imported
    torch weights reproduce the logits bit-for-bit-ish: VALID (padding=0)
    convs, floor-dividing 2×2 max pools, raw 0-255 input with no scaling,
    and a hard flatten whose 1024 features pin the input to 800² (the
    resolution the 2D baselines feed it). The flatten runs in torch's
    (c, h, w) order so fc1's kernel imports through the generic order-zip
    (torch_import) without a row permutation.
    """

    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats in (32, 64, 128, 256, 256, 128, 64):
            x = nn.Conv(feats, (3, 3), padding="VALID")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), (2, 2))
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)  # NCHW flatten
        x = nn.relu(nn.Dense(512)(x))
        return nn.Dense(self.num_classes)(x)
