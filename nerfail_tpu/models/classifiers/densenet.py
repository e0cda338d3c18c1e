"""DenseNet-121 in flax NHWC (zoo parity with getModel('densenet121')).

Torch-exact geometry; verified against an executed torch.nn twin in
tests/test_densenet_torch_parity.py."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import global_avg_pool, scale_input


class DenseLayer(nn.Module):
    growth: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        y = nn.relu(y)
        y = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False)(y)
        return nn.avg_pool(y, (2, 2), (2, 2))


class DenseNet(nn.Module):
    block_sizes: Sequence[int] = (6, 12, 24, 16)   # densenet121
    growth: int = 32
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        # explicit torch pads: XLA SAME picks (0,1)-style asymmetric pads
        # on even extents, silently misaligned with torchvision's
        # Conv2d(7,2,3) / MaxPool2d(3,2,1) geometry
        x = nn.Conv(64, (7, 7), (2, 2), [(3, 3), (3, 3)],
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        for bi, n_layers in enumerate(self.block_sizes):
            for _ in range(n_layers):
                x = DenseLayer(self.growth)(x, train)
            if bi != len(self.block_sizes) - 1:
                x = Transition()(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes)(x)


def DenseNet121(num_classes: int = 8) -> DenseNet:
    return DenseNet(block_sizes=(6, 12, 24, 16), num_classes=num_classes)
