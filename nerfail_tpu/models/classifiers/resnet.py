"""ResNet-50 (torchvision-equivalent topology) in flax NHWC.

Zoo parity: the reference's getModel('resnet50') (model/GetModel.py:13-51)
builds torchvision resnet50 with num_classes=8 and feeds 299² inputs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from nerfail_tpu.models.classifiers.common import ConvBN, scale_input, global_avg_pool


class Bottleneck(nn.Module):
    features: int
    strides: tuple = (1, 1)
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, (1, 1))(x, train)
        y = ConvBN(self.features, (3, 3), self.strides)(y, train)
        y = ConvBN(self.features * 4, (1, 1), use_relu=False)(y, train)
        if self.project:
            residual = ConvBN(
                self.features * 4, (1, 1), self.strides, use_relu=False
            )(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # resnet50
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = ConvBN(64, (7, 7), (2, 2))(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = 64 * 2 ** stage
            for block in range(n_blocks):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                x = Bottleneck(
                    feats, strides, project=(block == 0)
                )(x, train)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes)(x)


def ResNet50(num_classes: int = 8) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes)
