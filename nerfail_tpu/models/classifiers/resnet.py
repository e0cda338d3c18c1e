"""ResNet-50 (torchvision-equivalent topology) in flax NHWC.

Zoo parity: the reference's getModel('resnet50') (model/GetModel.py:13-51)
builds torchvision resnet50 with num_classes=8 and feeds 299² inputs.

Numerics match torchvision op-for-op (validated by the numpy oracle in
tests/test_resnet_oracle.py): EXPLICIT torch pads — 3 for the 7×7 stem,
1 for every 3×3, -inf-padded 3×3/2 max pool with pad 1 — instead of
XLA "SAME" (identical on odd extents but misaligned on even ones, e.g.
the 38→19 stride-2 convs of a 299² pipeline), and BatchNorm eps 1e-5
(torch BatchNorm2d default; the inception family uses 1e-3).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from nerfail_tpu.models.classifiers.common import scale_input, global_avg_pool


class RConvBN(nn.Module):
    """Conv(bias=False, torch pads) + BatchNorm(eps 1e-5) [+ ReLU]."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = ((self.kernel[0] - 1) // 2, (self.kernel[1] - 1) // 2)
        x = nn.Conv(
            self.features, self.kernel, self.strides,
            padding=((p[0], p[0]), (p[1], p[1])), use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    features: int
    strides: tuple = (1, 1)
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = RConvBN(self.features, (1, 1))(x, train)
        y = RConvBN(self.features, (3, 3), self.strides)(y, train)
        y = RConvBN(self.features * 4, (1, 1), use_relu=False)(y, train)
        if self.project:
            residual = RConvBN(
                self.features * 4, (1, 1), self.strides, use_relu=False
            )(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # resnet50
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = RConvBN(64, (7, 7), (2, 2))(x, train)
        # torch MaxPool2d(3, 2, padding=1): -inf pad keeps semantics exact
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
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
