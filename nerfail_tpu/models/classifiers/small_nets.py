"""AlexNet and MobileNetV2 (zoo parity with getModel entries)."""

from __future__ import annotations

import flax.linen as nn

from nerfail_tpu.models.classifiers.common import (
    ConvBN,
    global_avg_pool,
    scale_input,
)


class AlexNet(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = nn.relu(nn.Conv(64, (11, 11), (4, 4), "SAME")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding="SAME")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = global_avg_pool(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096)(x))
        return nn.Dense(self.num_classes)(x)


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feats = x.shape[-1]
        hidden = in_feats * self.expand
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, (1, 1))(y, train)
        # depthwise
        y = nn.Conv(
            hidden, (3, 3), (self.strides, self.strides), "SAME",
            feature_group_count=hidden, use_bias=False,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu6(y)
        y = ConvBN(self.features, (1, 1), use_relu=False)(y, train)
        if self.strides == 1 and in_feats == self.features:
            return x + y
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = ConvBN(32, (3, 3), (2, 2))(x, train)
        # (expand, features, repeats, stride)
        cfg = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        for t, c, n, s in cfg:
            for i in range(n):
                x = InvertedResidual(c, s if i == 0 else 1, t)(x, train)
        x = ConvBN(1280, (1, 1))(x, train)
        x = global_avg_pool(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
