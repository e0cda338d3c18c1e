"""VGG-16 in flax NHWC (zoo parity with getModel('vgg16'))."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from nerfail_tpu.models.classifiers.common import scale_input, global_avg_pool

VGG16_CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                       512, 512, 512, "M", 512, 512, 512, "M")


class VGG16(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.relu(nn.Conv(int(v), (3, 3), padding="SAME")(x))
        x = global_avg_pool(x)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
