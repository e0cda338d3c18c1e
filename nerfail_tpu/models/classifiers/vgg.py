"""VGG-16 in flax NHWC (zoo parity with getModel('vgg16')).

Torch-exact; verified against an executed torch.nn twin in
tests/test_vgg_torch_parity.py."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from nerfail_tpu.models.classifiers.common import scale_input
from nerfail_tpu.models.classifiers.small_nets import adaptive_avg_pool

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
        # torchvision head: adaptive 7x7 avg pool + NCHW flatten +
        # Linear/ReLU/Dropout stack (was a global-avg-pool redesign —
        # now torch-exact, see tests/test_vgg_torch_parity.py)
        x = adaptive_avg_pool(x, 7)
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
