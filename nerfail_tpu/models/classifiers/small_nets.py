"""AlexNet and MobileNetV2 (zoo parity with getModel entries)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import (
    ConvBN,
    global_avg_pool,
    scale_input,
)


def adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d((out, out)) on NHWC: output cell i averages
    input rows [floor(i·n/out), ceil((i+1)·n/out)). Expressed as two small
    static matmuls (pooling matrices are compile-time constants), which
    XLA maps onto the MXU — no gather, no dynamic shapes."""
    import numpy as np

    n = x.shape[1]
    m = np.zeros((out, n), np.float32)
    for i in range(out):
        s, e = (i * n) // out, -((-(i + 1) * n) // out)
        m[i, s:e] = 1.0 / (e - s)
    m = jnp.asarray(m)
    x = jnp.einsum("oh,nhwc->nowc", m, x)
    return jnp.einsum("pw,nowc->nopc", m, x)


class AlexNet(nn.Module):
    """torchvision.models.AlexNet topology, exactly (GetModel.py:13-18
    swaps only the final classifier layer): explicit torch pads
    (2/2/1/1/1), floor-mode 3×3/2 max pools, adaptive 6×6 avg pool +
    flatten, and the Dropout→Linear→ReLU classifier ordering. Verified
    against an executed torch twin in tests/test_alexnet_torch_parity.py."""

    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = nn.relu(nn.Conv(64, (11, 11), (4, 4), [(2, 2), (2, 2)])(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)])(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)])(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)])(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)])(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = adaptive_avg_pool(x, 6)
        # torch flattens NCHW → [N, C·6·6]; transpose so the Dense kernel
        # rows line up with torch's Linear columns under the order-zip
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
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
