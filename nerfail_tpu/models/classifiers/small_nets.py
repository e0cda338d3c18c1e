"""AlexNet and MobileNetV2 (zoo parity with getModel entries)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import (
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


class _ConvBNReLU6(nn.Module):
    """torchvision ConvBNReLU: Conv(no bias, explicit pad) → BN(eps 1e-5)
    → ReLU6. XLA SAME pads misalign with torch pad-1 on even extents (the
    resnet50 finding), so pads are explicit here."""

    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    use_relu6: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            (self.strides, self.strides), [(p, p), (p, p)],
            feature_group_count=self.groups, use_bias=False,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x)
        return nn.relu6(x) if self.use_relu6 else x


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
            y = _ConvBNReLU6(hidden, 1)(y, train)
        y = _ConvBNReLU6(hidden, 3, self.strides, groups=hidden)(y, train)
        y = _ConvBNReLU6(self.features, 1, use_relu6=False)(y, train)
        if self.strides == 1 and in_feats == self.features:
            return x + y
        return y


class MobileNetV2(nn.Module):
    """torchvision.models.MobileNetV2 topology, exactly (width_mult 1):
    ReLU6 activations, BN eps 1e-5, explicit torch pads, mean-pool +
    Dropout(0.2) head. Verified against an executed torch twin in
    tests/test_mobilenet_torch_parity.py."""

    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = _ConvBNReLU6(32, 3, 2)(x, train)
        # (expand, features, repeats, stride) — torchvision
        # inverted_residual_setting at width_mult 1
        cfg = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        for t, c, n, s in cfg:
            for i in range(n):
                x = InvertedResidual(c, s if i == 0 else 1, t)(x, train)
        x = _ConvBNReLU6(1280, 1)(x, train)
        x = global_avg_pool(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
