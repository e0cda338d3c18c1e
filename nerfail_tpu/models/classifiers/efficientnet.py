"""EfficientNet-B0 in flax NHWC (zoo parity with getModel('efficientnet_b0')).

Torch-exact geometry; verified against an executed torch.nn twin in
tests/test_efficientnet_torch_parity.py."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import global_avg_pool, scale_input


def _bn(x, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)


class SqueezeExcite(nn.Module):
    reduced: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(self.reduced, (1, 1))(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1))(s))
        return x * s


class MBConv(nn.Module):
    features: int
    kernel: int
    strides: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feats = x.shape[-1]
        hidden = in_feats * self.expand
        y = x
        if self.expand != 1:
            y = nn.silu(_bn(nn.Conv(hidden, (1, 1), use_bias=False)(y), train))
        p = (self.kernel - 1) // 2
        y = nn.Conv(
            hidden, (self.kernel, self.kernel),
            (self.strides, self.strides), [(p, p), (p, p)],
            feature_group_count=hidden, use_bias=False,
        )(y)
        y = nn.silu(_bn(y, train))
        y = SqueezeExcite(max(1, in_feats // 4))(y)
        y = _bn(nn.Conv(self.features, (1, 1), use_bias=False)(y), train)
        if self.strides == 1 and in_feats == self.features:
            return x + y
        return y


class EfficientNetB0(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        # explicit torch pads throughout (Conv2dNormActivation uses
        # (k-1)//2; XLA SAME misaligns on even extents)
        x = nn.silu(_bn(nn.Conv(32, (3, 3), (2, 2), [(1, 1), (1, 1)],
                                use_bias=False)(x), train))
        # (expand, feats, repeats, stride, kernel)
        cfg = [
            (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3),
        ]
        for t, c, n, s, k in cfg:
            for i in range(n):
                x = MBConv(c, k, s if i == 0 else 1, t)(x, train)
        x = nn.silu(_bn(nn.Conv(1280, (1, 1), use_bias=False)(x), train))
        x = global_avg_pool(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)
