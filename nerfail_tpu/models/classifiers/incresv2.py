"""Inception-ResNet-V2 in flax NHWC.

Zoo parity with the reference's vendored Cadene implementation
(model/IncResv2.py:34-380): stem → Mixed_5b → 10×Block35(scale .17) →
Mixed_6a → 20×Block17(scale .10) → Mixed_7a → 9×Block8(scale .20) →
Block8(no relu) → conv 1536 → GAP → FC. 299² input.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import (
    ConvBN,
    avg_pool_nopad,
    global_avg_pool,
    scale_input,
)


class Mixed5b(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(96, (1, 1))(x, train)
        b1 = ConvBN(48, (1, 1))(x, train)
        b1 = ConvBN(64, (5, 5))(b1, train)
        b2 = ConvBN(64, (1, 1))(x, train)
        b2 = ConvBN(96, (3, 3))(b2, train)
        b2 = ConvBN(96, (3, 3))(b2, train)
        # torch count_include_pad=False semantics (IncResv2.py branch3)
        b3 = avg_pool_nopad(x, (3, 3), (1, 1))
        b3 = ConvBN(64, (1, 1))(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 320


class Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(32, (1, 1))(x, train)
        b1 = ConvBN(32, (1, 1))(x, train)
        b1 = ConvBN(32, (3, 3))(b1, train)
        b2 = ConvBN(32, (1, 1))(x, train)
        b2 = ConvBN(48, (3, 3))(b2, train)
        b2 = ConvBN(64, (3, 3))(b2, train)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1))(up)
        return nn.relu(x + self.scale * up)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(384, (3, 3), (2, 2), "VALID")(x, train)
        b1 = ConvBN(256, (1, 1))(x, train)
        b1 = ConvBN(256, (3, 3))(b1, train)
        b1 = ConvBN(384, (3, 3), (2, 2), "VALID")(b1, train)
        b2 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1088


class Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(192, (1, 1))(x, train)
        b1 = ConvBN(128, (1, 1))(x, train)
        b1 = ConvBN(160, (1, 7))(b1, train)
        b1 = ConvBN(192, (7, 1))(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1))(up)
        return nn.relu(x + self.scale * up)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(256, (1, 1))(x, train)
        b0 = ConvBN(384, (3, 3), (2, 2), "VALID")(b0, train)
        b1 = ConvBN(256, (1, 1))(x, train)
        b1 = ConvBN(288, (3, 3), (2, 2), "VALID")(b1, train)
        b2 = ConvBN(256, (1, 1))(x, train)
        b2 = ConvBN(288, (3, 3))(b2, train)
        b2 = ConvBN(320, (3, 3), (2, 2), "VALID")(b2, train)
        b3 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 2080


class Block8(nn.Module):
    scale: float = 0.20
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = ConvBN(192, (1, 1))(x, train)
        b1 = ConvBN(192, (1, 1))(x, train)
        b1 = ConvBN(224, (1, 3))(b1, train)
        b1 = ConvBN(256, (3, 1))(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1))(up)
        out = x + self.scale * up
        return nn.relu(out) if self.use_relu else out


class InceptionResNetV2(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = ConvBN(32, (3, 3), (2, 2), "VALID")(x, train)
        x = ConvBN(32, (3, 3), padding="VALID")(x, train)
        x = ConvBN(64, (3, 3))(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1), padding="VALID")(x, train)
        x = ConvBN(192, (3, 3), padding="VALID")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = Mixed5b()(x, train)
        for _ in range(10):
            x = Block35()(x, train)
        x = Mixed6a()(x, train)
        for _ in range(20):
            x = Block17()(x, train)
        x = Mixed7a()(x, train)
        for _ in range(9):
            x = Block8()(x, train)
        x = Block8(scale=1.0, use_relu=False)(x, train)
        x = ConvBN(1536, (1, 1))(x, train)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes)(x)
