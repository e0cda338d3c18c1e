"""Inception-V3 with auxiliary logits, flax NHWC.

Zoo parity: the reference's default attack target is torchvision
inception_v3 with aux_logits (getModel 'inception', model/GetModel.py:15-20;
aux loss ×0.4 in model_train.py:148-152). Standard V3 topology: stem →
3×InceptionA → InceptionB → 4×InceptionC → [aux head] → InceptionD →
2×InceptionE → GAP → FC. 299² input.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import (
    ConvBN,
    global_avg_pool,
    scale_input,
)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBN(64, (1, 1))(x, train)
        b5 = ConvBN(48, (1, 1))(x, train)
        b5 = ConvBN(64, (5, 5))(b5, train)
        b3 = ConvBN(64, (1, 1))(x, train)
        b3 = ConvBN(96, (3, 3))(b3, train)
        b3 = ConvBN(96, (3, 3))(b3, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        bp = ConvBN(self.pool_features, (1, 1))(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBN(384, (3, 3), (2, 2), "VALID")(x, train)
        bd = ConvBN(64, (1, 1))(x, train)
        bd = ConvBN(96, (3, 3))(bd, train)
        bd = ConvBN(96, (3, 3), (2, 2), "VALID")(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1))(x, train)
        b7 = ConvBN(c7, (1, 1))(x, train)
        b7 = ConvBN(c7, (1, 7))(b7, train)
        b7 = ConvBN(192, (7, 1))(b7, train)
        bd = ConvBN(c7, (1, 1))(x, train)
        bd = ConvBN(c7, (7, 1))(bd, train)
        bd = ConvBN(c7, (1, 7))(bd, train)
        bd = ConvBN(c7, (7, 1))(bd, train)
        bd = ConvBN(192, (1, 7))(bd, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        bp = ConvBN(192, (1, 1))(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvBN(192, (1, 1))(x, train)
        b3 = ConvBN(320, (3, 3), (2, 2), "VALID")(b3, train)
        b7 = ConvBN(192, (1, 1))(x, train)
        b7 = ConvBN(192, (1, 7))(b7, train)
        b7 = ConvBN(192, (7, 1))(b7, train)
        b7 = ConvBN(192, (3, 3), (2, 2), "VALID")(b7, train)
        bp = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBN(320, (1, 1))(x, train)
        b3 = ConvBN(384, (1, 1))(x, train)
        b3 = jnp.concatenate(
            [ConvBN(384, (1, 3))(b3, train), ConvBN(384, (3, 1))(b3, train)],
            axis=-1,
        )
        bd = ConvBN(448, (1, 1))(x, train)
        bd = ConvBN(384, (3, 3))(bd, train)
        bd = jnp.concatenate(
            [ConvBN(384, (1, 3))(bd, train), ConvBN(384, (3, 1))(bd, train)],
            axis=-1,
        )
        bp = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        bp = ConvBN(192, (1, 1))(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionAux(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (5, 5), (3, 3), "VALID")
        x = ConvBN(128, (1, 1))(x, train)
        x = ConvBN(768, (5, 5), padding="VALID")(x, train)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes)(x)


class InceptionV3(nn.Module):
    num_classes: int = 8
    aux_logits: bool = True

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

        x = InceptionA(32)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionA(64)(x, train)
        x = InceptionB()(x, train)
        for c7 in (128, 160, 160, 192):
            x = InceptionC(c7)(x, train)

        aux = None
        if self.aux_logits and train:
            aux = InceptionAux(self.num_classes)(x, train)

        x = InceptionD()(x, train)
        x = InceptionE()(x, train)
        x = InceptionE()(x, train)
        x = global_avg_pool(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        if aux is not None:
            return logits, aux
        return logits
