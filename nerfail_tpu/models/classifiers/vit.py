"""ViT-B/16 and MLP-Mixer B/16, flax NHWC.

Zoo parity with getModel('vit_b_16') (224² input) and the timm
'mixer_b16_224' entry (model/GetModel.py:36-44). Patch embedding is a
16×16/16 conv — one big MXU matmul per image; the token dimension is padded
to a lane-friendly multiple by construction (224/16 = 14 → 196+1 tokens).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nerfail_tpu.models.classifiers.common import scale_input


class MlpBlock(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        out_dim = x.shape[-1]
        # exact erf GELU (torch nn.GELU default; flax defaults to tanh)
        x = nn.gelu(nn.Dense(self.hidden)(x), approximate=False)
        return nn.Dense(out_dim)(x)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(y, y)
        x = x + y
        y = nn.LayerNorm()(x)
        y = MlpBlock(self.mlp_dim)(y)
        return x + y


class ViT(nn.Module):
    """ViT-B/16: 12 layers, 12 heads, width 768, mlp 3072, patch 16."""

    num_classes: int = 8
    patch: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = scale_input(x)
        x = nn.Conv(
            self.width, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID",
        )(x)
        x = x.reshape(B, -1, self.width)                      # [B, T, D]
        cls = self.param(
            "cls", nn.initializers.zeros, (1, 1, self.width)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], 1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.width),
        )
        x = x + pos
        for _ in range(self.depth):
            x = EncoderBlock(self.num_heads, self.mlp_dim)(x, train)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.num_classes)(x[:, 0])


class MixerBlock(nn.Module):
    tokens_mlp_dim: int
    channels_mlp_dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = jnp.swapaxes(y, 1, 2)
        y = MlpBlock(self.tokens_mlp_dim)(y)
        y = jnp.swapaxes(y, 1, 2)
        x = x + y
        y = nn.LayerNorm()(x)
        return x + MlpBlock(self.channels_mlp_dim)(y)


class MlpMixer(nn.Module):
    """Mixer-B/16: 12 blocks, width 768, token mlp 384, channel mlp 3072."""

    num_classes: int = 8
    patch: int = 16
    width: int = 768
    depth: int = 12
    tokens_mlp_dim: int = 384
    channels_mlp_dim: int = 3072

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = scale_input(x)
        x = nn.Conv(
            self.width, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID",
        )(x)
        x = x.reshape(B, -1, self.width)
        for _ in range(self.depth):
            x = MixerBlock(self.tokens_mlp_dim, self.channels_mlp_dim)(x)
        x = nn.LayerNorm()(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes)(x)
