"""Swin-B transformer in flax NHWC (zoo parity with getModel('swin_b')).

Standard Swin topology: 4×4 patch embed → 4 stages of window-attention
blocks (window 7, shifted every other block) with patch-merging
downsampling between stages. Swin-B: dims 128/256/512/1024, depths
(2, 2, 18, 2), heads (4, 8, 16, 32). 224² input.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.models.classifiers.common import scale_input


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    B = wins.shape[0] // (H * W // ws // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [nW*B, ws*ws, C]
        B_, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True)(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        q = q * (head_dim ** -0.5)
        attn = q @ k.transpose(0, 1, 3, 2)                 # [B_, h, N, N]

        # relative position bias
        ws = self.window
        coords = np.stack(
            np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel + ws - 1)
        rel_index = rel[0] * (2 * ws - 1) + rel[1]         # [N, N]
        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(stddev=0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        bias = bias_table[rel_index.reshape(-1)].reshape(
            N, N, self.num_heads
        ).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(B_, self.num_heads, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(self.dim)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        B, H, W, C = x.shape
        ws = min(self.window, H, W)
        shift = self.shift if ws < min(H, W) else 0

        y = nn.LayerNorm()(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _shift_mask(H, W, ws, shift)
        else:
            mask = None
        wins = window_partition(y, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws)(wins, mask)
        y = window_reverse(wins, ws, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y

        y = nn.LayerNorm()(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio))(y)
        y = nn.gelu(y, approximate=False)   # torch nn.GELU is exact erf
        y = nn.Dense(self.dim)(y)
        return x + y


def _shift_mask(H, W, ws, shift):
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mask_wins = window_partition(jnp.asarray(img_mask), ws).reshape(
        -1, ws * ws
    )
    attn_mask = mask_wins[:, None, :] - mask_wins[:, :, None]
    return jnp.where(attn_mask != 0, -100.0, 0.0)


class PatchMerging(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # torchvision concat order [x00, x10, x01, x11] (row offset varies
        # fastest): axes to (B, h, w, col, row, C) before flattening
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm()(x)
        return nn.Dense(2 * C, use_bias=False)(x)


class SwinB(nn.Module):
    num_classes: int = 8
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = scale_input(x)
        x = nn.Conv(self.embed_dim, (4, 4), (4, 4), "VALID")(x)
        x = nn.LayerNorm()(x)
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * 2 ** stage
            for b in range(depth):
                x = SwinBlock(
                    dim, heads, self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                )(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging()(x)
        x = nn.LayerNorm()(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)
