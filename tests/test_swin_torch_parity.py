"""Swin window-attention logits parity vs an EXECUTED torch twin.

The torch twin implements torchvision's swin_b semantics directly with
torch ops (packed qkv chunking, q·hd^-0.5 scale, (2w-1)² relative
position bias table + index math, region-counted shift masks, torch
patch-merging concat order [x00,x10,x01,x11], patch embed + pre-LN MLP
blocks) at a reduced configuration whose resolutions are all
window-divisible — the regime the 224² SwinB registry entry runs in
(README documents the 224-vs-299 input-size policy). A logits match
validates the flax shifted-window attention math end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _t_window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H * W // ws // ws)
    x = wins.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _t_shift_mask(H, W, ws, shift):
    img = torch.zeros(1, H, W, 1)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    mw = _t_window_partition(img, ws).reshape(-1, ws * ws)
    am = mw[:, None, :] - mw[:, :, None]
    return torch.where(am != 0, torch.tensor(-100.0), torch.tensor(0.0))


def _t_attn(x, ws, heads, qkv_w, qkv_b, proj_w, proj_b, bias_table,
            shift, H, W):
    """torchvision shifted_window_attention on NHWC (no-padding regime)."""
    B = x.shape[0]
    C = x.shape[-1]
    hd = C // heads
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    wins = _t_window_partition(x, ws)                    # [nW*B, N, C]
    N = ws * ws
    qkv = wins @ qkv_w.T + qkv_b
    qkv = qkv.reshape(-1, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)                       # [B_, h, N, N]

    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :] + ws - 1
    idx = rel[0] * (2 * ws - 1) + rel[1]
    bias = bias_table[idx.reshape(-1)].reshape(N, N, heads)
    attn = attn + bias.permute(2, 0, 1)[None]

    if shift > 0:
        mask = _t_shift_mask(H, W, ws, shift)
        nW = mask.shape[0]
        attn = attn.reshape(B, nW, heads, N, N) + mask[None, :, None]
        attn = attn.reshape(-1, heads, N, N)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(-1, N, C)
    out = out @ proj_w.T + proj_b
    out = _t_window_reverse(out, ws, H, W)
    if shift > 0:
        out = torch.roll(out, (shift, shift), dims=(1, 2))
    return out


def _ln(p, x):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],),
        torch.from_numpy(np.asarray(p["scale"])),
        torch.from_numpy(np.asarray(p["bias"])), eps=1e-6,
    )


def _dense(p, x):
    return x @ torch.from_numpy(np.asarray(p["kernel"])) + (
        torch.from_numpy(np.asarray(p["bias"])) if "bias" in p else 0.0
    )


@pytest.mark.slow
def test_swin_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.swin import SwinB

    depths, heads, embed, window = (2, 2, 2), (2, 4, 8), 32, 4
    model = SwinB(num_classes=8, embed_dim=embed, depths=depths,
                  num_heads=heads, window=window)
    rng = np.random.default_rng(31)
    x255 = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    with torch.no_grad():
        xt = torch.from_numpy(x255 / 127.5 - 1.0)        # NHWC
        # patch embed: 4×4/4 conv as unfold+matmul on NHWC
        k = torch.from_numpy(p["Conv_0"]["kernel"])       # [4,4,3,E]
        b = torch.from_numpy(p["Conv_0"]["bias"])
        B = xt.shape[0]
        xt = xt.view(B, 16, 4, 16, 4, 3).permute(0, 1, 3, 2, 4, 5)
        xt = xt.reshape(B, 16, 16, 4 * 4 * 3) @ k.reshape(48, embed) + b
        y = _ln(p["LayerNorm_0"], xt)

        blk = 0
        for stage, (depth, h) in enumerate(zip(depths, heads)):
            dim = embed * 2 ** stage
            H = W = 16 // 2 ** stage
            for bi in range(depth):
                bp = p[f"SwinBlock_{blk}"]
                blk += 1
                ws = min(window, H, W)
                shift = (window // 2 if bi % 2 == 1 else 0)
                if ws >= min(H, W):
                    shift = 0
                ap = bp["WindowAttention_0"]
                z = _ln(bp["LayerNorm_0"], y)
                z = _t_attn(
                    z, ws, h,
                    torch.from_numpy(ap["Dense_0"]["kernel"]).T,
                    torch.from_numpy(ap["Dense_0"]["bias"]),
                    torch.from_numpy(ap["Dense_1"]["kernel"]).T,
                    torch.from_numpy(ap["Dense_1"]["bias"]),
                    torch.from_numpy(ap["rel_pos_bias"]),
                    shift, H, W,
                )
                y = y + z
                z = _ln(bp["LayerNorm_1"], y)
                z = _dense(bp["Dense_0"], z)
                z = torch.nn.functional.gelu(z)
                y = y + _dense(bp["Dense_1"], z)
            if stage < len(depths) - 1:
                mp = p[f"PatchMerging_{stage}"]
                Bq, Hq, Wq, Cq = y.shape
                y = y.view(Bq, Hq // 2, 2, Wq // 2, 2, Cq)
                y = y.permute(0, 1, 3, 4, 2, 5).reshape(
                    Bq, Hq // 2, Wq // 2, 4 * Cq
                )
                y = _ln(mp["LayerNorm_0"], y)
                y = _dense(mp["Dense_0"], y)
        y = _ln(p["LayerNorm_1"], y).mean(dim=(1, 2))
        want = _dense(p["Dense_0"], y).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
