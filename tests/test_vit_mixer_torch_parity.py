"""ViT-B/16 and Mixer-B/16 logits parity vs EXECUTED torch twins.

The reference builds vit_b_16 from torchvision and mixer_b16_224 from
timm (GetModel.py:23-24,36-37); neither library is in this image, but
both topologies are small enough to state in torch.nn. The torch twins
here are written independently (explicit per-head attention linears, not
nn.MultiheadAttention), so a logits match validates the flax attention /
token-mixing math itself: qkv head split, scale, softmax axis, residual
and pre-LN placement, cls-token/pos-embedding wiring, LN eps 1e-6.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _ln(tn, d):
    return tn.LayerNorm(d, eps=1e-6)


def _copy_ln(t, p):
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        t.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


def _copy_dense(t, p):
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T.copy()))
        t.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


@pytest.mark.slow
def test_mixer_b_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.vit import MlpMixer

    import torch.nn as tn

    depth, width = 4, 96          # scaled-down Mixer: same wiring
    model = MlpMixer(num_classes=8, depth=depth, width=width,
                     tokens_mlp_dim=48, channels_mlp_dim=192)
    rng = np.random.default_rng(13)
    x255 = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    p = variables["params"]
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    T = (64 // 16) ** 2
    proj = tn.Conv2d(3, width, 16, 16)
    blocks = []
    for _ in range(depth):
        blocks.append(tn.ModuleDict({
            "ln1": _ln(tn, width),
            "tok1": tn.Linear(T, 48), "tok2": tn.Linear(48, T),
            "ln2": _ln(tn, width),
            "ch1": tn.Linear(width, 192), "ch2": tn.Linear(192, width),
        }))
    final_ln = _ln(tn, width)
    head = tn.Linear(width, 8)

    with torch.no_grad():
        proj.weight.copy_(torch.from_numpy(
            np.asarray(p["Conv_0"]["kernel"]).transpose(3, 2, 0, 1).copy()
        ))
        proj.bias.copy_(torch.from_numpy(np.asarray(p["Conv_0"]["bias"])))
    for i, b in enumerate(blocks):
        bp = p[f"MixerBlock_{i}"]
        _copy_ln(b["ln1"], bp["LayerNorm_0"])
        _copy_dense(b["tok1"], bp["MlpBlock_0"]["Dense_0"])
        _copy_dense(b["tok2"], bp["MlpBlock_0"]["Dense_1"])
        _copy_ln(b["ln2"], bp["LayerNorm_1"])
        _copy_dense(b["ch1"], bp["MlpBlock_1"]["Dense_0"])
        _copy_dense(b["ch2"], bp["MlpBlock_1"]["Dense_1"])
    _copy_ln(final_ln, p["LayerNorm_0"])
    _copy_dense(head, p["Dense_0"])

    with torch.no_grad():
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        y = proj(xt).flatten(2).transpose(1, 2)          # [B, T, D]
        gelu = tn.GELU()
        for b in blocks:
            t = b["ln1"](y).transpose(1, 2)              # [B, D, T]
            t = b["tok2"](gelu(b["tok1"](t))).transpose(1, 2)
            y = y + t
            c = b["ln2"](y)
            y = y + b["ch2"](gelu(b["ch1"](c)))
        y = final_ln(y).mean(dim=1)
        want = head(y).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vit_b_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.vit import ViT

    import torch.nn as tn

    depth, width, heads, mlp = 3, 96, 4, 192    # scaled-down ViT
    model = ViT(num_classes=8, depth=depth, width=width,
                num_heads=heads, mlp_dim=mlp)
    rng = np.random.default_rng(17)
    x255 = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    # randomize the zero-init cls/pos so their wiring is tested
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["cls"] = (rng.standard_normal(p["cls"].shape) * 0.1).astype(
        np.float32)
    p["pos_embedding"] = (
        rng.standard_normal(p["pos_embedding"].shape) * 0.1
    ).astype(np.float32)
    variables = {"params": p}
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    hd = width // heads
    proj = tn.Conv2d(3, width, 16, 16)
    with torch.no_grad():
        proj.weight.copy_(torch.from_numpy(
            p["Conv_0"]["kernel"].transpose(3, 2, 0, 1).copy()
        ))
        proj.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"]))

    def attn(y, bp):
        """Independent torch attention from flax MHA params
        (kernel [D, H, hd] for q/k/v; out kernel [H, hd, D])."""
        ap = bp["MultiHeadDotProductAttention_0"]
        B, T, D = y.shape
        outs = []
        q_k = torch.from_numpy(ap["query"]["kernel"].copy())
        k_k = torch.from_numpy(ap["key"]["kernel"].copy())
        v_k = torch.from_numpy(ap["value"]["kernel"].copy())
        q_b = torch.from_numpy(ap["query"]["bias"].copy())
        k_b = torch.from_numpy(ap["key"]["bias"].copy())
        v_b = torch.from_numpy(ap["value"]["bias"].copy())
        for h in range(heads):
            q = y @ q_k[:, h] + q_b[h]
            k = y @ k_k[:, h] + k_b[h]
            v = y @ v_k[:, h] + v_b[h]
            a = torch.softmax(q @ k.transpose(1, 2) / hd ** 0.5, dim=-1)
            outs.append(a @ v)
        o = torch.stack(outs, dim=2)                     # [B, T, H, hd]
        o_k = torch.from_numpy(
            ap["out"]["kernel"].reshape(heads * hd, D).copy()
        )
        o_b = torch.from_numpy(ap["out"]["bias"].copy())
        return o.reshape(B, T, heads * hd) @ o_k + o_b

    with torch.no_grad():
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        y = proj(xt).flatten(2).transpose(1, 2)          # [B, T, D]
        cls = torch.from_numpy(p["cls"].copy()).expand(2, 1, width)
        y = torch.cat([cls, y], dim=1)
        y = y + torch.from_numpy(p["pos_embedding"].copy())
        gelu = tn.GELU()
        for i in range(depth):
            bp = p[f"EncoderBlock_{i}"]
            ln1 = _ln(tn, width)
            _copy_ln(ln1, bp["LayerNorm_0"])
            y = y + attn(ln1(y), bp)
            ln2 = _ln(tn, width)
            _copy_ln(ln2, bp["LayerNorm_1"])
            m1 = tn.Linear(width, mlp)
            m2 = tn.Linear(mlp, width)
            _copy_dense(m1, bp["MlpBlock_0"]["Dense_0"])
            _copy_dense(m2, bp["MlpBlock_0"]["Dense_1"])
            y = y + m2(gelu(m1(ln2(y))))
        fln = _ln(tn, width)
        _copy_ln(fln, p["LayerNorm_0"])
        head = tn.Linear(width, 8)
        _copy_dense(head, p["Dense_0"])
        want = head(fln(y)[:, 0]).numpy()

    # slightly looser: per-head loop vs flax's fused einsum accumulate in
    # different orders (observed ~5e-4); wiring errors are O(1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
