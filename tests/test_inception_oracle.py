"""Numpy-oracle spot check for inception_v3's stem + first Mixed block
(VERDICT r3 weak #9 / next #10).

torchvision is absent in this image, so the reference's DEFAULT attack
target (getModel 'inception', model/GetModel.py:15-20) has no executable
torch reference; its topology was covered only by the order-zip shape
contract. This test recomputes the stem (5 ConvBN + 2 max pools) and the
first InceptionA block from the REAL InceptionV3's own parameters with an
independent numpy implementation of torchvision's op semantics:

  conv: explicit torch pads ((k−1)/2 for the stride-1 'SAME' bricks,
        0 for VALID) via sliding_window_view + einsum
  bn (eval): (x − mean)/sqrt(var + eps)·scale + bias, eps = 1e-3
  max pool: 3×3 stride 2, no padding
  avg pool (branch_pool): 3×3 stride 1 pad 1, count_include_pad=True
        (torch F.avg_pool2d default — divide by 9 everywhere)

and compares against the flax model's captured intermediates. A stride,
padding, BN-epsilon, pool-semantics, or branch-order divergence in the
bricks shows up as a numeric mismatch here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def conv2d_np(x, k, stride=1, pad="same"):
    """NHWC conv, k [kh, kw, ci, co]; pad 'same' = torch (k−1)/2 explicit
    pads (stride-1 odd kernels only), 'valid' = none."""
    kh, kw = k.shape[:2]
    if pad == "same":
        assert stride == 1 and kh % 2 == 1 and kw % 2 == 1
        x = np.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                       (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), (1, 2))
    win = win[:, ::stride, ::stride]          # [N, ho, wo, C, kh, kw]
    return np.einsum("nhwcij,ijco->nhwo", win, k, optimize=True)


def bn_np(x, p, s, eps=1e-3):
    return ((x - s["mean"]) / np.sqrt(s["var"] + eps)) * p["scale"] \
        + p["bias"]


def convbn_np(x, params, stats, stride=1, pad="same"):
    x = conv2d_np(x, np.asarray(params["Conv_0"]["kernel"]), stride, pad)
    x = bn_np(x, {k: np.asarray(v) for k, v in
                  params["BatchNorm_0"].items()},
              {k: np.asarray(v) for k, v in stats["BatchNorm_0"].items()})
    return np.maximum(x, 0.0)


def max_pool_np(x, k=3, s=2):
    win = np.lib.stride_tricks.sliding_window_view(x, (k, k), (1, 2))
    return win[:, ::s, ::s].max(axis=(-2, -1))


def avg_pool_np_pad1(x, k=3):
    """3×3 stride-1 pad-1 avg pool, count_include_pad=True (÷9 always)."""
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (k, k), (1, 2))
    return win.mean(axis=(-2, -1))


def _randomize_stats(tree, rng):
    """Init stats are mean=0/var=1 — too symmetric to catch an epsilon or
    scale/bias swap; draw nontrivial values."""
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
        ),
        tree,
    )


@pytest.mark.slow
def test_inception_v3_stem_and_first_mixed_block_vs_numpy(rng):
    from nerfail_tpu.models.classifiers.inception_v3 import InceptionV3

    model = InceptionV3(num_classes=8)
    H = 139                       # small odd size; every stage stays valid
    x_in = rng.uniform(0, 255, (1, H, H, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), train=False
    )
    stats = _randomize_stats(variables["batch_stats"], rng)
    params = variables["params"]

    _, inter = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_in),
        train=False, capture_intermediates=True, mutable=["intermediates"],
    )
    inter = inter["intermediates"]

    sp = lambda i: params[f"ConvBN_{i}"]
    ss = lambda i: stats[f"ConvBN_{i}"]

    # ---- stem: 5 ConvBN + 2 max pools (inception_v3 stem) -------------
    x = x_in / 127.5 - 1.0
    x = convbn_np(x, sp(0), ss(0), stride=2, pad="valid")
    x = convbn_np(x, sp(1), ss(1), pad="valid")
    x = convbn_np(x, sp(2), ss(2), pad="same")
    x = max_pool_np(x)
    x = convbn_np(x, sp(3), ss(3), pad="valid")   # 1×1: pads irrelevant
    x = convbn_np(x, sp(4), ss(4), pad="valid")
    stem = max_pool_np(x)

    got_stem = np.asarray(
        inter["InceptionA_0"]["ConvBN_0"]["__call__"][0]
    )
    # InceptionA_0's first branch is a 1×1 ConvBN of the stem output:
    # recompute it from the oracle stem and require a match
    pa = params["InceptionA_0"]
    sa = stats["InceptionA_0"]
    b1 = convbn_np(stem, pa["ConvBN_0"], sa["ConvBN_0"], pad="valid")
    np.testing.assert_allclose(got_stem, b1, rtol=2e-4, atol=2e-4)

    # ---- full InceptionA_0 output (branch order + pool semantics) -----
    b5 = convbn_np(stem, pa["ConvBN_1"], sa["ConvBN_1"], pad="valid")
    b5 = convbn_np(b5, pa["ConvBN_2"], sa["ConvBN_2"], pad="same")
    b3 = convbn_np(stem, pa["ConvBN_3"], sa["ConvBN_3"], pad="valid")
    b3 = convbn_np(b3, pa["ConvBN_4"], sa["ConvBN_4"], pad="same")
    b3 = convbn_np(b3, pa["ConvBN_5"], sa["ConvBN_5"], pad="same")
    bp = avg_pool_np_pad1(stem)
    bp = convbn_np(bp, pa["ConvBN_6"], sa["ConvBN_6"], pad="valid")
    want_a = np.concatenate([b1, b5, b3, bp], axis=-1)

    got_a = np.asarray(inter["InceptionB_0"]["ConvBN_0"]["__call__"][0])
    # InceptionB_0's first branch is a stride-2 VALID 3×3 of InceptionA_2's
    # output; instead of chaining two more InceptionA oracles, check the
    # *block output itself* via the captured input of the next submodule:
    # InceptionA_1's first 1×1 consumes InceptionA_0's output.
    got_a0_b1 = np.asarray(
        inter["InceptionA_1"]["ConvBN_0"]["__call__"][0]
    )
    pa1 = params["InceptionA_1"]
    sa1 = stats["InceptionA_1"]
    want_a0_b1 = convbn_np(want_a, pa1["ConvBN_0"], sa1["ConvBN_0"],
                           pad="valid")
    np.testing.assert_allclose(got_a0_b1, want_a0_b1, rtol=5e-4, atol=5e-4)
    assert got_a.shape[-1] == 384      # B concat width sanity
