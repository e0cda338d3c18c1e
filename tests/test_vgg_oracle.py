"""Numpy-oracle spot check for VGG16's first two conv stages (VERDICT
r4 weak #9 follow-up — extends the resnet50/inception oracle pattern).

torchvision is absent in this image, so getModel('vgg16')
(model/GetModel.py:29-31) has no executable torch reference. At stride 1
a 3×3 SAME conv and a 2×2/2 max pool on even extents are EXACTLY
torchvision's explicit-pad semantics (pad 1 / pad 0), so an independent
numpy recomputation of the first two stages from the model's own
parameters pins the flax stack to torch conv semantics: input scaling,
conv padding alignment, bias wiring, ReLU placement, and pool geometry
all show up as a numeric mismatch here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_resnet_oracle import conv2d_np


def conv_bias_relu_np(x, p, pad=1):
    k = np.asarray(p["kernel"])
    b = np.asarray(p["bias"])
    return np.maximum(conv2d_np(x, k, stride=1, pad=pad) + b, 0.0)


def max_pool2_np(x):
    """torch MaxPool2d(2, 2) on even extents (== flax VALID 2×2/2)."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


@pytest.mark.slow
def test_vgg16_first_two_stages_vs_numpy(rng):
    from nerfail_tpu.models.classifiers.vgg import VGG16

    model = VGG16(num_classes=8)
    H = 64
    x_in = rng.uniform(0, 255, (1, H, H, 3)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, H, 3)), train=False
    )
    params = variables["params"]

    _, inter = model.apply(
        variables, jnp.asarray(x_in), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = inter["intermediates"]

    # ---- stage 1: two 3×3 pad-1 conv+relu, 2×2/2 pool -----------------
    x = x_in / 127.5 - 1.0
    x = conv_bias_relu_np(x, params["Conv_0"])
    x = conv_bias_relu_np(x, params["Conv_1"])
    x = max_pool2_np(x)

    # ---- stage 2 ------------------------------------------------------
    x = conv_bias_relu_np(x, params["Conv_2"])
    x = conv_bias_relu_np(x, params["Conv_3"])
    x = max_pool2_np(x)

    # Conv_4 consumes stage 2's output: compare its captured input-side
    # product (recomputed from the oracle activations) with the model's
    got = np.asarray(inter["Conv_4"]["__call__"][0])
    want = conv2d_np(x, np.asarray(params["Conv_4"]["kernel"]), pad=1) \
        + np.asarray(params["Conv_4"]["bias"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
