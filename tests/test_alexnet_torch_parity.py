"""AlexNet logits parity vs an EXECUTED torch twin.

torchvision is absent, but torch (cpu) is baked in — the torchvision
AlexNet feature/classifier topology (the one getModel('alexnet')
instantiates, GetModel.py:13-18, with the final Linear resized) is small
enough to state directly in torch.nn here. We initialize the flax model,
copy its parameters into the torch twin (HWIO→OIHW kernels, Dense
transpose), and require allclose logits on a random 0-255 image — any
padding/stride/pool-geometry/classifier-order divergence shows up as a
numeric mismatch, the same contract as the MyCNN golden parity test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_alexnet(num_classes):
    import torch.nn as tn

    return tn.Sequential(
        # features (torchvision.models.alexnet)
        tn.Conv2d(3, 64, 11, 4, 2), tn.ReLU(),
        tn.MaxPool2d(3, 2),
        tn.Conv2d(64, 192, 5, padding=2), tn.ReLU(),
        tn.MaxPool2d(3, 2),
        tn.Conv2d(192, 384, 3, padding=1), tn.ReLU(),
        tn.Conv2d(384, 256, 3, padding=1), tn.ReLU(),
        tn.Conv2d(256, 256, 3, padding=1), tn.ReLU(),
        tn.MaxPool2d(3, 2),
        tn.AdaptiveAvgPool2d((6, 6)),
        tn.Flatten(),
        # classifier (dropouts are identity in eval mode)
        tn.Dropout(), tn.Linear(256 * 36, 4096), tn.ReLU(),
        tn.Dropout(), tn.Linear(4096, 4096), tn.ReLU(),
        tn.Linear(4096, num_classes),
    )


@pytest.mark.slow
def test_alexnet_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.small_nets import AlexNet

    rng = np.random.default_rng(3)
    x255 = rng.uniform(0, 255, (2, 299, 299, 3)).astype(np.float32)

    model = AlexNet(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False
    )
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    tw = _torch_alexnet(8).eval()
    convs = [m for m in tw if isinstance(m, torch.nn.Conv2d)]
    linears = [m for m in tw if isinstance(m, torch.nn.Linear)]
    p = variables["params"]
    flax_convs = [p[f"Conv_{i}"] for i in range(5)]
    flax_dense = [p[f"Dense_{i}"] for i in range(3)]
    with torch.no_grad():
        for tm, fp in zip(convs, flax_convs):
            tm.weight.copy_(torch.from_numpy(
                np.asarray(fp["kernel"]).transpose(3, 2, 0, 1).copy()
            ))
            tm.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
        for tm, fp in zip(linears, flax_dense):
            tm.weight.copy_(torch.from_numpy(
                np.asarray(fp["kernel"]).T.copy()
            ))
            tm.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        want = tw(xt).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
