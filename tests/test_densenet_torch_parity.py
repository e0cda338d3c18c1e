"""DenseNet121 logits parity vs an EXECUTED torch twin.

Same contract as the alexnet/mobilenet parity tests: the torchvision
DenseNet-121 topology (getModel('densenet121') resizes its classifier)
is stated in torch.nn, flax params — with randomized BN running stats —
are copied in creation order, logits must match. Stem pad geometry
(Conv2d(7,2,3), MaxPool2d(3,2,1)), dense-layer concat order, transition
avg pools, and BN eps all surface numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_mobilenet_torch_parity import _walk_flax


def _torch_densenet(num_classes):
    import torch.nn as tn

    class TDenseLayer(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm1 = tn.BatchNorm2d(c)
            self.conv1 = tn.Conv2d(c, 128, 1, bias=False)
            self.norm2 = tn.BatchNorm2d(128)
            self.conv2 = tn.Conv2d(128, 32, 3, padding=1, bias=False)

        def forward(self, x):
            y = self.conv1(torch.relu(self.norm1(x)))
            y = self.conv2(torch.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TTransition(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tn.BatchNorm2d(c)
            self.conv = tn.Conv2d(c, c // 2, 1, bias=False)

        def forward(self, x):
            return torch.nn.functional.avg_pool2d(
                self.conv(torch.relu(self.norm(x))), 2, 2
            )

    layers = [
        tn.Conv2d(3, 64, 7, 2, 3, bias=False), tn.BatchNorm2d(64),
        tn.ReLU(), tn.MaxPool2d(3, 2, 1),
    ]
    c = 64
    for bi, n in enumerate((6, 12, 24, 16)):
        for _ in range(n):
            layers.append(TDenseLayer(c))
            c += 32
        if bi != 3:
            layers.append(TTransition(c))
            c //= 2
    layers += [tn.BatchNorm2d(c), tn.ReLU()]
    return tn.Sequential(*layers), tn.Linear(c, num_classes)


@pytest.mark.slow
def test_densenet121_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.densenet import DenseNet121

    rng = np.random.default_rng(7)
    # even extent on purpose: exposes SAME-vs-torch pad misalignment
    x255 = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)

    model = DenseNet121(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
    )
    stats = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
            if "var" in str(path[-1]) else
            (rng.standard_normal(x.shape) * 0.1).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    features, head = _torch_densenet(8)
    pairs = []
    _walk_flax(variables["params"], variables["batch_stats"], pairs)
    t_convs = [m for m in features.modules()
               if isinstance(m, torch.nn.Conv2d)]
    t_bns = [m for m in features.modules()
             if isinstance(m, torch.nn.BatchNorm2d)]
    with torch.no_grad():
        ci = bi = 0
        for kind, v in pairs:
            if kind == "conv":
                kern, cb = v
                t_convs[ci].weight.copy_(
                    torch.from_numpy(kern.transpose(3, 2, 0, 1).copy())
                )
                if cb is not None:
                    t_convs[ci].bias.copy_(torch.from_numpy(cb))
                ci += 1
            elif kind == "bn":
                sc, b, mu, var = v
                t_bns[bi].weight.copy_(torch.from_numpy(sc))
                t_bns[bi].bias.copy_(torch.from_numpy(b))
                t_bns[bi].running_mean.copy_(torch.from_numpy(mu))
                t_bns[bi].running_var.copy_(torch.from_numpy(var))
                bi += 1
            else:
                k, b = v
                head.weight.copy_(torch.from_numpy(k.T.copy()))
                head.bias.copy_(torch.from_numpy(b))
        assert ci == len(t_convs) and bi == len(t_bns)
        features.eval()
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        y = features(xt)
        want = head(y.mean(dim=(2, 3))).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
