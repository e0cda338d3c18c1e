"""EfficientNet-B0 logits parity vs an EXECUTED torch twin.

Same contract as the alexnet/mobilenet/densenet parity tests: the
torchvision EfficientNet-B0 topology (getModel('efficientnet_b0'),
stochastic depth = identity at eval) is stated in torch.nn, flax params
— with randomized BN running stats — are copied in creation order, and
logits must match. MBConv ordering (expand → depthwise → SE → project),
SE squeeze width (input_channels//4), SiLU placement, and torch pad
geometry all surface numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_mobilenet_torch_parity import _walk_flax


def _torch_efficientnet(num_classes):
    import torch.nn as tn

    def cbs(inp, out, k=3, stride=1, groups=1):
        return [tn.Conv2d(inp, out, k, stride, (k - 1) // 2,
                          groups=groups, bias=False),
                tn.BatchNorm2d(out), tn.SiLU()]

    class SE(tn.Module):
        def __init__(self, c, squeeze):
            super().__init__()
            self.fc1 = tn.Conv2d(c, squeeze, 1)
            self.fc2 = tn.Conv2d(squeeze, c, 1)

        def forward(self, x):
            s = x.mean(dim=(2, 3), keepdim=True)
            s = torch.sigmoid(self.fc2(torch.nn.functional.silu(
                self.fc1(s))))
            return x * s

    class MBConv(tn.Module):
        def __init__(self, inp, oup, k, stride, expand):
            super().__init__()
            hidden = inp * expand
            layers = []
            if expand != 1:
                layers += cbs(inp, hidden, 1)
            layers += cbs(hidden, hidden, k, stride, groups=hidden)
            layers += [SE(hidden, max(1, inp // 4))]
            layers += [tn.Conv2d(hidden, oup, 1, bias=False),
                       tn.BatchNorm2d(oup)]
            self.block = tn.Sequential(*layers)
            self.use_res = stride == 1 and inp == oup

        def forward(self, x):
            y = self.block(x)
            return x + y if self.use_res else y

    cfg = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
           (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
           (6, 320, 1, 1, 3)]
    feats = cbs(3, 32, 3, 2)
    c_in = 32
    for t, c, n, s, k in cfg:
        for i in range(n):
            feats.append(MBConv(c_in, c, k, s if i == 0 else 1, t))
            c_in = c
    feats += cbs(c_in, 1280, 1)
    return torch.nn.Sequential(*feats), torch.nn.Linear(1280, num_classes)


@pytest.mark.slow
def test_efficientnet_b0_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.efficientnet import EfficientNetB0

    rng = np.random.default_rng(9)
    x255 = rng.uniform(0, 255, (2, 128, 128, 3)).astype(np.float32)

    model = EfficientNetB0(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
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

    features, head = _torch_efficientnet(8)
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
