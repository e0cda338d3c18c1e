"""MobileNetV2 logits parity vs an EXECUTED torch twin.

Same contract as test_alexnet_torch_parity: torchvision is absent, but
the torchvision MobileNetV2 topology (getModel('mobilenet') resizes its
classifier, GetModel.py) is stated directly in torch.nn here, flax
parameters (including RANDOMIZED BN running stats, so eps and stat
wiring are exercised) are copied in creation order, and the logits must
match. ReLU6 placement, BN eps 1e-5, explicit torch pads, depthwise
groups, and the residual condition all surface as numeric mismatches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _t_convbn(tn, inp, out, k=3, stride=1, groups=1, relu6=True):
    layers = [
        tn.Conv2d(inp, out, k, stride, (k - 1) // 2, groups=groups,
                  bias=False),
        tn.BatchNorm2d(out),
    ]
    if relu6:
        layers.append(tn.ReLU6())
    return layers


def _torch_mobilenet(num_classes):
    import torch.nn as tn

    class InvRes(tn.Module):
        def __init__(self, inp, oup, stride, expand):
            super().__init__()
            hidden = inp * expand
            layers = []
            if expand != 1:
                layers += _t_convbn(tn, inp, hidden, 1)
            layers += _t_convbn(tn, hidden, hidden, 3, stride,
                                groups=hidden)
            layers += _t_convbn(tn, hidden, oup, 1, relu6=False)
            self.conv = tn.Sequential(*layers)
            self.use_res = stride == 1 and inp == oup

        def forward(self, x):
            y = self.conv(x)
            return x + y if self.use_res else y

    cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    feats = _t_convbn(torch.nn, 3, 32, 3, 2)
    c_in = 32
    for t, c, n, s in cfg:
        for i in range(n):
            feats.append(InvRes(c_in, c, s if i == 0 else 1, t))
            c_in = c
    feats += _t_convbn(torch.nn, c_in, 1280, 1)
    features = torch.nn.Sequential(*feats)
    head = torch.nn.Linear(1280, num_classes)
    return features, head


def _walk_flax(params, stats, out):
    """Depth-first creation-order (conv kernel, bn) pair collection."""
    for name in params:
        p = params[name]
        if name.startswith("Conv_"):
            out.append(("conv", (np.asarray(p["kernel"]),
                                 np.asarray(p["bias"])
                                 if "bias" in p else None)))
        elif name.startswith("BatchNorm_"):
            s = stats[name]
            out.append(("bn", (np.asarray(p["scale"]),
                               np.asarray(p["bias"]),
                               np.asarray(s["mean"]),
                               np.asarray(s["var"]))))
        elif name.startswith("Dense_"):
            out.append(("dense", (np.asarray(p["kernel"]),
                                  np.asarray(p["bias"]))))
        else:
            # BN-free submodules (e.g. SqueezeExcite) have no stats entry
            _walk_flax(p, stats.get(name, {}) if stats else {}, out)


@pytest.mark.slow
def test_mobilenetv2_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.small_nets import MobileNetV2

    rng = np.random.default_rng(5)
    x255 = rng.uniform(0, 255, (2, 160, 160, 3)).astype(np.float32)

    model = MobileNetV2(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)), train=False
    )
    # randomize BN running stats so eps/stat wiring is actually tested
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])
    stats = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
            if "var" in str(path[-1]) else
            (rng.standard_normal(x.shape) * 0.1).astype(np.float32)
        ),
        stats,
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    features, head = _torch_mobilenet(8)
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
