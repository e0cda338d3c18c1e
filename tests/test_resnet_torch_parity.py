"""ResNet50 FULL logits parity vs an EXECUTED torch twin (upgrades the
stem+bottleneck numpy oracle in test_resnet_oracle.py to end-to-end).

The torchvision resnet50 topology (getModel('resnet50')) is stated in
torch.nn; flax params — with randomized BN running stats — are copied in
creation order and logits must match at an even input extent (the size
class where XLA SAME pads would misalign)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_mobilenet_torch_parity import _walk_flax


def _torch_resnet50(num_classes):
    import torch.nn as tn

    class Bottleneck(tn.Module):
        def __init__(self, inp, planes, stride=1, project=False):
            super().__init__()
            self.conv1 = tn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tn.BatchNorm2d(planes)
            self.conv2 = tn.Conv2d(planes, planes, 3, stride, 1,
                                   bias=False)
            self.bn2 = tn.BatchNorm2d(planes)
            self.conv3 = tn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tn.BatchNorm2d(planes * 4)
            self.down = None
            if project:
                self.down = tn.Sequential(
                    tn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                    tn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + r)

    layers = [
        tn.Conv2d(3, 64, 7, 2, 3, bias=False), tn.BatchNorm2d(64),
        tn.ReLU(), tn.MaxPool2d(3, 2, 1),
    ]
    c = 64
    for stage, n in enumerate((3, 4, 6, 3)):
        planes = 64 * 2 ** stage
        for b in range(n):
            stride = 2 if stage > 0 and b == 0 else 1
            layers.append(Bottleneck(c, planes, stride, project=(b == 0)))
            c = planes * 4
    return torch.nn.Sequential(*layers), torch.nn.Linear(c, num_classes)


@pytest.mark.slow
def test_resnet50_full_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.resnet import ResNet50

    rng = np.random.default_rng(23)
    x255 = rng.uniform(0, 255, (2, 128, 128, 3)).astype(np.float32)

    model = ResNet50(num_classes=8)
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

    features, head = _torch_resnet50(8)
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

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
