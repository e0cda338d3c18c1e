"""Inception-V3 FULL logits parity vs an EXECUTED torch twin.

The reference's DEFAULT attack target (getModel('inception') →
torchvision Inception3, GetModel.py:15-17) gets the strongest validation
tier: the complete torchvision topology (stem → 3×A → B → 4×C → D →
2×E → pool → fc; aux head is train-only and eval never builds it) stated
in torch.nn, flax params with randomized BN running stats copied in
creation order, allclose logits at 299². Upgrades the stem+Mixed-5b
numpy oracle in test_inception_oracle.py to end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_mobilenet_torch_parity import _walk_flax


def _torch_inception(num_classes):
    import torch.nn as tn
    import torch.nn.functional as F

    def bc(inp, out, k, stride=1, pad=0):
        return tn.Sequential(
            tn.Conv2d(inp, out, k, stride, pad, bias=False),
            tn.BatchNorm2d(out, eps=1e-3), tn.ReLU(),
        )

    class MixA(tn.Module):
        def __init__(self, c, pool):
            super().__init__()
            self.b1 = bc(c, 64, 1)
            self.b5_1, self.b5_2 = bc(c, 48, 1), bc(48, 64, 5, pad=2)
            self.b3_1 = bc(c, 64, 1)
            self.b3_2 = bc(64, 96, 3, pad=1)
            self.b3_3 = bc(96, 96, 3, pad=1)
            self.bp = bc(c, pool, 1)

        def forward(self, x):
            p = F.avg_pool2d(x, 3, 1, 1)
            return torch.cat([
                self.b1(x), self.b5_2(self.b5_1(x)),
                self.b3_3(self.b3_2(self.b3_1(x))), self.bp(p)], 1)

    class MixB(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.b3 = bc(c, 384, 3, 2)
            self.bd_1 = bc(c, 64, 1)
            self.bd_2 = bc(64, 96, 3, pad=1)
            self.bd_3 = bc(96, 96, 3, 2)

        def forward(self, x):
            return torch.cat([
                self.b3(x), self.bd_3(self.bd_2(self.bd_1(x))),
                F.max_pool2d(x, 3, 2)], 1)

    class MixC(tn.Module):
        def __init__(self, c, c7):
            super().__init__()
            self.b1 = bc(c, 192, 1)
            self.b7_1 = bc(c, c7, 1)
            self.b7_2 = bc(c7, c7, (1, 7), pad=(0, 3))
            self.b7_3 = bc(c7, 192, (7, 1), pad=(3, 0))
            self.bd_1 = bc(c, c7, 1)
            self.bd_2 = bc(c7, c7, (7, 1), pad=(3, 0))
            self.bd_3 = bc(c7, c7, (1, 7), pad=(0, 3))
            self.bd_4 = bc(c7, c7, (7, 1), pad=(3, 0))
            self.bd_5 = bc(c7, 192, (1, 7), pad=(0, 3))
            self.bp = bc(c, 192, 1)

        def forward(self, x):
            p = F.avg_pool2d(x, 3, 1, 1)
            return torch.cat([
                self.b1(x), self.b7_3(self.b7_2(self.b7_1(x))),
                self.bd_5(self.bd_4(self.bd_3(self.bd_2(self.bd_1(x))))),
                self.bp(p)], 1)

    class MixD(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.b3_1, self.b3_2 = bc(c, 192, 1), bc(192, 320, 3, 2)
            self.b7_1 = bc(c, 192, 1)
            self.b7_2 = bc(192, 192, (1, 7), pad=(0, 3))
            self.b7_3 = bc(192, 192, (7, 1), pad=(3, 0))
            self.b7_4 = bc(192, 192, 3, 2)

        def forward(self, x):
            return torch.cat([
                self.b3_2(self.b3_1(x)),
                self.b7_4(self.b7_3(self.b7_2(self.b7_1(x)))),
                F.max_pool2d(x, 3, 2)], 1)

    class MixE(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.b1 = bc(c, 320, 1)
            self.b3_1 = bc(c, 384, 1)
            self.b3_2a = bc(384, 384, (1, 3), pad=(0, 1))
            self.b3_2b = bc(384, 384, (3, 1), pad=(1, 0))
            self.bd_1 = bc(c, 448, 1)
            self.bd_2 = bc(448, 384, 3, pad=1)
            self.bd_3a = bc(384, 384, (1, 3), pad=(0, 1))
            self.bd_3b = bc(384, 384, (3, 1), pad=(1, 0))
            self.bp = bc(c, 192, 1)

        def forward(self, x):
            b3 = self.b3_1(x)
            bd = self.bd_2(self.bd_1(x))
            p = F.avg_pool2d(x, 3, 1, 1)
            return torch.cat([
                self.b1(x),
                torch.cat([self.b3_2a(b3), self.b3_2b(b3)], 1),
                torch.cat([self.bd_3a(bd), self.bd_3b(bd)], 1),
                self.bp(p)], 1)

    class Net(tn.Module):
        def __init__(self):
            super().__init__()
            self.s1 = bc(3, 32, 3, 2)
            self.s2 = bc(32, 32, 3)
            self.s3 = bc(32, 64, 3, pad=1)
            self.s4 = bc(64, 80, 1)
            self.s5 = bc(80, 192, 3)
            self.a1, self.a2, self.a3 = MixA(192, 32), MixA(256, 64), \
                MixA(288, 64)
            self.b = MixB(288)
            self.c1, self.c2 = MixC(768, 128), MixC(768, 160)
            self.c3, self.c4 = MixC(768, 160), MixC(768, 192)
            self.d = MixD(768)
            self.e1, self.e2 = MixE(1280), MixE(2048)
            self.fc = tn.Linear(2048, num_classes)

        def forward(self, x):
            import torch.nn.functional as F
            x = self.s2(self.s1(x))
            x = F.max_pool2d(self.s3(x), 3, 2)
            x = F.max_pool2d(self.s5(self.s4(x)), 3, 2)
            for m in (self.a1, self.a2, self.a3, self.b, self.c1,
                      self.c2, self.c3, self.c4, self.d, self.e1,
                      self.e2):
                x = m(x)
            return self.fc(x.mean(dim=(2, 3)))

    return Net()


@pytest.mark.slow
def test_inception_v3_full_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.inception_v3 import InceptionV3

    rng = np.random.default_rng(29)
    x255 = rng.uniform(0, 255, (1, 299, 299, 3)).astype(np.float32)

    model = InceptionV3(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False
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

    net = _torch_inception(8)
    pairs = []
    _walk_flax(variables["params"], variables["batch_stats"], pairs)
    t_convs = [m for m in net.modules() if isinstance(m, torch.nn.Conv2d)]
    t_bns = [m for m in net.modules()
             if isinstance(m, torch.nn.BatchNorm2d)]
    with torch.no_grad():
        ci = bi = 0
        for kind, v in pairs:
            if kind == "conv":
                kern, cb = v
                t_convs[ci].weight.copy_(
                    torch.from_numpy(kern.transpose(3, 2, 0, 1).copy())
                )
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
                net.fc.weight.copy_(torch.from_numpy(k.T.copy()))
                net.fc.bias.copy_(torch.from_numpy(b))
        assert ci == len(t_convs) and bi == len(t_bns)
        net.eval()
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        want = net(xt).numpy()

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
