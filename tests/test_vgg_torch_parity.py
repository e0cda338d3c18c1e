"""VGG16 FULL logits parity vs an EXECUTED torch twin (upgrades the
two-stage numpy oracle in test_vgg_oracle.py to end-to-end validation —
adaptive 7×7 pool, NCHW flatten order, and classifier stack included)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_vgg16(num_classes):
    import torch.nn as tn

    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")
    layers, c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tn.MaxPool2d(2, 2))
        else:
            layers += [tn.Conv2d(c, v, 3, padding=1), tn.ReLU()]
            c = v
    features = tn.Sequential(*layers)
    classifier = tn.Sequential(
        tn.Linear(512 * 49, 4096), tn.ReLU(), tn.Dropout(),
        tn.Linear(4096, 4096), tn.ReLU(), tn.Dropout(),
        tn.Linear(4096, num_classes),
    )
    return features, classifier


@pytest.mark.slow
def test_vgg16_full_logits_match_executed_torch():
    from nerfail_tpu.models.classifiers.vgg import VGG16

    rng = np.random.default_rng(21)
    x255 = rng.uniform(0, 255, (1, 299, 299, 3)).astype(np.float32)

    model = VGG16(num_classes=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False
    )
    p = variables["params"]
    got = np.asarray(model.apply(variables, jnp.asarray(x255), train=False))

    features, classifier = _torch_vgg16(8)
    t_convs = [m for m in features if isinstance(m, torch.nn.Conv2d)]
    t_lins = [m for m in classifier if isinstance(m, torch.nn.Linear)]
    with torch.no_grad():
        for i, tm in enumerate(t_convs):
            fp = p[f"Conv_{i}"]
            tm.weight.copy_(torch.from_numpy(
                np.asarray(fp["kernel"]).transpose(3, 2, 0, 1).copy()
            ))
            tm.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
        for i, tm in enumerate(t_lins):
            fp = p[f"Dense_{i}"]
            tm.weight.copy_(torch.from_numpy(
                np.asarray(fp["kernel"]).T.copy()
            ))
            tm.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
        features.eval(), classifier.eval()
        xt = torch.from_numpy(
            (x255 / 127.5 - 1.0).transpose(0, 3, 1, 2).copy()
        )
        y = features(xt)
        y = torch.nn.functional.adaptive_avg_pool2d(y, (7, 7))
        want = classifier(y.flatten(1)).numpy()

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
