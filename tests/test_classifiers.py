"""Classifier-zoo smoke tests: init + forward shapes + trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfail_tpu.models.classifiers import (
    CLASSIFIER_REGISTRY,
    classifier_input_size,
    get_classifier,
)
from nerfail_tpu.train.classifier_trainer import (
    init_classifier,
    make_classifier_eval_fn,
    make_classifier_train_step,
    train_classifier,
)

# CPU-affordable smoke set; the heavy 299² towers get a single shared test.
# "my_model" is the 800²-pinned reference MyCNN; smoke-test the
# resolution-flexible redesign under its own name instead
LIGHT = ["simple_cnn", "alexnet", "vgg16"]


class TestRegistry:
    def test_known_names(self):
        for name in [
            "inception", "incresv2", "resnet50", "vgg16", "alexnet",
            "mobilenet_v2", "densenet121", "efficientnet_b0", "vit_b_16",
            "mixer_b", "my_model", "my_cnn", "simple_cnn",
        ]:
            assert name in CLASSIFIER_REGISTRY

    def test_input_sizes(self):
        assert classifier_input_size("vit_b_16") == 224
        assert classifier_input_size("mixer_b") == 224
        assert classifier_input_size("inception") == 299
        assert classifier_input_size("my_model") is None
        assert classifier_input_size("simple_cnn") is None

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_classifier("nope")


@pytest.mark.parametrize("name", LIGHT)
def test_light_models_forward(name):
    model = get_classifier(name, num_classes=8)
    size = classifier_input_size(name) or 64
    size = min(size, 64)  # shrink for CPU test speed (all are conv/pool nets)
    x = jnp.ones((2, size, size, 3)) * 128.0
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 8)


def test_resnet_bn_forward_and_mutation():
    model = get_classifier("resnet50")
    x = jnp.ones((1, 64, 64, 3)) * 100.0
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (1, 8)


def test_inception_aux_logits():
    model = get_classifier("inception")
    x = jnp.ones((1, 299, 299, 3)) * 100.0
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8)
    out_t, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert isinstance(out_t, tuple) and out_t[0].shape == (1, 8) \
        and out_t[1].shape == (1, 8)


def test_train_classifier_learns_toy_task(rng):
    """SimpleCNN separates two constant-color classes in a few epochs."""
    n = 32
    imgs = np.zeros((n, 32, 32, 3), np.float32)
    labels = np.zeros(n, np.int64)
    imgs[n // 2:] = 255.0
    labels[n // 2:] = 1
    model = get_classifier("simple_cnn", num_classes=2)
    state = train_classifier(
        model, imgs, labels, imgs, labels,
        epochs=8, batch_size=8, lr=1e-2, seed=0,
    )
    eval_fn = make_classifier_eval_fn(model)
    logits = eval_fn(state.params, state.extra, jnp.asarray(imgs))
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == labels))
    assert acc == 1.0
