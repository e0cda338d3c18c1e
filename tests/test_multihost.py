"""Multi-host input helpers + defense stage on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.parallel.mesh import make_mesh
from nerfail_tpu.parallel.multihost import (
    host_local_to_global,
    initialize_distributed,
    process_view_slice,
)


def test_initialize_distributed_noop_single_process():
    initialize_distributed()  # must not raise
    initialize_distributed(num_processes=1)


def test_process_view_slice_single():
    s = process_view_slice(10)
    assert s == slice(0, 10)


def test_host_local_to_global_sharded():
    mesh = make_mesh(model_parallel=1)   # 8-way data
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = host_local_to_global(mesh, x)
    assert arr.shape == (16, 3)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data", None)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_view_slice_math_multi_process():
    """The per-process split must cover every view exactly once for any
    (n_views, process_count) — the mocked-multi-process exercise of the
    slicing the real pod run composes with host_local_to_global."""
    from nerfail_tpu.parallel.multihost import view_slice_for

    for n_views in (1, 7, 100, 400):
        for pc in (1, 2, 3, 4, 8):
            seen = []
            for pi in range(pc):
                s = view_slice_for(n_views, pc, pi)
                seen.extend(range(*s.indices(n_views)))
            assert seen == list(range(n_views)), (n_views, pc)


def test_replicate_global_matches_device_put():
    from nerfail_tpu.parallel.multihost import replicate_global

    mesh = make_mesh(model_parallel=1)
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    (out,) = jax.tree_util.tree_leaves(replicate_global(mesh, (x,)))
    assert out.sharding.spec == jax.sharding.PartitionSpec()
    np.testing.assert_array_equal(np.asarray(out), x)


def test_defense_finetune_improves_robust_accuracy(rng):
    from nerfail_tpu.config import ExperimentConfig
    from nerfail_tpu.models.classifiers import get_classifier
    from nerfail_tpu.pipeline import ArtifactLayout, Pipeline
    from nerfail_tpu.train.classifier_trainer import (
        init_classifier, make_classifier_eval_fn, train_classifier,
    )

    # toy 2-class task; "attack" = fixed offset noise on class 0
    n = 24
    clean = np.zeros((n, 16, 16, 3), np.float32)
    labels = np.zeros(n, np.int64)
    clean[n // 2:] = 255.0
    labels[n // 2:] = 1
    model = get_classifier("simple_cnn", num_classes=2)
    state = train_classifier(model, clean, labels, clean, labels,
                             epochs=6, batch_size=8, lr=1e-2)

    attacked = clean[: n // 2] + 120.0
    att_labels = labels[: n // 2]

    pipe = Pipeline(ArtifactLayout("/tmp/x"), ExperimentConfig())
    params, extra = pipe.stage_defense_finetune(
        model, state.params, state.extra, clean, labels,
        attacked, att_labels, epochs=6, batch_size=8, lr=1e-2,
    )
    eval_fn = make_classifier_eval_fn(model)
    logits = eval_fn(params, extra, jnp.asarray(attacked))
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == att_labels))
    assert acc >= 0.9
