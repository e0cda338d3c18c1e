"""End-to-end mini-scene integration test (SURVEY.md §4d): scene → NeRF →
pts_max → 8-NN tables → classifier → NeRFail-S attack → ASR eval, all on
CPU at toy scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfail_tpu.config import (
    AttackConfig, ExperimentConfig, NeRFModelConfig, PointSetConfig,
    RenderConfig, TrainConfig,
)
from nerfail_tpu.data.blender import white_background_composite
from nerfail_tpu.data.datasets import rgba_to_white_rgb, scene_views_dataset
from nerfail_tpu.data.synthetic import make_box_scene
from nerfail_tpu.train.nerf_trainer import eval_psnr, train_nerf


@pytest.fixture(scope="module")
def mini_world():
    cfg = ExperimentConfig(
        model=NeRFModelConfig(netdepth=2, netwidth=64, multires=6,
                              multires_views=2),
        render=RenderConfig(N_samples=16, N_importance=16, chunk=1024),
        train=TrainConfig(N_rand=256, precrop_iters=20, i_print=10 ** 9),
    )
    scene = make_box_scene(n_train=10, n_val=1, n_test=3, H=24, W=24)
    targets = white_background_composite(scene.images)
    state = train_nerf(
        cfg, targets, scene.poses, scene.K, scene.i_train, n_iters=400
    )
    return cfg, scene, targets, state


def test_nerf_learns(mini_world):
    cfg, scene, targets, state = mini_world
    psnr = eval_psnr(state, cfg, targets, scene.poses, scene.K, scene.i_test)
    assert psnr > 14.0, f"mini NeRF failed to converge: {psnr:.1f} dB"


def test_full_attack_chain(mini_world):
    cfg, scene, targets, state = mini_world
    from nerfail_tpu.attacks.forward import (
        make_classifier_logits_fn, splat_attack_forward, zero_init_mask,
    )
    from nerfail_tpu.attacks.nerfail_s import nerfail_s_attack
    from nerfail_tpu.eval.harness import evaluate_attack
    from nerfail_tpu.models.classifiers import get_classifier
    from nerfail_tpu.pointset.extract import (
        build_neighbor_tables, build_point_set, extract_coord_maps,
    )
    from nerfail_tpu.train.classifier_trainer import train_classifier

    # point set from 2 mask views, tables for 2 target views
    mask_ids = scene.i_test[:2]
    view_ids = scene.i_test[:2]
    coords_mask, _ = extract_coord_maps(
        state.params, cfg, scene.poses[mask_ids], scene.H, scene.W, scene.K
    )
    S = build_point_set(coords_mask)
    assert S.shape == (2 * 24 * 24, 3)
    w, idx = build_neighbor_tables(
        coords_mask[:2], S, PointSetConfig(s_chunk=256, q_chunk=1024)
    )
    assert w.shape == (2, 24, 24, 8)
    # self-view pixels: nearest neighbor is the pixel's own point → weight
    # should be strongly concentrated
    assert float(w.max()) > 0.3

    # classifier: box class vs noise class
    box = rgba_to_white_rgb(scene_views_dataset(scene.images))
    rng = np.random.default_rng(0)
    noise = rng.uniform(0, 255, box.shape).astype(np.float32)
    X = np.concatenate([box, noise])
    y = np.concatenate(
        [np.zeros(len(box), np.int64), np.ones(len(noise), np.int64)]
    )
    model = get_classifier("simple_cnn", num_classes=2)
    cstate = train_classifier(model, X, y, X, y, epochs=5, batch_size=8,
                              lr=1e-2)
    logits_fn = make_classifier_logits_fn(model, cstate.params, cstate.extra)

    ori = scene_views_dataset(scene.images[view_ids])
    delta0 = np.asarray(
        zero_init_mask(jnp.asarray(scene_views_dataset(scene.images[mask_ids])))
    )
    acfg = AttackConfig(eps=32.0, a=4.0, batch_size=2)
    res = nerfail_s_attack(
        delta0, w, idx, ori, np.zeros(2, np.int64), logits_fn, acfg,
        resize_to=None, epochs=10,
    )
    # perturbation respects the budget and the attack made progress
    assert np.abs(res.delta[..., :3]).max() <= 32.0 + 1e-4
    assert len(res.history) == 10

    out = splat_attack_forward(
        jnp.asarray(res.delta.reshape(-1, 4)), jnp.asarray(w),
        jnp.asarray(idx), jnp.asarray(ori), logits_fn,
        eps=32.0, resize_to=None,
    )
    attacked = rgba_to_white_rgb(np.asarray(out["attacked_rgba"]))
    report = evaluate_attack(
        logits_fn, attacked, rgba_to_white_rgb(ori), true_label=0
    )
    assert report["e_max"] <= 32.0 + 1e-3
    assert 0.0 <= report["asr"] <= 1.0
    assert report["psnr_avg"] > 15.0
