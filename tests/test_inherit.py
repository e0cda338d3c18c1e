"""Full-testset eval harness + perturbation-inheritance round-trip
(model_test.py:41-421 per-class report, transfer_files.py + step-1 re-test
chained through Pipeline.stage_inherit)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nerfail_tpu.config import (
    AttackConfig, ExperimentConfig, NeRFModelConfig, PointSetConfig,
    RenderConfig, TrainConfig,
)
from nerfail_tpu.eval.harness import evaluate_testset


class TestEvaluateTestset:
    def _toy(self, rng, n_per=4, C=4, S=8):
        imgs, labels = [], []
        for c in range(C):
            base = np.full((n_per, S, S, 3), 40.0 * c + 20.0, np.float32)
            imgs.append(base)
            labels.append(np.full(n_per, c, np.int64))
        images = np.concatenate(imgs)
        labels = np.concatenate(labels)

        def logits_fn(x):
            # mean intensity → class index mapping makes this ~perfect
            mean = jnp.mean(x.reshape(x.shape[0], -1), axis=-1)
            centers = jnp.asarray([40.0 * c + 20.0 for c in range(C)])
            return -((mean[:, None] - centers[None]) ** 2) / 100.0

        return images, labels, logits_fn

    def test_per_class_report(self, rng):
        images, labels, logits_fn = self._toy(rng)
        rep = evaluate_testset(logits_fn, images, labels, num_classes=4)
        assert rep["overall_acc"] == 1.0
        assert set(rep["per_class"]) == {"0", "1", "2", "3"}
        for c in rep["per_class"].values():
            assert c["acc"] == 1.0 and c["n"] == 4
            assert c["loss"] >= 0.0

    def test_attacked_class_block(self, rng, tmp_path):
        images, labels, logits_fn = self._toy(rng)
        # "attack" class 1: shift its images up into class 2's intensity
        att = images.copy()
        m = labels == 1
        att[m] += 40.0
        ann_dir = str(tmp_path / "ann")
        rep = evaluate_testset(
            logits_fn, att, labels, attacked_class=1,
            original_images=images[m], num_classes=4,
            annotate_dir=ann_dir,
            indices=np.arange(len(labels)),
        )
        assert rep["asr"] == 1.0
        assert rep["per_class"]["1"]["acc"] == 0.0
        assert rep["per_class"]["0"]["acc"] == 1.0
        assert rep["misclass_to_pct"].get("2") == 100.0
        assert rep["e_max"] == 40.0
        # annotated dump wrote one PNG per attacked image
        assert len(os.listdir(ann_dir)) == int(m.sum())


@pytest.mark.slow
class TestInheritanceLoop:
    def test_stage_inherit_round_trip(self, tmp_path, rng):
        """attack δ → retrain NeRF on attacked train views → step-1 renders
        → eval report: SURVEY §3.5's round-trip in one Pipeline call."""
        from nerfail_tpu.attacks.forward import make_classifier_logits_fn
        from nerfail_tpu.data.blender import white_background_composite
        from nerfail_tpu.data.datasets import (
            rgba_to_white_rgb, scene_views_dataset,
        )
        from nerfail_tpu.data.synthetic import make_box_scene
        from nerfail_tpu.models.classifiers import get_classifier
        from nerfail_tpu.pipeline import ArtifactLayout, Pipeline
        from nerfail_tpu.pointset.extract import (
            build_neighbor_tables, build_point_set, extract_coord_maps,
        )
        from nerfail_tpu.train.classifier_trainer import train_classifier
        from nerfail_tpu.train.nerf_trainer import train_nerf

        cfg = ExperimentConfig(
            model=NeRFModelConfig(netdepth=2, netwidth=64, multires=6,
                                  multires_views=2),
            render=RenderConfig(N_samples=16, N_importance=16, chunk=1024),
            train=TrainConfig(N_rand=256, precrop_iters=20,
                              i_print=10 ** 9, i_weights=10 ** 9),
        )
        scene = make_box_scene(n_train=6, n_val=1, n_test=2, H=20, W=20)
        targets = white_background_composite(scene.images)
        state = train_nerf(
            cfg, targets, scene.poses, scene.K, scene.i_train, n_iters=300
        )

        # point-set tables for train + test + val
        mask_ids = scene.i_test[:2]
        coords_mask, _ = extract_coord_maps(
            state.params, cfg, scene.poses[mask_ids], scene.H, scene.W,
            scene.K,
        )
        S = build_point_set(coords_mask)
        pcfg = PointSetConfig(s_chunk=200, q_chunk=512)
        tables = {}
        for split, ids in (("train", scene.i_train), ("val", scene.i_val),
                           ("test", scene.i_test)):
            coords, _ = extract_coord_maps(
                state.params, cfg, scene.poses[ids], scene.H, scene.W,
                scene.K,
            )
            tables[split] = build_neighbor_tables(coords, S, pcfg)

        # tiny classifier
        box = rgba_to_white_rgb(scene_views_dataset(scene.images))
        noise = rng.uniform(0, 255, box.shape).astype(np.float32)
        X = np.concatenate([box, noise])
        y = np.concatenate(
            [np.zeros(len(box), np.int64), np.ones(len(noise), np.int64)]
        )
        model = get_classifier("simple_cnn", num_classes=2)
        cstate = train_classifier(model, X, y, X, y, epochs=4, batch_size=8,
                                  lr=1e-2)
        logits_fn = make_classifier_logits_fn(
            model, cstate.params, cstate.extra
        )

        # a fixed perturbation on the mask views (skip the attack loop)
        mask_imgs = scene_views_dataset(scene.images[mask_ids])
        delta = np.zeros_like(mask_imgs)
        delta[..., :3] = rng.uniform(-20, 20, mask_imgs[..., :3].shape)
        delta[..., 3] = mask_imgs[..., 3]

        layout = ArtifactLayout(str(tmp_path))
        # the retrain resumes from nothing: give the pipeline the scene cfg
        pipe = Pipeline(layout, cfg)
        acfg = AttackConfig(eps=32.0, a=2.0, attack_epochs=2)
        new_state, reports = pipe.stage_inherit(
            scene, "lego", "NeRFail_S", acfg, "my_model", logits_fn, None,
            delta, tables, n_iters=200,
        )
        assert new_state.step == 200
        # step-0 train artifacts + step-1 renders + eval report exist
        step0_train = layout.attack_dir(
            "my_model", "lego", "NeRFail_S", acfg, step=0, split="train"
        )
        step1_test = layout.attack_dir(
            "my_model", "lego", "NeRFail_S", acfg, step=1, split="test"
        )
        assert os.path.exists(os.path.join(step0_train, "r_0.png"))
        assert os.path.exists(os.path.join(step1_test, "000.png"))
        assert "test" in reports
        rep = reports["test"]
        assert 0.0 <= rep["asr"] <= 1.0
        assert rep["psnr_avg"] > 5.0
        report_file = layout.eval_report_path(
            layout.attack_dir("my_model", "lego", "NeRFail_S", acfg, step=1),
            "test",
        )
        assert os.path.exists(report_file)
