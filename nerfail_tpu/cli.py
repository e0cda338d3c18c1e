"""Command-line entry points.

Mirrors the reference's script surface (README.md pipeline):

  python -m nerfail_tpu.cli train-nerf   --config configs/lego.txt
  python -m nerfail_tpu.cli extract-coords --config configs/lego.txt
  python -m nerfail_tpu.cli build-pointset --scene lego --p 3
  python -m nerfail_tpu.cli train-classifier --model_name inception
  python -m nerfail_tpu.cli attack --method NeRFail_S --label lego \
      --model_name inception --e 32 --a 2
  python -m nerfail_tpu.cli evaluate --method NeRFail_S --label lego ...

i.e. run_nerf.py / nerf_to_coord.py / create_index_and_dist.py +
dist_to_weight.py / model_train.py / attack_*.py / model_test.py — but all
driven through the Pipeline API and a single artifact layout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from nerfail_tpu.config import (
    AttackConfig,
    ExperimentConfig,
    PointSetConfig,
    SCENE_CLASSES,
    scene_class_index,
)
from nerfail_tpu.pipeline import ArtifactLayout, Pipeline


def _load_scene(cfg: ExperimentConfig):
    sc = cfg.scene
    if sc.dataset_type == "blender":
        from nerfail_tpu.data.blender import load_blender_data

        return load_blender_data(
            sc.datadir, half_res=sc.half_res, testskip=sc.testskip,
            train_dir=sc.train_dir,
        )
    if sc.dataset_type == "synthetic_box":
        from nerfail_tpu.data.synthetic import make_box_scene

        return make_box_scene()
    raise ValueError(f"dataset_type {sc.dataset_type} not wired in CLI yet")


def _build_cfg(args) -> ExperimentConfig:
    if args.config:
        return ExperimentConfig.from_file(args.config)
    return ExperimentConfig()


def cmd_train_nerf(args):
    cfg = _build_cfg(args)
    scene = _load_scene(cfg)
    pipe = Pipeline(ArtifactLayout(args.output), cfg)
    state = pipe.stage_train_nerf(
        scene, cfg.scene.expname, n_iters=args.n_iters
    )
    print(f"trained to step {state.step}")


def cmd_extract_coords(args):
    import jax.numpy as jnp

    from nerfail_tpu.pointset.extract import extract_coord_maps
    from nerfail_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from nerfail_tpu.train.nerf_trainer import create_train_state

    cfg = _build_cfg(args)
    scene = _load_scene(cfg)
    layout = ArtifactLayout(args.output)
    import jax

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.render, cfg.train
    )
    ckpt = latest_checkpoint(layout.nerf_logdir(cfg.scene.expname))
    if not ckpt:
        sys.exit("no NeRF checkpoint found — run train-nerf first")
    restored = load_checkpoint(
        ckpt, {"params": state.params, "opt_state": state.opt_state, "step": 0}
    )
    save_dir = layout.coords_dir(cfg.scene.expname)
    coords, rgbs = extract_coord_maps(
        restored["params"], cfg, scene.poses, scene.H, scene.W, scene.K,
        save_dir=save_dir, save_rgb=True,
    )
    print(f"saved {coords.shape[0]} coord maps to {save_dir}")


def cmd_render_only(args):
    """nerf_render_only.py parity: render train/test/val splits (and the
    spiral video) from the latest checkpoint into per-split dirs."""
    import jax

    from nerfail_tpu.render_path import render_path
    from nerfail_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from nerfail_tpu.train.nerf_trainer import create_train_state

    cfg = _build_cfg(args)
    scene = _load_scene(cfg)
    layout = ArtifactLayout(args.output)
    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.render, cfg.train
    )
    ckpt = latest_checkpoint(layout.nerf_logdir(cfg.scene.expname))
    if not ckpt:
        sys.exit("no NeRF checkpoint found — run train-nerf first")
    restored = load_checkpoint(
        ckpt, {"params": state.params, "opt_state": state.opt_state, "step": 0}
    )
    step = int(restored["step"])
    splits = {"train": scene.i_train, "val": scene.i_val, "test": scene.i_test}
    for split, ids in splits.items():
        out_dir = os.path.join(
            layout.root, "renders", cfg.scene.expname,
            f"renderonly_{split}_{step - 1:06d}",
        )
        render_path(
            restored["params"], cfg, scene.poses[ids], scene.H, scene.W,
            scene.K, save_dir=out_dir, render_factor=args.render_factor,
            save_coords=not args.only_render_img,
        )
        print(f"{split}: {len(ids)} renders -> {out_dir}")
    if args.video:
        video = os.path.join(
            layout.root, "renders", cfg.scene.expname, "spiral.mp4"
        )
        render_path(
            restored["params"], cfg, scene.render_poses, scene.H, scene.W,
            scene.K, render_factor=max(args.render_factor, 2),
            video_path=video,
        )
        print(f"video -> {video}")


def cmd_invert_disturbance(args):
    from nerfail_tpu.utils.disturbance import invert_disturbance_file

    invert_disturbance_file(args.input, args.out)
    print(f"wrote {args.out}")


def cmd_train_classifier(args):
    from nerfail_tpu.data.datasets import load_classifier_split
    from nerfail_tpu.models.classifiers import (
        classifier_input_size, get_classifier,
    )
    from nerfail_tpu.train.classifier_trainer import train_classifier

    size = classifier_input_size(args.model_name)
    train = load_classifier_split(args.datadir, "train", size)
    val = load_classifier_split(args.datadir, "val", size)
    model = get_classifier(args.model_name)
    layout = ArtifactLayout(args.output)
    state = train_classifier(
        model, train.images, train.labels, val.images, val.labels,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        logdir=layout.classifier_dir(args.model_name),
        log_fn=lambda e, m: print(f"epoch {e}: {m}"),
    )
    print("done")


def cmd_attack(args):
    import jax.numpy as jnp

    from nerfail_tpu.attacks.forward import make_classifier_logits_fn
    from nerfail_tpu.data.datasets import scene_views_dataset
    from nerfail_tpu.models.classifiers import (
        classifier_input_size, get_classifier,
    )
    from nerfail_tpu.train.classifier_trainer import load_classifier

    cfg = _build_cfg(args)
    scene = _load_scene(cfg)
    layout = ArtifactLayout(args.output)
    pipe = Pipeline(layout, cfg)

    acfg = AttackConfig(
        method=args.method, eps=args.e, a=args.a, m1=args.m1, m2=args.m2,
        attack_epochs=args.attack_epochs, targeted=args.targeted,
        target_label=args.attack_target_label_int,
        base_mask_number=args.base_mask_image_number,
    )

    model = get_classifier(args.model_name)
    size = classifier_input_size(args.model_name)
    params, extra = load_classifier(
        layout.classifier_best(args.model_name), model, size
    )
    logits_fn = make_classifier_logits_fn(model, params, extra)

    # NeRF state for the point-set stage
    from nerfail_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
    from nerfail_tpu.train.nerf_trainer import create_train_state
    import jax

    state = create_train_state(
        jax.random.PRNGKey(0), cfg.model, cfg.render, cfg.train
    )
    ckpt = latest_checkpoint(layout.nerf_logdir(args.label))
    if ckpt:
        restored = load_checkpoint(
            ckpt,
            {"params": state.params, "opt_state": state.opt_state, "step": 0},
        )
        state_params = restored["params"]
    else:
        sys.exit("no NeRF checkpoint — run train-nerf first")

    class _S:  # minimal state shim for Pipeline.stage_pointset
        params = state_params

    splits = {
        "test": scene.i_test, "train": scene.i_train, "val": scene.i_val,
    }
    tables = None
    mask_images = None
    if args.method in ("NeRFail", "NeRFail_S"):
        tables_all, S = pipe.stage_pointset(
            _S, scene, args.label, splits, p=acfg.base_mask_number
        )
        tables = tables_all["test"]
        from nerfail_tpu.config import mask_views

        mv = np.asarray(mask_views(args.label, acfg.base_mask_number))
        mask_images = scene_views_dataset(scene.images[scene.i_test[mv]])

    ori = scene_views_dataset(scene.images[scene.i_test])
    result = pipe.stage_attack(
        args.method, acfg, args.label, args.model_name, logits_fn, size,
        ori, tables=tables, mask_images=mask_images,
        epochs=args.attack_epochs, indices=list(range(len(scene.i_test))),
    )
    print(f"best attack acc: {result.best_attack_acc:.3f}")

    attacked, _ = pipe.render_attacked(
        args.method, result.delta, ori, tables, acfg, size, logits_fn
    )
    report = pipe.stage_eval(
        logits_fn, attacked, ori, args.label,
        report_path=layout.eval_report_path(
            layout.attack_dir(args.model_name, args.label, args.method, acfg),
            "test",
        ),
        resize_to=size,
    )
    print(json.dumps(report, indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="nerfail_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--config", default=None)
    common.add_argument("--output", default="./output")

    sp = sub.add_parser("train-nerf", parents=[common])
    sp.add_argument("--n_iters", type=int, default=None)
    sp.set_defaults(fn=cmd_train_nerf)

    sp = sub.add_parser("extract-coords", parents=[common])
    sp.set_defaults(fn=cmd_extract_coords)

    sp = sub.add_parser("render-only", parents=[common])
    sp.add_argument("--render_factor", type=int, default=0)
    sp.add_argument("--only_render_img", action="store_true")
    sp.add_argument("--video", action="store_true")
    sp.set_defaults(fn=cmd_render_only)

    sp = sub.add_parser("invert-disturbance")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_invert_disturbance)

    sp = sub.add_parser("train-classifier", parents=[common])
    sp.add_argument("--model_name", required=True)
    sp.add_argument("--datadir", default="data/nerf_synthetic")
    sp.add_argument("--epochs", type=int, default=200)
    sp.add_argument("--batch_size", type=int, default=16)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.set_defaults(fn=cmd_train_classifier)

    sp = sub.add_parser("attack", parents=[common])
    sp.add_argument("--method", default="NeRFail",
                    choices=["NeRFail", "NeRFail_S", "IGSM_2D", "Universal_2D"])
    sp.add_argument("--label", default="lego", choices=list(SCENE_CLASSES))
    sp.add_argument("--model_name", default="inception")
    sp.add_argument("--e", type=float, default=32.0)
    sp.add_argument("--a", type=float, default=2.0)
    sp.add_argument("--m1", type=float, default=8.0)
    sp.add_argument("--m2", type=float, default=100.0)
    sp.add_argument("--attack_epochs", type=int, default=100)
    sp.add_argument("--targeted_attack", dest="targeted", action="store_true")
    sp.add_argument("--attack_target_label_int", type=int, default=0)
    sp.add_argument("--base_mask_image_number", type=int, default=3)
    sp.set_defaults(fn=cmd_attack)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
