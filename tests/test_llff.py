"""LLFF loader round-trip + NDC training end-to-end (mini forward scene)."""

import numpy as np
import pytest

from nerfail_tpu.config import (
    ExperimentConfig, NeRFModelConfig, RenderConfig, SceneConfig, TrainConfig,
)
from nerfail_tpu.data.load import load_scene
from nerfail_tpu.data.llff import load_llff_data
from nerfail_tpu.data.synthetic import make_forward_scene, write_llff_format


@pytest.fixture(scope="module")
def llff_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("llff_scene")
    scene = make_forward_scene(n_train=9, n_val=0, n_test=3, H=32, W=32)
    write_llff_format(scene, str(d))
    return str(d), scene


class TestLoader:
    def test_round_trip_shapes(self, llff_dir):
        d, scene = llff_dir
        ll = load_llff_data(d, factor=1)
        assert ll.images.shape == (12, 32, 32, 3)
        assert ll.poses.shape == (12, 3, 5)
        assert ll.H == 32 and ll.W == 32
        assert ll.bds.shape == (12, 2)
        assert np.all(ll.bds > 0)
        assert 0 <= ll.i_test < 12
        # recentering puts the average camera at the origin looking -z
        mean_t = ll.poses[:, :3, 3].mean(0)
        np.testing.assert_allclose(mean_t, 0.0, atol=1e-4)

    def test_load_scene_resolves_ndc_geometry(self, llff_dir):
        d, _ = llff_dir
        cfg = ExperimentConfig(
            scene=SceneConfig(dataset_type="llff", datadir=d, factor=1,
                              llffhold=4),
        )
        scene, cfg2 = load_scene(cfg)
        assert cfg2.render.ndc is True
        assert cfg2.render.near == 0.0 and cfg2.render.far == 1.0
        assert cfg2.render.white_bkgd is False
        assert scene.poses.shape == (12, 4, 4)
        np.testing.assert_array_equal(scene.i_test, [0, 4, 8])
        np.testing.assert_array_equal(scene.i_val, scene.i_test)
        assert len(scene.i_train) == 9

    def test_load_scene_no_ndc_uses_bounds(self, llff_dir):
        d, _ = llff_dir
        cfg = ExperimentConfig(
            scene=SceneConfig(dataset_type="llff", datadir=d, factor=1,
                              llffhold=4, no_ndc=True),
        )
        _, cfg2 = load_scene(cfg)
        assert cfg2.render.ndc is False
        assert 0 < cfg2.render.near < cfg2.render.far


class TestNDCTraining:
    def test_train_converges_forward_facing(self, llff_dir):
        """A few hundred NDC train steps must beat the all-mean-color
        baseline by a clear margin (the r1 gap: ndc_rays existed but the
        jitted train step had no NDC branch)."""
        import jax

        from nerfail_tpu.train.nerf_trainer import eval_psnr, train_nerf

        d, _ = llff_dir
        cfg = ExperimentConfig(
            model=NeRFModelConfig(netdepth=2, netwidth=64),
            render=RenderConfig(N_samples=16, N_importance=16, chunk=1024),
            train=TrainConfig(N_rand=256, precrop_iters=0),
            scene=SceneConfig(dataset_type="llff", datadir=d, factor=1,
                              llffhold=4),
        )
        scene, cfg = load_scene(cfg)
        assert cfg.render.ndc

        state = train_nerf(
            cfg, scene.images, scene.poses, scene.K, scene.i_train,
            n_iters=400,
        )
        test_imgs = scene.images[scene.i_test]
        psnr = eval_psnr(
            state, cfg, test_imgs, scene.poses[scene.i_test], scene.K,
            np.arange(2),
        )
        # baseline: predict the mean color everywhere
        base_mse = float(np.mean((test_imgs - test_imgs.mean()) ** 2))
        base_psnr = -10.0 * np.log10(base_mse)
        assert psnr > base_psnr + 4.0, (psnr, base_psnr)
