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


class TestPoseMath:
    """Unit tests for the rewritten [N, 3, 4] pose helpers."""

    def test_camera_frame_orthonormal_right_handed(self):
        from nerfail_tpu.data.llff import camera_frame

        rng = np.random.default_rng(3)
        back = rng.standard_normal((5, 3))
        up = rng.standard_normal((5, 3))
        pos = rng.standard_normal((5, 3))
        f = camera_frame(back, up, pos)
        assert f.shape == (5, 3, 4)
        R = f[..., :3]
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (5, 3, 3)),
            atol=1e-6,
        )
        # right-handed: x × y = z, and z is the normalized 'back' input
        np.testing.assert_allclose(
            np.cross(R[:, :, 0], R[:, :, 1]), R[:, :, 2], atol=1e-6
        )
        np.testing.assert_allclose(
            R[:, :, 2], back / np.linalg.norm(back, axis=-1, keepdims=True),
            atol=1e-6,
        )
        np.testing.assert_allclose(f[..., 3], pos, atol=1e-12)

    def test_recenter_maps_average_to_identity(self):
        from nerfail_tpu.data.llff import average_pose, recenter_poses

        rng = np.random.default_rng(4)
        back = rng.standard_normal((8, 3)) + np.array([0, 0, 3.0])
        pos = rng.standard_normal((8, 3))
        from nerfail_tpu.data.llff import camera_frame

        poses = camera_frame(back, np.array([0, 1.0, 0]), pos)
        rec = recenter_poses(poses)
        avg = average_pose(rec)
        np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-5)
        np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-5)

    def test_spiral_path_looks_at_focus(self):
        from nerfail_tpu.data.llff import spiral_path

        c2w = np.concatenate([np.eye(3), np.zeros((3, 1))], -1)
        rads = np.array([0.5, 0.4, 0.1])
        focal = 2.0
        path = spiral_path(c2w, np.array([0, 1.0, 0]), rads, focal, n=16)
        assert path.shape == (16, 3, 4)
        target = np.array([0, 0, -focal])
        back = path[:, :, 3] - target
        back /= np.linalg.norm(back, axis=-1, keepdims=True)
        np.testing.assert_allclose(path[:, :, 2], back, atol=1e-6)
        # orbit respects the per-axis radii in the central frame
        assert np.abs(path[:, 0, 3]).max() <= rads[0] + 1e-6
        assert np.abs(path[:, 1, 3]).max() <= rads[1] + 1e-6

    def test_nearest_point_to_rays(self):
        from nerfail_tpu.data.llff import _nearest_point_to_rays

        # rays through a common point from random directions
        rng = np.random.default_rng(5)
        pt = np.array([0.3, -0.2, 1.1])
        dirs = rng.standard_normal((12, 3))
        origins = pt - dirs * rng.uniform(1, 3, (12, 1))
        got = _nearest_point_to_rays(origins, dirs)
        np.testing.assert_allclose(got, pt, atol=1e-6)

    def test_spherify_unit_radius_and_lookat(self):
        from nerfail_tpu.data.llff import camera_frame, spherify_poses

        rng = np.random.default_rng(6)
        theta = np.linspace(0, 2 * np.pi, 10, endpoint=False)
        pos = np.stack(
            [3 * np.cos(theta) + 0.5, 3 * np.sin(theta) - 0.2,
             0.4 + 0.05 * rng.standard_normal(10)], -1,
        )
        center = np.array([0.5, -0.2, 0.4])
        poses = camera_frame(pos - center, np.array([0, 0, 1.0]), pos)
        bds = np.broadcast_to([2.0, 6.0], (10, 2))
        reset, render, bds2 = spherify_poses(poses, bds)
        # mean camera distance from the new origin ≈ 1
        rad = np.sqrt(np.mean(np.sum(reset[:, :, 3] ** 2, -1)))
        np.testing.assert_allclose(rad, 1.0, atol=1e-6)
        # render cameras look at the origin (back axis ∥ position)
        back = render[:, :, 2]
        posr = render[:, :, 3]
        posn = posr / np.linalg.norm(posr, axis=-1, keepdims=True)
        np.testing.assert_allclose(back, posn, atol=1e-6)
        np.testing.assert_allclose(bds2, bds / 3.0, rtol=0.05)


class TestLoaderModes:
    def test_resolution_targets_and_zflat(self, llff_dir):
        d, _ = llff_dir
        ll = load_llff_data(d, factor=1, width=16)
        assert ll.W == 16 and ll.H == 16
        ll2 = load_llff_data(d, factor=1, height=16)
        assert ll2.H == 16
        flat = load_llff_data(d, factor=1, path_zflat=True)
        assert flat.render_poses.shape[0] == 60      # half-length path
        # flat orbit: no z-radius component → constant height in the
        # average-camera frame (z offsets only from the backed-off center)
        z = flat.render_poses[:, :3, 3] @ np.array([0.0, 0.0, 1.0])
        assert np.ptp(z) < 1e-4
