"""Pipeline layout grammar + dataset round-trip tests."""

import os

import numpy as np
import pytest

from nerfail_tpu.config import AttackConfig, mask_views, scene_class_index
from nerfail_tpu.pipeline import ArtifactLayout, save_attacked_images
from nerfail_tpu.data.synthetic import make_box_scene, write_blender_format
from nerfail_tpu.data.blender import load_blender_data


class TestLayoutGrammar:
    """Directory names must match the reference byte-for-byte
    (attack_NeRFail_S.py:97-106, transfer_files.py:33-57)."""

    def test_nerfail_s(self):
        lay = ArtifactLayout("./output")
        acfg = AttackConfig(
            eps=32, a=2, attack_epochs=100, base_mask_number=3
        )
        d = lay.attack_dir("inception", "lego", "NeRFail_S", acfg,
                           step=0, split="test")
        assert d == os.path.join(
            "./output", "inception", "attack", "lego",
            "NeRFail_S_3P_100_to_n_e_32_a_2", "test",
        )

    def test_nerfail_targeted(self):
        lay = ArtifactLayout("./output")
        acfg = AttackConfig(
            eps=32, m1=8, m2=100, attack_epochs=100, base_mask_number=3,
            targeted=True, target_label=5,
        )
        d = lay.attack_dir("vgg16", "ship", "NeRFail", acfg, step=1)
        assert d == os.path.join(
            "./output", "vgg16", "nerf", "ship",
            "NeRFail_3P_100_to_5_e_32_m_8_100",
        )

    def test_igsm_and_uap(self):
        lay = ArtifactLayout("./o")
        acfg = AttackConfig(eps=16, a=4, m1=0, m2=30, attack_epochs=50)
        assert lay.attack_method_dirname("IGSM_2D", acfg) == \
            "IGSM_2D_50_to_n_e_16_a_4"
        assert lay.attack_method_dirname("Universal_2D", acfg) == \
            "Universal_2D_50_to_n_e_16_m_0_30"

    def test_step_names(self):
        lay = ArtifactLayout("./o")
        acfg = AttackConfig()
        for step, name in [(0, "attack"), (1, "nerf"), (2, "defense"),
                           (3, "nerf_defense")]:
            assert f"/{name}/" in lay.attack_dir("m", "lego", "NeRFail",
                                                 acfg, step=step) + "/"


class TestMaskViewTable:
    def test_defaults(self):
        assert mask_views("lego", 3) == (50, 75, 125)
        assert mask_views("ship", 2) == (50, 100)
        assert mask_views("chair", 2) == (75, 125)
        assert mask_views("materials", 4) == (0, 50, 75, 125)
        assert mask_views("lego", 4) == (50, 75, 100, 125)

    def test_class_indices(self):
        assert scene_class_index("chair") == 0
        assert scene_class_index("ship") == 7


class TestBlenderRoundTrip:
    def test_write_then_load(self, tmp_path):
        scene = make_box_scene(n_train=3, n_val=2, n_test=2, H=16, W=16)
        write_blender_format(scene, str(tmp_path))
        loaded = load_blender_data(str(tmp_path), testskip=1)
        assert loaded.images.shape == scene.images.shape
        assert loaded.H == 16 and loaded.W == 16
        np.testing.assert_allclose(loaded.focal, scene.focal, rtol=1e-5)
        np.testing.assert_allclose(
            loaded.poses, scene.poses, rtol=1e-5, atol=1e-6
        )
        # 8-bit quantized images
        np.testing.assert_allclose(
            loaded.images, scene.images, atol=1.0 / 255.0 + 1e-6
        )

    def test_train_dir_swap(self, tmp_path):
        scene = make_box_scene(n_train=3, n_val=2, n_test=2, H=16, W=16)
        write_blender_format(scene, str(tmp_path))
        # attacked set = inverted train images
        atk_dir = tmp_path / "attacked"
        atk_dir.mkdir()
        import imageio.v2 as imageio

        for i in range(3):
            img = (255 - scene.images[i] * 255).astype(np.uint8)
            imageio.imwrite(str(atk_dir / f"r_{i}.png"), img)
        loaded = load_blender_data(
            str(tmp_path), testskip=1, train_dir=str(atk_dir)
        )
        assert loaded.images_ori is not None
        np.testing.assert_allclose(
            loaded.images[0], 1.0 - loaded.images_ori[0], atol=2 / 255.0
        )


class TestSaveAttackedImages:
    def test_writes_reference_filenames(self, tmp_path, rng):
        imgs = rng.uniform(0, 255, (2, 8, 8, 4)).astype(np.float32)
        save_attacked_images(
            str(tmp_path / "test"), imgs, masks=imgs, originals=imgs,
            indices=[5, 9],
        )
        assert (tmp_path / "test" / "r_5.png").exists()
        assert (tmp_path / "test" / "r_9_ori.png").exists()
        assert (tmp_path / "attack_masks" / "test" / "r_5.png").exists()
