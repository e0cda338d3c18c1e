"""On-disk round-trip tests for the DeepVoxels and LINEMOD loaders
(VERDICT r3 weak #8 — previously the only untested components).

Mirrors the pattern data/synthetic.py::write_blender_format establishes
for the blender loader: synthesize the reference's directory grammar
(load_deepvoxels.py:6-110, load_LINEMOD.py:37-95) with known images,
poses, and intrinsics, then assert the loader reproduces them exactly.
"""

import json
import os

import numpy as np
import pytest

from nerfail_tpu.data.deepvoxels import load_dv_data
from nerfail_tpu.data.linemod import load_LINEMOD_data


def _img(seed, H=16, W=16, c=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (H, W, c)).astype(np.uint8)


def _pose(seed):
    rng = np.random.default_rng(100 + seed)
    p = np.eye(4, dtype=np.float32)
    p[:3, 3] = rng.uniform(-2, 2, 3)
    return p


def _write_dv_scene(basedir, scene, counts, H=16, W=16, height_orig=32.0):
    import imageio.v2 as imageio

    seed = 0
    stored = {}
    for mode, n in zip(["train", "validation", "test"], counts):
        d = os.path.join(basedir, mode, scene)
        os.makedirs(os.path.join(d, "rgb"))
        os.makedirs(os.path.join(d, "pose"))
        with open(os.path.join(d, "intrinsics.txt"), "w") as f:
            # focal cx cy / near / scale / height_orig
            f.write(f"64.0 {W/2} {H/2} 0.\n1.0\n1.0\n{height_orig}\n")
        ims, poses = [], []
        for i in range(n):
            img = _img(seed, H, W)
            pose = _pose(seed)
            seed += 1
            imageio.imwrite(os.path.join(d, "rgb", f"{i:04d}.png"), img)
            np.savetxt(os.path.join(d, "pose", f"{i:04d}.txt"),
                       pose.reshape(-1)[None])
            ims.append(img)
            poses.append(pose)
        stored[mode] = (np.stack(ims), np.stack(poses))
    return stored


def test_deepvoxels_roundtrip(tmp_path):
    counts = (5, 4, 6)
    stored = _write_dv_scene(str(tmp_path), "cube", counts)
    sc = load_dv_data(scene="cube", basedir=str(tmp_path), testskip=2)

    # train keeps every view; val/test take every testskip-th
    n_tr, n_va, n_te = counts[0], -(-counts[1] // 2), -(-counts[2] // 2)
    assert [len(s) for s in sc.i_split] == [n_tr, n_va, n_te]
    assert sc.images.shape == (n_tr + n_va + n_te, 16, 16, 3)
    assert sc.H == 16 and sc.W == 16
    # focal rescaled from the stored sensor height (intrinsics line 4):
    # 64 * H / height_orig = 64 * 16 / 32
    assert np.isclose(sc.focal, 32.0)

    # image + pose content round-trips (train split, original order)
    want_imgs = stored["train"][0].astype(np.float32) / 255.0
    np.testing.assert_allclose(sc.images[sc.i_split[0]], want_imgs)
    np.testing.assert_allclose(sc.poses[sc.i_split[0]], stored["train"][1])
    # the skipped validation split returns views 0 and 2
    np.testing.assert_allclose(
        sc.poses[sc.i_split[1]], stored["validation"][1][::2]
    )
    assert sc.render_poses.shape[-2:] == (4, 4)


def _write_linemod_scene(basedir, counts, H=16, W=16, with_K=True):
    import imageio.v2 as imageio

    K = np.array([[70.0, 0, 7.5], [0, 70.0, 8.5], [0, 0, 1]], np.float32)
    seed = 0
    stored = {}
    for split, n in zip(["train", "val", "test"], counts):
        os.makedirs(os.path.join(basedir, split), exist_ok=True)
        frames = []
        ims, poses = [], []
        for i in range(n):
            img = _img(200 + seed, H, W)
            pose = _pose(200 + seed)
            seed += 1
            rel = f"{split}/r_{i}.png"
            imageio.imwrite(os.path.join(basedir, rel), img)
            fr = {"file_path": rel, "transform_matrix": pose.tolist()}
            if with_K:
                fr["intrinsic_matrix"] = K.tolist()
            frames.append(fr)
            ims.append(img)
            poses.append(pose)
        meta = {"frames": frames, "near": 0.4, "far": 1.8,
                "camera_angle_x": 0.7}
        with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
        stored[split] = (np.stack(ims), np.stack(poses))
    return stored, K


def test_linemod_roundtrip(tmp_path):
    counts = (4, 3, 5)
    stored, K = _write_linemod_scene(str(tmp_path), counts)
    sc = load_LINEMOD_data(str(tmp_path), testskip=2)

    n_tr, n_va, n_te = counts[0], -(-counts[1] // 2), -(-counts[2] // 2)
    assert [len(s) for s in sc.i_split] == [n_tr, n_va, n_te]
    # per-frame explicit K wins over camera_angle_x (K_explicit parity,
    # load_LINEMOD.py:61-64)
    np.testing.assert_allclose(sc.K, K)
    assert sc.near == pytest.approx(0.4) and sc.far == pytest.approx(1.8)

    want = stored["train"][0].astype(np.float32) / 255.0
    np.testing.assert_allclose(sc.images[sc.i_split[0]], want)
    np.testing.assert_allclose(sc.poses[sc.i_split[0]], stored["train"][1])
    np.testing.assert_allclose(sc.poses[sc.i_split[2]],
                               stored["test"][1][::2])


def test_linemod_half_res_and_fallback_K(tmp_path):
    counts = (2, 2, 2)
    stored, _ = _write_linemod_scene(
        str(tmp_path), counts, with_K=False
    )
    sc = load_LINEMOD_data(str(tmp_path), half_res=True, testskip=1)
    assert sc.H == 8 and sc.W == 8
    assert sc.images.shape == (6, 8, 8, 3)
    # focal from camera_angle_x, then halved with the resolution
    focal = 0.5 * 16 / np.tan(0.35)
    np.testing.assert_allclose(sc.K[0, 0], focal / 2, rtol=1e-6)
    # half-res is 2×2 average pooling
    want = stored["train"][0][0].astype(np.float32) / 255.0
    want = want.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(sc.images[0], want, atol=1e-6)
