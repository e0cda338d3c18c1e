"""Mid-attack checkpoint/resume: an interrupted run must continue exactly.

The reference has no in-flight attack state (only final artifacts,
attack_NeRFail.py:508-512) — on preemptible TPUs the engines checkpoint
(δ, best δ, control-plane counters) each epoch. These tests interrupt a
run via a raising log_fn, resume from the .npz, and require bit-identical
results vs an uninterrupted run (every engine is deterministic given its
inputs).
"""

import os

import numpy as np
import pytest

from nerfail_tpu.attacks.checkpoint import (
    load_attack_state, save_attack_state,
)
from nerfail_tpu.attacks.igsm2d import igsm_2d_attack
from nerfail_tpu.attacks.nerfail import nerfail_attack
from nerfail_tpu.attacks.nerfail_s import nerfail_s_attack
from nerfail_tpu.attacks.uap2d import uap_2d_attack
from nerfail_tpu.config import AttackConfig

from test_attacks import C, H, P, W, make_toy


def make_views(rng, n):
    """n-view variant of the toy fixture."""
    import jax.numpy as jnp

    M = P * H * W
    weights = rng.uniform(0, 1, (n, H, W, 8)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    idx = rng.integers(0, M, (n, H, W, 8)).astype(np.int32)
    ori = np.zeros((n, H, W, 4), np.float32)
    ori[..., :3] = 128.0
    ori[..., 3] = 255.0
    Wc = rng.standard_normal((H * W * 3, C)).astype(np.float32) * 0.01

    def logits_fn(x):
        return x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)

    return weights, idx, ori, logits_fn


class Interrupt(RuntimeError):
    pass


def raising_log(after_calls):
    calls = {"n": 0}

    def log_fn(epoch, entry):
        calls["n"] += 1
        if calls["n"] > after_calls:
            raise Interrupt()

    return log_fn


def delta0_for(n=P):
    d = np.zeros((n, H, W, 4), np.float32)
    d[..., 3] = 255.0
    return d


class TestNerfailSResume:
    def test_resume_matches_uninterrupted(self, rng, tmp_path):
        weights, idx, ori, logits_fn = make_views(rng, 3)
        labels = np.zeros(3, np.int64)
        cfg = AttackConfig(eps=32.0, a=2.0, batch_size=2)  # ragged tail too
        d0 = delta0_for()
        ckpt = str(tmp_path / "s.npz")

        ref = nerfail_s_attack(
            d0, weights, idx, ori, labels, logits_fn, cfg,
            resize_to=None, epochs=4,
        )
        with pytest.raises(Interrupt):
            nerfail_s_attack(
                d0, weights, idx, ori, labels, logits_fn, cfg,
                resize_to=None, epochs=4, checkpoint_path=ckpt,
                log_fn=raising_log(2),
            )
        st = load_attack_state(ckpt)
        assert st is not None and st[1]["epoch"] == 1
        res = nerfail_s_attack(
            d0, weights, idx, ori, labels, logits_fn, cfg,
            resize_to=None, epochs=4, checkpoint_path=ckpt,
        )
        np.testing.assert_array_equal(res.delta, ref.delta)
        assert res.best_attack_acc == ref.best_attack_acc
        assert len(res.history) == len(ref.history)
        assert not os.path.exists(ckpt)  # cleared on completion


class TestNerfailResume:
    def test_resume_matches_uninterrupted(self, rng, tmp_path):
        weights, idx, ori, logits_fn = make_views(rng, 2)
        cfg = AttackConfig(eps=32.0, m1=4.0, m2=10.0, df_max_iter=5)
        d0 = delta0_for()
        ckpt = str(tmp_path / "nf.npz")

        ref = nerfail_attack(
            d0, weights, idx, ori, logits_fn, cfg,
            resize_to=None, epochs=4,
        )
        with pytest.raises(Interrupt):
            nerfail_attack(
                d0, weights, idx, ori, logits_fn, cfg,
                resize_to=None, epochs=4, checkpoint_path=ckpt,
                log_fn=raising_log(2),
            )
        assert load_attack_state(ckpt) is not None
        res = nerfail_attack(
            d0, weights, idx, ori, logits_fn, cfg,
            resize_to=None, epochs=4, checkpoint_path=ckpt,
        )
        np.testing.assert_array_equal(res.delta, ref.delta)
        assert res.best_attack_acc == ref.best_attack_acc
        # control plane (m1/m2/epoch sequence) must line up too
        for a, b in zip(res.history[2:], ref.history[2:]):
            assert a["m1"] == b["m1"] and a["epoch"] == b["epoch"]
        assert not os.path.exists(ckpt)


class TestIgsmUapResume:
    def test_igsm_resume(self, rng, tmp_path):
        _, _, ori, logits_fn = make_views(rng, 3)
        labels = np.zeros(3, np.int64)
        cfg = AttackConfig(eps=16.0, a=2.0, batch_size=2)
        ckpt = str(tmp_path / "igsm.npz")

        ref = igsm_2d_attack(ori, labels, logits_fn, cfg,
                             resize_to=None, epochs=3)
        with pytest.raises(Interrupt):
            # checkpoint_every=1: the bank default is 10 (heavy I/O at real
            # scale) but resume itself must be exercised here
            igsm_2d_attack(
                ori, labels, logits_fn, cfg, resize_to=None, epochs=3,
                checkpoint_path=ckpt, log_fn=raising_log(1),
                checkpoint_every=1,
            )
        assert os.path.exists(ckpt)
        res = igsm_2d_attack(ori, labels, logits_fn, cfg,
                             resize_to=None, epochs=3, checkpoint_path=ckpt,
                             checkpoint_every=1)
        np.testing.assert_array_equal(res.delta, ref.delta)
        assert not os.path.exists(ckpt)
        assert not os.path.exists(ckpt + ".best.npz")

    def test_uap_resume(self, rng, tmp_path):
        _, _, ori, logits_fn = make_views(rng, 2)
        cfg = AttackConfig(eps=16.0, m1=2.0, m2=10.0, df_max_iter=5)
        ckpt = str(tmp_path / "uap.npz")

        ref = uap_2d_attack(ori, logits_fn, cfg, resize_to=None, epochs=3)
        with pytest.raises(Interrupt):
            uap_2d_attack(
                ori, logits_fn, cfg, resize_to=None, epochs=3,
                checkpoint_path=ckpt, log_fn=raising_log(1),
            )
        res = uap_2d_attack(ori, logits_fn, cfg, resize_to=None, epochs=3,
                            checkpoint_path=ckpt)
        np.testing.assert_array_equal(res.delta, ref.delta)
        assert not os.path.exists(ckpt)


class TestStateRoundTrip:
    def test_arrays_and_meta(self, tmp_path):
        path = str(tmp_path / "st.npz")
        arrays = {"a": np.arange(6.0).reshape(2, 3)}
        meta = {"epoch": 3, "m1": 4.5, "best_m1": None,
                "history": [{"epoch": 0, "x": 1.0}]}
        save_attack_state(path, arrays, meta)
        arrays2, meta2 = load_attack_state(path)
        np.testing.assert_array_equal(arrays2["a"], arrays["a"])
        assert meta2 == meta

    def test_missing_returns_none(self, tmp_path):
        assert load_attack_state(str(tmp_path / "nope.npz")) is None
