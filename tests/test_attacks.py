"""Attack-engine tests on tiny fixtures with a linear toy classifier."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfail_tpu.config import AttackConfig
from nerfail_tpu.attacks.deepfool import deepfool
from nerfail_tpu.attacks.forward import (
    splat_attack_forward,
    universal_2d_forward,
    zero_init_mask,
)
from nerfail_tpu.attacks.igsm2d import igsm_2d_attack
from nerfail_tpu.attacks.nerfail_s import nerfail_s_attack
from nerfail_tpu.attacks.uap2d import uap_2d_attack


H = W = 8
P = 2
C = 4  # classes


def make_toy(rng):
    """A tiny world: P mask views → point set, one target view, linear clf."""
    M = P * H * W
    weights = rng.uniform(0, 1, (1, H, W, 8)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    idx = rng.integers(0, M, (1, H, W, 8)).astype(np.int32)
    ori = np.zeros((1, H, W, 4), np.float32)
    ori[..., :3] = 128.0
    ori[..., 3] = 255.0
    Wc = rng.standard_normal((H * W * 3, C)).astype(np.float32) * 0.01

    def logits_fn(x):  # x [B, H, W, 3] 0-255
        return x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)

    return weights, idx, ori, logits_fn


class TestSplatForward:
    def test_eps_clip_inside_forward(self, rng):
        weights, idx, ori, logits_fn = make_toy(rng)
        delta = np.full((P, H, W, 4), 0.0, np.float32)
        delta[..., :3] = 500.0  # way beyond eps
        delta[..., 3] = 255.0
        out = splat_attack_forward(
            jnp.asarray(delta.reshape(-1, 4)), jnp.asarray(weights),
            jnp.asarray(idx), jnp.asarray(ori), logits_fn,
            eps=32.0, resize_to=None,
        )
        d = np.asarray(out["attacked_rgba"][..., :3]) - ori[..., :3]
        assert np.abs(d).max() <= 32.0 + 1e-4

    def test_alpha_zero_keeps_pixels(self, rng):
        weights, idx, ori, logits_fn = make_toy(rng)
        ori = ori.copy()
        ori[0, 0, :, 3] = 0.0  # first row transparent
        delta = np.full((P, H, W, 4), 0.0, np.float32)
        delta[..., :3] = 30.0
        delta[..., 3] = 255.0
        out = splat_attack_forward(
            jnp.asarray(delta.reshape(-1, 4)), jnp.asarray(weights),
            jnp.asarray(idx), jnp.asarray(ori), logits_fn,
            eps=32.0, resize_to=None,
        )
        # transparent pixels: attacked rgb zeroed (GaussNet.py:112-119)
        np.testing.assert_array_equal(
            np.asarray(out["attacked_rgba"])[0, 0, :, :3], 0.0
        )

    def test_zero_init_mask(self, rng):
        imgs = rng.uniform(0, 255, (P, H, W, 4)).astype(np.float32)
        z = np.asarray(zero_init_mask(jnp.asarray(imgs)))
        np.testing.assert_array_equal(z[..., :3], 0.0)
        np.testing.assert_array_equal(z[..., 3], imgs[..., 3])

    def test_gradient_reaches_point_set(self, rng):
        weights, idx, ori, logits_fn = make_toy(rng)
        delta = zero_init_mask(jnp.asarray(
            np.concatenate([np.zeros((P, H, W, 3)), 255 * np.ones((P, H, W, 1))], -1)
            .astype(np.float32)))

        def loss(d):
            out = splat_attack_forward(
                d.reshape(-1, 4), jnp.asarray(weights), jnp.asarray(idx),
                jnp.asarray(ori), logits_fn, eps=32.0, resize_to=None,
            )
            return out["logits"][0, 0]

        g = jax.grad(loss)(delta)
        assert float(jnp.abs(g[..., :3]).max()) > 0.0


class TestDeepFool:
    def test_flips_simple_classifier(self):
        # logits = [sum(d), -sum(d)] → orig pred 1 at d=-1; deepfool must
        # push sum(d) positive
        def logits_fn(d):
            s = jnp.sum(d)
            return jnp.stack([s, -s])

        delta0 = jnp.full((4, 4, 4), -1.0)
        ori_logits = logits_fn(delta0)
        res = deepfool(
            logits_fn, delta0, ori_logits, num_classes=2, max_iter=50,
            m1=0.0, m2=0.5, overshoot=1.0, preserve_alpha=False,
        )
        assert int(res.iters) < 50
        final_logits = logits_fn(res.delta)
        assert int(jnp.argmax(final_logits)) != int(res.ori_label)

    def test_preserves_alpha(self):
        def logits_fn(d):
            s = jnp.sum(d[..., :3])
            return jnp.stack([s, -s])

        delta0 = jnp.concatenate(
            [jnp.full((2, 2, 3), -1.0), jnp.full((2, 2, 1), 77.0)], -1
        )
        res = deepfool(
            logits_fn, delta0, logits_fn(delta0), num_classes=2,
            max_iter=50, m1=0.0, m2=0.5, overshoot=1.0,
        )
        np.testing.assert_array_equal(np.asarray(res.delta[..., 3]), 77.0)

    def test_respects_max_iter(self):
        def logits_fn(d):
            return jnp.array([1000.0, 0.0])  # constant: can never flip

        delta0 = jnp.zeros((2, 2, 4))
        res = deepfool(
            logits_fn, delta0, logits_fn(delta0), num_classes=2, max_iter=7,
        )
        assert int(res.iters) == 7


class TestEngines:
    def test_nerfail_s_eps_ball(self, rng):
        weights, idx, ori, logits_fn = make_toy(rng)
        delta0 = np.zeros((P, H, W, 4), np.float32)
        delta0[..., 3] = 255.0
        cfg = AttackConfig(eps=16.0, a=4.0, batch_size=1)
        res = nerfail_s_attack(
            delta0, weights, idx, ori, np.array([0]), logits_fn, cfg,
            resize_to=None, epochs=5,
        )
        assert np.abs(res.delta[..., :3]).max() <= 16.0 + 1e-4
        np.testing.assert_array_equal(res.delta[..., 3], 255.0)
        assert len(res.history) == 5

    def test_nerfail_s_ragged_tail_attacks_every_view(self, rng):
        """n % batch_size != 0: the tail views must be attacked and counted
        exactly once (reference DataLoader includes the partial batch,
        attack_NeRFail_S.py:341-372)."""
        n, bs = 3, 2
        M = P * H * W
        weights = rng.uniform(0, 1, (n, H, W, 8)).astype(np.float32)
        weights /= weights.sum(-1, keepdims=True)
        # view v gathers ONLY from its own third of the point set, so a
        # nonzero delta there proves view v was attacked
        per = M // n
        idx = np.stack([
            rng.integers(v * per, (v + 1) * per, (H, W, 8)).astype(np.int32)
            for v in range(n)
        ])
        ori = np.full((n, H, W, 4), 128.0, np.float32)
        ori[..., 3] = 255.0
        # logits = [1e-4·sum(x), 0, 0, 0] → every clean view predicts class
        # 0 with an unsaturated softmax (CE gradient stays nonzero)
        def logits_fn(x):
            s = 1e-4 * jnp.sum(x.reshape(x.shape[0], -1), axis=-1)
            zeros = jnp.zeros_like(s)
            return jnp.stack([s, zeros, zeros, zeros], axis=-1)

        delta0 = np.zeros((P, H, W, 4), np.float32)
        delta0[..., 3] = 255.0
        cfg = AttackConfig(eps=16.0, a=4.0, batch_size=bs)
        res = nerfail_s_attack(
            delta0, weights, idx, ori, np.zeros(n, np.int64), logits_fn,
            cfg, resize_to=None, epochs=1,
        )
        # every view was counted exactly once (pad not double-counted)
        assert res.history[0]["clean_acc"] == 1.0
        # the tail view's exclusive point-set region was perturbed
        flat = res.delta.reshape(-1, 4)
        tail_region = flat[2 * per:3 * per, :3]
        assert np.abs(tail_region).max() > 0.0

    def test_igsm_2d_eps(self, rng):
        _, _, ori, logits_fn = make_toy(rng)
        cfg = AttackConfig(eps=8.0, a=2.0, batch_size=1)
        res = igsm_2d_attack(
            ori, np.array([0]), logits_fn, cfg, resize_to=None, epochs=4,
        )
        assert np.abs(res.delta).max() <= 8.0 + 1e-5
        assert res.delta.shape == (1, H, W, 3)

    def test_batched_deepfool_matches_individual(self, rng):
        """The batched (view-sharded) DeepFool path must equal running
        per-view DeepFool from the same shared δ and summing the rots."""
        from nerfail_tpu.attacks.nerfail import (
            make_batched_deepfool, make_view_logits_fn,
        )

        B = 3
        M = P * H * W
        weights = rng.uniform(0, 1, (B, H, W, 8)).astype(np.float32)
        weights /= weights.sum(-1, keepdims=True)
        idx = rng.integers(0, M, (B, H, W, 8)).astype(np.int32)
        ori = np.full((B, H, W, 4), 128.0, np.float32)
        ori[..., 3] = 255.0
        Wc = rng.standard_normal((H * W * 3, C)).astype(np.float32) * 1e-3

        def logits_fn(x):
            return x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)

        cfg = AttackConfig(eps=32.0, m1=0.0, m2=0.2, df_max_iter=5)
        delta = np.zeros((P, H, W, 4), np.float32)
        delta[..., 3] = 255.0
        delta = jnp.asarray(delta)

        view_logits = make_view_logits_fn(logits_fn, cfg, None)
        ori_logits = jnp.stack([
            view_logits(delta, jnp.asarray(weights[v]), jnp.asarray(idx[v]),
                        jnp.asarray(ori[v]))
            for v in range(B)
        ])

        df_batch = make_batched_deepfool(
            logits_fn, cfg, None, C, accumulate_incomplete=True,
        )
        rot_sum, iters, used, complete = df_batch(
            delta, jnp.asarray(weights), jnp.asarray(idx), jnp.asarray(ori),
            ori_logits, jnp.ones(B, bool), cfg.m1, cfg.m2,
        )

        expected = np.zeros_like(np.asarray(delta))
        for v in range(B):
            fn = lambda d: view_logits(
                d, jnp.asarray(weights[v]), jnp.asarray(idx[v]),
                jnp.asarray(ori[v]),
            )
            res = deepfool(
                fn, delta, ori_logits[v], num_classes=C,
                max_iter=cfg.df_max_iter, m1=cfg.m1, m2=cfg.m2,
                overshoot=cfg.overshoot,
            )
            assert int(res.iters) == int(np.asarray(iters)[v])
            expected += np.asarray(res.rot)
        np.testing.assert_allclose(
            np.asarray(rot_sum), expected, rtol=1e-4, atol=1e-4
        )

    def test_nerfail_view_batch_runs(self, rng):
        """nerfail_attack with view_batch>1 (incl. ragged tail) completes
        and respects the control plane."""
        from nerfail_tpu.attacks.nerfail import nerfail_attack

        n = 3
        M = P * H * W
        weights = rng.uniform(0, 1, (n, H, W, 8)).astype(np.float32)
        weights /= weights.sum(-1, keepdims=True)
        idx = rng.integers(0, M, (n, H, W, 8)).astype(np.int32)
        ori = np.full((n, H, W, 4), 128.0, np.float32)
        ori[..., 3] = 255.0
        Wc = rng.standard_normal((H * W * 3, C)).astype(np.float32) * 1e-3
        logits_fn = lambda x: x.reshape(x.shape[0], -1) @ jnp.asarray(Wc)

        cfg = AttackConfig(eps=32.0, m1=0.0, m2=0.2, df_max_iter=10,
                           view_batch=2)
        delta0 = np.zeros((P, H, W, 4), np.float32)
        delta0[..., 3] = 255.0
        res = nerfail_attack(delta0, weights, idx, ori, logits_fn, cfg,
                             resize_to=None, epochs=3)
        assert len(res.history) >= 1
        assert res.delta.shape == delta0.shape
        np.testing.assert_array_equal(res.delta[..., 3], 255.0)

    def test_uap_2d_runs(self, rng):
        _, _, ori, logits_fn = make_toy(rng)
        cfg = AttackConfig(eps=8.0, m1=0.0, m2=0.1, df_max_iter=20)
        res = uap_2d_attack(ori, logits_fn, cfg, resize_to=None, epochs=2)
        assert np.abs(res.delta).max() <= 8.0 + 1e-5
