"""Defense pre-head tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import defense
from hitadv_tpu.attacks import base, fgm
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import pointnet


class TestDefenses:
    def test_sor_removes_outlier(self, rng):
        pc = rng.rand(1, 64, 3).astype(np.float32)
        pc[0, 0] = [50, 50, 50]                               # outlier
        sor = defense.make_sor(k=2, alpha=1.1)
        out = np.asarray(sor(jnp.array(pc)))
        # the outlier point is snapped near the cloud
        assert np.linalg.norm(out[0, 0]) < 10
        # inliers untouched
        np.testing.assert_allclose(out[0, 1:], pc[0, 1:], atol=1e-6)

    def test_srs_static_shape_subset(self, rng):
        pc = rng.rand(2, 64, 3).astype(np.float32)
        srs = defense.make_srs(drop_num=16, key=jax.random.PRNGKey(0))
        out = np.asarray(srs(jnp.array(pc)))
        assert out.shape == pc.shape
        ori_set = {tuple(np.round(p, 5)) for p in pc[0]}
        for p in out[0]:
            assert tuple(np.round(p, 5)) in ori_set

    def test_srs_honors_drop_num(self, rng):
        """drop_num is a contract whenever N > drop_num: exactly
        N - drop_num distinct survivors (mid-size clouds must not be
        silently defended less); degenerate N <= drop_num keeps 1."""
        pc = rng.rand(1, 64, 3).astype(np.float32)
        srs = defense.make_srs(drop_num=50, key=jax.random.PRNGKey(1))
        out = np.asarray(srs(jnp.array(pc)))
        assert out.shape == pc.shape
        assert len({tuple(p) for p in out[0]}) == 64 - 50
        srs = defense.make_srs(drop_num=64, key=jax.random.PRNGKey(1))
        out = np.asarray(srs(jnp.array(pc)))
        assert len({tuple(p) for p in out[0]}) == 1

    def test_jitter_bounds(self, rng):
        pc = jnp.zeros((1, 32, 3))
        jit = defense.make_jitter(sigma=1.0, clip=0.05)
        out = np.asarray(jit(pc))
        assert np.abs(out).max() <= 0.05 + 1e-7

    def test_registry(self):
        assert defense.get_defense(None) is None
        assert defense.get_defense("sor") is not None
        with pytest.raises(ValueError):
            defense.get_defense("nope")

    def test_attack_through_defense(self):
        """The full pre_head pattern: attack a defended victim."""
        params = pointnet.init(jax.random.PRNGKey(0))
        logits_fn = lambda x: pointnet.apply(params, x)  # noqa: E731
        defended = defense.defended_logits_fn(logits_fn,
                                              defense.make_sor())
        pts, labels = synthetic_clouds(2, num_points=64, seed=50)
        attack = fgm.make_ifgsm(defended,
                                base.make_adv_fn("cross_entropy"),
                                fgm.FGMConfig(budget=0.1, num_iter=3))
        res = attack(jnp.array(pts[..., :3]), jnp.array(labels),
                     jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(res.adv_points)).all()


class TestDefenseComposition:
    def test_adaptive_vs_blind_attacker_e2e(self):
        """End-to-end assertion of the `--defense_method` vs
        `--eval_defense_method` composition (eval.py:344-363): the same
        attack with the attacker differentiating THROUGH the defense
        (reference pre_head position, `CW/Perturb.py:99-101`) must beat
        the attacker that is blind to an eval-only defense (declared,
        unimplemented in the reference's `eval.py:65`), when both are
        judged under the defended model on a fixed batch.

        Measured on the pinned committed victim
        (tests/data/asr_victim_params.pkl): adaptive 0.860 vs blind
        0.721 (37 vs 31 of 43 clean-correct flipped). Asserts a >= 2
        example gap — well inside the measured 6."""
        import os

        from hitadv_tpu import models
        from hitadv_tpu.utils import checkpoint as ckpt

        pkl = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "asr_victim_params.pkl")
        params = ckpt.load_params(pkl)
        _, apply = models.get_model("pointnet")
        logits_fn = lambda x: apply(params, x)  # noqa: E731
        from hitadv_tpu.data import synthetic_clouds

        pts, labels = synthetic_clouds(64, 64, num_classes=10, seed=99)
        pts_j = jnp.asarray(pts[..., :3])
        labels_j = jnp.asarray(labels)

        defended = defense.defended_logits_fn(
            logits_fn, defense.make_sor(k=4, alpha=0.3))
        clean_pred = np.asarray(jnp.argmax(defended(pts_j), -1))
        mask = clean_pred == labels
        assert mask.mean() > 0.5          # victim competent under defense

        adv_fn = base.make_adv_fn("cross_entropy")
        cfg = fgm.FGMConfig(budget=0.06, num_iter=10)
        key = jax.random.PRNGKey(0)
        res_adaptive = fgm.make_ifgsm(defended, adv_fn, cfg)(
            pts_j, labels_j, key)
        res_blind = fgm.make_ifgsm(logits_fn, adv_fn, cfg)(
            pts_j, labels_j, key)

        def asr(res):
            pred = np.asarray(jnp.argmax(defended(res.adv_points), -1))
            return ((pred != labels) & mask).sum()

        flipped_adaptive, flipped_blind = asr(res_adaptive), asr(res_blind)
        # both regimes unsaturated on this config
        assert 0 < flipped_blind < mask.sum()
        assert flipped_adaptive >= flipped_blind + 2, (
            flipped_adaptive, flipped_blind)
