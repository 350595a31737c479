"""CW engine tests: binary-search mechanics, bookkeeping, kNN variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import losses
from hitadv_tpu.attacks import base, cw
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


@pytest.fixture(scope="module")
def batch():
    pts, labels = synthetic_clouds(4, num_points=128, seed=1)
    return jnp.array(pts[..., :3]), jnp.array(labels)


SMALL = cw.CWConfig(binary_step=2, num_iter=10, targeted=False)


class TestCWPerturb:
    def test_untargeted_runs_and_shapes(self, victim, batch):
        pts, labels = batch
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = cw.make_cw_perturb(victim, adv_fn, cfg=SMALL)
        res = attack(pts, labels, jax.random.PRNGKey(0))
        assert res.adv_points.shape == pts.shape
        assert np.isfinite(np.asarray(res.adv_points)).all()
        # success sense: pred != label for successful entries
        s = np.asarray(res.success)
        p = np.asarray(res.pred)
        l = np.asarray(labels)
        assert (p[s] != l[s]).all()

    def test_successful_examples_have_small_dist(self, victim, batch):
        # successful adv clouds come from best-bookkeeping: they must be
        # close to the original (not the last noisy iterate)
        pts, labels = batch
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = cw.make_cw_perturb(victim, adv_fn, cfg=SMALL)
        res = attack(pts, labels, jax.random.PRNGKey(0))
        d = np.sqrt(((np.asarray(res.adv_points - pts)) ** 2).sum((1, 2)))
        s = np.asarray(res.success)
        if s.any():
            assert d[s].max() < 10.0

    def test_targeted_success_sense(self, victim, batch):
        pts, labels = batch
        target = (np.asarray(labels) + 1) % 40
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=True)
        attack = cw.make_cw_perturb(
            victim, adv_fn, cfg=cw.CWConfig(binary_step=2, num_iter=10,
                                            targeted=True))
        res = attack(pts, jnp.array(target), jax.random.PRNGKey(0))
        s = np.asarray(res.success)
        p = np.asarray(res.pred)
        assert (p[s] == target[s]).all()

    def test_deterministic_given_key(self, victim, batch):
        pts, labels = batch
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = cw.make_cw_perturb(victim, adv_fn, cfg=SMALL)
        r1 = attack(pts, labels, jax.random.PRNGKey(7))
        r2 = attack(pts, labels, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(r1.adv_points),
                                      np.asarray(r2.adv_points))


class TestCWKNN:
    def test_uknn_with_clip(self, victim):
        pts6, labels = synthetic_clouds(4, num_points=128, seed=2)
        pts6, labels = jnp.array(pts6), jnp.array(labels)
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)

        def clip_fn(adv, ori, normal):
            return losses.project_inner_clip_linf(adv, ori, 0.1, normal)

        attack = cw.make_cw_knn(
            victim, adv_fn,
            dist_fn=lambda a, o: losses.chamfer_knn_dist(a, o),
            clip_fn=clip_fn,
            cfg=cw.CWKNNConfig(num_iter=20, targeted=False))
        res = attack(pts6, labels, jax.random.PRNGKey(0))
        delta = np.abs(np.asarray(res.adv_points - pts6[..., :3]))
        assert delta.max() <= 0.1 + 1e-5        # linf clip respected
        assert np.isfinite(np.asarray(res.adv_points)).all()
