"""FGM attack family tests + end-to-end eval_asr smoke (SURVEY.md §4 d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import losses
from hitadv_tpu.attacks import base, fgm
from hitadv_tpu.data import synthetic_batches, synthetic_clouds
from hitadv_tpu.evaluation import eval_asr
from hitadv_tpu.models import pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


@pytest.fixture(scope="module")
def batch():
    pts, labels = synthetic_clouds(8, num_points=256, seed=1)
    return jnp.array(pts[..., :3]), jnp.array(labels)


CE = base.make_adv_fn("cross_entropy")
CFG = fgm.FGMConfig(budget=0.1, num_iter=8)


class TestOneStep:
    def test_fgsm_budget_respected(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_fgsm(victim, CE, CFG)
        res = attack(pts, labels)
        delta = np.abs(np.asarray(res.adv_points - pts))
        # each coord moves by exactly budget unless clamped by [-1,1]
        assert delta.max() <= CFG.budget + 1e-6
        assert res.adv_points.shape == pts.shape

    def test_fgsm_increases_loss(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_fgsm(victim, CE, CFG)
        res = attack(pts, labels)
        loss0 = float(jnp.mean(CE(victim(pts), labels)))
        loss1 = float(jnp.mean(CE(victim(res.adv_points), labels)))
        assert loss1 > loss0

    def test_fgm_l2_direction(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_fgm_l2(victim, CE, CFG)
        res = attack(pts, labels)
        norms = np.sqrt(((np.asarray(res.adv_points - pts)) ** 2)
                        .sum((1, 2)))
        # step is exactly budget in global l2 (before [-1,1] clamp)
        assert (norms <= CFG.budget + 1e-5).all()


class TestIterative:
    @pytest.mark.parametrize("maker", [fgm.make_ifgsm, fgm.make_ifgm_l2,
                                       fgm.make_mifgsm])
    def test_budget_and_loss(self, victim, batch, maker):
        pts, labels = batch
        attack = maker(victim, CE, CFG)
        res = attack(pts, labels, jax.random.PRNGKey(0))
        delta = np.abs(np.asarray(res.adv_points - pts))
        assert delta.max() <= CFG.budget + 1e-5
        loss0 = float(jnp.mean(CE(victim(pts), labels)))
        loss1 = float(jnp.mean(CE(victim(res.adv_points), labels)))
        assert loss1 > loss0

    def test_pgd_random_start_differs(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_pgd(victim, CE, CFG)
        r1 = attack(pts, labels, jax.random.PRNGKey(0))
        r2 = attack(pts, labels, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(r1.adv_points),
                               np.asarray(r2.adv_points))

    def test_fgsm_rs_budget(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_fgsm_rs(victim, CE, CFG)
        res = attack(pts, labels, jax.random.PRNGKey(0))
        # random start (<=budget) + fgsm step (budget) then clip to budget
        delta = np.abs(np.asarray(res.adv_points - pts))
        assert delta.max() <= CFG.budget + 1e-5

    def test_success_sense_untargeted(self, victim, batch):
        pts, labels = batch
        attack = fgm.make_ifgsm(victim, CE, CFG)
        res = attack(pts, labels, jax.random.PRNGKey(0))
        want = np.asarray(res.pred) != np.asarray(labels)
        np.testing.assert_array_equal(np.asarray(res.success), want)


class TestEvalASR:
    def test_eval_asr_end_to_end(self, victim):
        attack = fgm.make_ifgsm(victim, CE,
                                fgm.FGMConfig(budget=0.2, num_iter=5))

        def attack6(points, labels, key):
            # dataset yields [B, N, 6]; attack consumes xyz
            return attack(points[..., :3], labels, key)

        metrics = eval_asr(victim, attack6,
                           synthetic_batches(2, 4, num_points=256),
                           uniform_k=2, verbose=False)
        for k in ("asr", "knn_dist", "uniform_dist", "curv_std_dist"):
            assert np.isfinite(metrics[k]), k
        assert 0.0 <= metrics["asr"] <= 1.0
