"""Add-attack family tests (CWAdd / CWAddClusters / CWAddObjects)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.attacks import add, base
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


@pytest.fixture(scope="module")
def batch():
    pts, labels = synthetic_clouds(2, num_points=128, seed=13)
    target = (labels + 1) % 40
    return (jnp.array(pts[..., :3]), jnp.array(labels),
            jnp.array(target))


ADV = base.make_adv_fn("logits", kappa=0.0, targeted=True)


class TestDBSCAN:
    def test_two_blobs(self, rng):
        a = rng.randn(20, 3) * 0.01
        b = rng.randn(20, 3) * 0.01 + 5.0
        labels = add.dbscan_np(np.concatenate([a, b]), eps=0.2,
                               min_samples=3)
        assert set(labels[:20]) == {labels[0]}
        assert set(labels[20:]) == {labels[20]}
        assert labels[0] != labels[20]

    def test_noise_points(self, rng):
        a = rng.randn(20, 3) * 0.01
        outlier = np.array([[100.0, 100, 100]])
        labels = add.dbscan_np(np.concatenate([a, outlier]), eps=0.2,
                               min_samples=3)
        assert labels[-1] == -1

    def test_critical_points_subset(self, victim, batch):
        pts, labels, _ = batch
        cri = add.get_critical_points(victim, pts, labels, 16)
        assert cri.shape == (2, 16, 3)
        ori_set = {tuple(np.round(p, 5)) for p in np.asarray(pts[0])}
        for p in np.asarray(cri[0]):
            assert tuple(np.round(p, 5)) in ori_set


class TestCWAdd:
    def test_shapes_and_original_preserved(self, victim, batch):
        pts, labels, target = batch
        cfg = add.AddConfig(binary_step=2, num_iter=5, num_add=32)
        attack = add.make_cw_add(victim, ADV, cfg=cfg)
        res = attack(pts, target, jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 128 + 32, 3)
        # clean points are untouched, prepended
        np.testing.assert_allclose(np.asarray(res.adv_points[:, :128]),
                                   np.asarray(pts), atol=1e-6)


class TestCWAddClusters:
    def test_runs(self, victim, batch):
        pts, labels, target = batch
        cfg = add.AddClusterConfig(binary_step=1, num_iter=5, num_add=2,
                                   cl_num_p=8, num_cri=32)
        attack = add.make_cw_add_clusters(victim, ADV, cfg=cfg)
        res = attack(pts, target, jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 128 + 16, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()


class TestCWAddObjects:
    def test_runs_and_objects_rigid_at_init(self, victim, batch):
        pts, labels, target = batch
        cfg = add.AddObjectConfig(binary_step=1, num_iter=5, num_add=2,
                                  obj_num_p=16, num_cri=32)
        attack = add.make_cw_add_objects(victim, ADV, cfg=cfg)
        res = attack(pts, target, jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 128 + 32, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()

    def test_default_object_normalized(self):
        pc = add.default_object_pc(64)
        np.testing.assert_allclose(np.linalg.norm(pc, axis=1), 1.0,
                                   atol=1e-6)
