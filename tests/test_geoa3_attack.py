"""GeoA3 attack engine tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.attacks import geoa3
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


class TestGeoA3:
    def test_untargeted_runs(self, victim):
        pts, labels = synthetic_clouds(2, num_points=128, seed=40)
        cfg = geoa3.GeoA3Config(binary_max_steps=2, iter_max_steps=5,
                                curv_loss_knn=8, targeted=False)
        attack = geoa3.make_geoa3(victim, cfg)
        res = attack(jnp.array(pts), jnp.array(labels),
                     jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 128, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()
        s = np.asarray(res.success)
        assert (np.asarray(res.pred)[s] != labels[s]).all()

    def test_targeted_with_linf_and_jitter(self, victim):
        pts, labels = synthetic_clouds(2, num_points=128, seed=41)
        target = (labels + 1) % 40
        cfg = geoa3.GeoA3Config(binary_max_steps=1, iter_max_steps=5,
                                curv_loss_knn=8, cc_linf=0.1,
                                is_pre_jitter_input=True,
                                cls_loss_type="Margin")
        attack = geoa3.make_geoa3(victim, cfg)
        res = attack(jnp.array(pts), jnp.array(target),
                     jax.random.PRNGKey(0))
        delta = np.abs(np.asarray(res.adv_points) - pts[..., :3])
        assert delta.max() <= 0.1 + 1e-5
