"""HiT-ADV flagship attack tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.attacks import base, hit_adv
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


SMALL = hit_adv.HiTADVConfig(binary_step=2, num_iter=8, central_num=16,
                             total_central_num=32, curv_loss_knn=8)


@pytest.fixture(scope="module")
def result(victim):
    pts, labels = synthetic_clouds(4, num_points=128, seed=3)
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    attack = hit_adv.make_hit_adv(victim, adv_fn, SMALL)
    res = attack(jnp.array(pts), jnp.array(labels), jax.random.PRNGKey(0))
    return pts, labels, res


class TestHiTADV:
    def test_shapes_finite(self, result):
        pts, labels, res = result
        assert res.adv_points.shape == (4, 128, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()

    def test_success_sense_untargeted(self, result):
        pts, labels, res = result
        s = np.asarray(res.success)
        p = np.asarray(res.pred)
        assert (p[s] != labels[s]).all()

    def test_deformation_is_smooth_blend(self, victim):
        # with zero perturbation matrix the deformation is identity
        pts, labels = synthetic_clouds(2, num_points=128, seed=4)
        ori = jnp.array(pts[..., :3])
        cfg = SMALL
        from hitadv_tpu.ops import geometry as G

        central = G.index_points(
            ori, G.farthest_point_sample(ori, cfg.central_num,
                                         start_idx=0))
        delta = jnp.full((2, cfg.central_num), 0.5)
        d = jnp.sqrt(jnp.maximum(G.square_distance(central, ori), 1e-12))
        ker = jnp.exp(-d / (2 * delta * delta)[..., None])
        pert = jnp.zeros((2, cfg.central_num, 3))
        deno = jnp.sum(ker, axis=1)
        num = jnp.einsum("bjc,bjn->bnc", pert, ker)
        tmp = ori + num / deno[..., None]
        np.testing.assert_allclose(np.asarray(tmp), np.asarray(ori),
                                   atol=1e-6)

    def test_gaussian_field_hoisted_out_of_scans(self, victim):
        # Regression guard for the loop-invariant negd hoist: the
        # [B, Cn, N] distance-field sqrt must be traced OUTSIDE both
        # attack scans (binary search / Adam). XLA's LICM does not
        # rescue a refactor that moves it back into the body
        # (profiled per-iter on v5e before the hoist).
        pts, labels = synthetic_clouds(2, num_points=128, seed=6)
        adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
        attack = hit_adv.make_hit_adv(victim, adv_fn, SMALL)
        jx = jax.make_jaxpr(attack)(jnp.array(pts), jnp.array(labels),
                                    jax.random.PRNGKey(0))
        field = (2, SMALL.central_num, 128)
        counts = {"top": 0, "loop": 0}

        def walk(jaxpr, in_loop):
            for eqn in jaxpr.eqns:
                if (eqn.primitive.name == "sqrt"
                        and tuple(eqn.outvars[0].aval.shape) == field):
                    counts["loop" if in_loop else "top"] += 1
                looped = in_loop or eqn.primitive.name in ("scan",
                                                           "while")
                for val in eqn.params.values():
                    for item in (val if isinstance(val, (list, tuple))
                                 else [val]):
                        sub = getattr(item, "jaxpr", None)
                        if sub is not None:
                            walk(sub, looped)

        walk(jx.jaxpr, False)
        assert counts["top"] == 1, counts
        assert counts["loop"] == 0, counts

    def test_deterministic_given_key(self, victim):
        pts, labels = synthetic_clouds(2, num_points=128, seed=5)
        adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
        attack = hit_adv.make_hit_adv(victim, adv_fn, SMALL)
        r1 = attack(jnp.array(pts), jnp.array(labels),
                    jax.random.PRNGKey(9))
        r2 = attack(jnp.array(pts), jnp.array(labels),
                    jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(r1.adv_points),
                                      np.asarray(r2.adv_points))

    def test_perturbation_bounded_by_budget(self, result):
        # tmp_adv is a convex blend of (ori + pert_j); since |pert|∞ <=
        # budget the displacement of every point is <= budget
        pts, labels, res = result
        delta = np.abs(np.asarray(res.adv_points) - pts[..., :3])
        assert delta.max() <= SMALL.budget + 1e-4
