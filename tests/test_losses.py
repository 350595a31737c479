"""Golden-value tests for the attack-math layer (SURVEY.md §4 level b).

Each loss is checked against an independent NumPy implementation of the
formula cited in SURVEY.md §2.4, not against the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import losses


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


class TestAdvLosses:
    def test_targeted_margin(self, rng):
        logits = rng.randn(4, 10).astype(np.float32)
        targets = rng.randint(0, 10, 4)
        got = np.asarray(losses.logits_adv_loss(jnp.array(logits),
                                                jnp.array(targets),
                                                kappa=2.0))
        for b in range(4):
            real = logits[b, targets[b]]
            other = np.max(np.delete(logits[b], targets[b]))
            want = max(other - real + 2.0, 0.0)
            assert abs(got[b] - want) < 1e-5

    def test_untargeted_margin(self, rng):
        logits = rng.randn(4, 10).astype(np.float32)
        targets = rng.randint(0, 10, 4)
        got = np.asarray(losses.untargeted_logits_adv_loss(
            jnp.array(logits), jnp.array(targets), kappa=30.0))
        for b in range(4):
            real = logits[b, targets[b]]
            other = np.max(np.delete(logits[b], targets[b]))
            want = max(real - other + 30.0, 0.0)
            assert abs(got[b] - want) < 1e-5

    def test_cross_entropy(self, rng):
        logits = rng.randn(5, 7).astype(np.float32)
        targets = rng.randint(0, 7, 5)
        got = np.asarray(losses.cross_entropy_loss(jnp.array(logits),
                                                   jnp.array(targets)))
        p = softmax_np(logits)
        want = -np.log(p[np.arange(5), targets])
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSetDistances:
    def test_l2(self, rng):
        a = rng.randn(3, 16, 3).astype(np.float32)
        o = rng.randn(3, 16, 3).astype(np.float32)
        got = np.asarray(losses.l2_dist(jnp.array(a), jnp.array(o)))
        want = np.sqrt(((a - o) ** 2).sum((1, 2)) + 1e-7)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_chamfer_directions(self, rng):
        a = rng.randn(2, 10, 3).astype(np.float32)
        o = rng.randn(2, 14, 3).astype(np.float32)
        sq = np.sum((a[:, :, None] - o[:, None]) ** 2, -1)    # [B,10,14]
        want_a2o = sq.min(2).mean(1)
        want_o2a = sq.min(1).mean(1)
        np.testing.assert_allclose(
            np.asarray(losses.chamfer_dist(jnp.array(a), jnp.array(o),
                                           "adv2ori")), want_a2o, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(losses.chamfer_dist(jnp.array(a), jnp.array(o),
                                           "ori2adv")), want_o2a, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(losses.chamfer_dist(jnp.array(a), jnp.array(o),
                                           "both")),
            (want_a2o + want_o2a) / 2, atol=1e-4)

    def test_hausdorff(self, rng):
        a = rng.randn(2, 10, 3).astype(np.float32)
        o = rng.randn(2, 14, 3).astype(np.float32)
        sq = np.sum((a[:, :, None] - o[:, None]) ** 2, -1)
        want = sq.min(2).max(1)
        np.testing.assert_allclose(
            np.asarray(losses.hausdorff_dist(jnp.array(a), jnp.array(o))),
            want, atol=1e-4)

    def test_identical_clouds_zero(self, rng):
        a = rng.randn(2, 12, 3).astype(np.float32)
        assert np.allclose(losses.chamfer_dist(jnp.array(a), jnp.array(a)),
                           0, atol=1e-5)
        assert np.allclose(losses.hausdorff_dist(jnp.array(a), jnp.array(a)),
                           0, atol=1e-5)


class TestKNNDist:
    def test_oracle(self, rng):
        pc = rng.randn(2, 32, 3).astype(np.float32)
        k, alpha = 5, 1.05
        got = np.asarray(losses.knn_dist(jnp.array(pc), k=k, alpha=alpha))
        sq = np.sum((pc[:, :, None] - pc[:, None]) ** 2, -1)
        want = np.zeros(2)
        for b in range(2):
            srt = np.sort(sq[b], axis=-1)[:, 1:k + 1]         # drop self
            value = srt.mean(-1)
            thr = value.mean() + alpha * value.std(ddof=1)
            mask = value > thr
            want[b] = (value * mask).mean()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_outlier_increases_loss(self, rng):
        pc = rng.rand(1, 64, 3).astype(np.float32)
        pc_out = pc.copy()
        pc_out[0, 0] = [10, 10, 10]
        l0 = float(losses.knn_dist(jnp.array(pc))[0])
        l1 = float(losses.knn_dist(jnp.array(pc_out))[0])
        assert l1 > l0


class TestCurvature:
    def test_kappa_planar_zero(self):
        # points on z=0 plane with z-normals -> kappa ~ 0
        rng = np.random.RandomState(1)
        pc = np.zeros((1, 64, 3), np.float32)
        pc[0, :, :2] = rng.rand(64, 2)
        normal = np.zeros((1, 64, 3), np.float32)
        normal[..., 2] = 1.0
        kappa = np.asarray(losses.get_kappa(jnp.array(pc), jnp.array(normal),
                                            k=4))
        np.testing.assert_allclose(kappa, 0.0, atol=1e-5)

    def test_kappa_std_shape_and_planar(self):
        rng = np.random.RandomState(1)
        pc = np.zeros((2, 64, 3), np.float32)
        pc[:, :, :2] = rng.rand(2, 64, 2)
        normal = np.zeros((2, 64, 3), np.float32)
        normal[..., 2] = 1.0
        std = np.asarray(losses.get_kappa_std(jnp.array(pc),
                                              jnp.array(normal), k=8))
        assert std.shape == (2, 64)
        np.testing.assert_allclose(std, 0.0, atol=1e-5)

    def test_curv_std_dist_zero_for_identical(self, rng):
        pc = rng.rand(2, 64, 3).astype(np.float32)
        normal = rng.randn(2, 64, 3).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        d = np.asarray(losses.curv_std_dist(jnp.array(pc), jnp.array(pc),
                                            jnp.array(normal), k=4))
        np.testing.assert_allclose(d, 0.0, atol=1e-5)


class TestClip:
    def test_l2_inside_untouched(self, rng):
        ori = rng.randn(2, 16, 3).astype(np.float32)
        pc = ori + 1e-4
        out = np.asarray(losses.clip_points_l2(jnp.array(pc), jnp.array(ori),
                                               budget=1.0))
        np.testing.assert_allclose(out, pc, atol=1e-6)

    def test_l2_rescales(self, rng):
        ori = rng.randn(2, 16, 3).astype(np.float32)
        pc = ori + 1.0
        out = np.asarray(losses.clip_points_l2(jnp.array(pc), jnp.array(ori),
                                               budget=0.5))
        norms = np.sqrt(((out - ori) ** 2).sum((1, 2)))
        np.testing.assert_allclose(norms, 0.5, rtol=1e-4)

    def test_linf(self, rng):
        ori = rng.randn(2, 16, 3).astype(np.float32)
        pc = ori + rng.randn(2, 16, 3).astype(np.float32)
        out = np.asarray(losses.clip_points_linf(jnp.array(pc),
                                                 jnp.array(ori), 0.1))
        assert np.abs(out - ori).max() <= 0.1 + 1e-6

    def test_project_inner_outward_untouched(self):
        ori = np.zeros((1, 4, 3), np.float32)
        normal = np.zeros((1, 4, 3), np.float32)
        normal[..., 2] = 1.0
        pc = ori.copy()
        pc[..., 2] = 0.3                                      # along normal
        out = np.asarray(losses.project_inner_points(
            jnp.array(pc), jnp.array(ori), jnp.array(normal)))
        np.testing.assert_allclose(out, pc, atol=1e-6)

    def test_project_inner_antiparallel_zeroed(self):
        ori = np.zeros((1, 4, 3), np.float32)
        normal = np.zeros((1, 4, 3), np.float32)
        normal[..., 2] = 1.0
        pc = ori.copy()
        pc[..., 2] = -0.3                                     # straight in
        out = np.asarray(losses.project_inner_points(
            jnp.array(pc), jnp.array(ori), jnp.array(normal)))
        np.testing.assert_allclose(out, ori, atol=1e-6)


class TestAddDistances:
    def test_farthest_dist(self, rng):
        cl = rng.randn(2, 3, 8, 3).astype(np.float32)
        got = np.asarray(losses.farthest_dist(jnp.array(cl)))
        d = np.linalg.norm(cl[:, :, None, :, :] - cl[:, :, :, None, :]
                           + 1e-7, axis=-1)
        want = d.max((2, 3)).sum(1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_far_chamfer_composes(self, rng):
        adv = rng.randn(2, 24, 3).astype(np.float32)
        ori = rng.randn(2, 64, 3).astype(np.float32)
        got = np.asarray(losses.far_chamfer_dist(jnp.array(adv),
                                                 jnp.array(ori), num_add=3))
        far = np.asarray(losses.farthest_dist(
            jnp.array(adv.reshape(2, 3, 8, 3))))
        cd = np.asarray(losses.chamfer_dist(jnp.array(adv), jnp.array(ori)))
        np.testing.assert_allclose(got, far + 0.1 * cd, rtol=1e-5)


class TestGeoA3:
    def test_chamfer_loss_sum_of_sides(self, rng):
        a = rng.randn(2, 16, 3).astype(np.float32)
        o = rng.randn(2, 16, 3).astype(np.float32)
        got = np.asarray(losses.chamfer_loss(jnp.array(a), jnp.array(o)))
        sq = np.sum((a[:, :, None] - o[:, None]) ** 2, -1)
        want = sq.min(2).mean(1) + sq.min(1).mean(1)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_hausdorff_loss(self, rng):
        a = rng.randn(2, 16, 3).astype(np.float32)
        o = rng.randn(2, 16, 3).astype(np.float32)
        got = np.asarray(losses.hausdorff_loss(jnp.array(a), jnp.array(o)))
        sq = np.sum((a[:, :, None] - o[:, None]) ** 2, -1)
        np.testing.assert_allclose(got, sq.min(2).max(1), atol=1e-4)

    def test_uniform_loss_scalar_finite(self, rng):
        pc = rng.rand(2, 256, 3).astype(np.float32) * 2 - 1
        val = float(losses.uniform_loss(jnp.array(pc)))
        assert np.isfinite(val) and val >= 0

    def test_uniform_loss_deterministic(self, rng):
        # FPS start is fixed at index 0 (CUDA parity) -> deterministic
        pc = rng.rand(1, 512, 3).astype(np.float32) * 2 - 1
        l1 = float(losses.uniform_loss(jnp.array(pc)))
        l2 = float(losses.uniform_loss(jnp.array(pc)))
        assert l1 == l2

    @pytest.mark.parametrize("n", [100, 124, 125, 128, 256])
    def test_uniform_loss_small_n_crossover(self, n):
        """Pin the documented deviation: the reference's uniform_loss
        NaNs when a disk has no neighbor ring (`FGM/GeoA3_args.py:
        258-303`, nsample = int(n*4p) < 2, reachable below N=125 for
        p=0.004); ours skips exactly those percentage terms and
        averages over the survivors. The crossover is int(n*4p) >= 2,
        i.e. all five terms are active iff N >= 125."""
        ps = (0.004, 0.006, 0.008, 0.010, 0.012)
        active = tuple(p for p in ps if int(n * p * 4) >= 2)
        assert (len(active) == len(ps)) == (n >= 125)

        pc = np.random.RandomState(n).rand(2, n, 3).astype(np.float32)
        full = float(losses.uniform_loss(jnp.array(pc)))
        manual = float(losses.uniform_loss(jnp.array(pc),
                                           percentages=active))
        assert np.isfinite(full) and full >= 0
        # equality proves the skip hits exactly the under-populated
        # terms AND the divisor is the surviving-term count
        np.testing.assert_allclose(full, manual, rtol=1e-6)

    def test_knn_smoothing(self, rng):
        pc = rng.rand(2, 64, 3).astype(np.float32)
        out = np.asarray(losses.knn_smoothing_loss(jnp.array(pc), k=5))
        assert out.shape == (2,)
        assert (out >= 0).all()

    def test_estimate_normal_planar(self):
        rng = np.random.RandomState(2)
        pc = np.zeros((1, 128, 3), np.float32)
        pc[0, :, :2] = rng.rand(128, 2)
        n = np.asarray(losses.estimate_normal(jnp.array(pc), k=8))
        # normals of a z=0 plane are +-z
        np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-3)
        np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-3)

    def test_displacement_loss_zero_for_rigid_shift(self, rng):
        ori = rng.rand(1, 32, 3).astype(np.float32)
        adv = ori + 0.5                                       # uniform shift
        out = np.asarray(losses.displacement_loss(jnp.array(adv),
                                                  jnp.array(ori), k=4))
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_jitter_bounds(self):
        j = np.asarray(losses.jitter_input(jax.random.PRNGKey(0),
                                           (2, 64, 3), sigma=0.5, clip=0.05))
        assert np.abs(j).max() <= 0.05 + 1e-7


class TestLPIPS:
    def test_zero_for_identical(self, rng):
        feats = [jnp.array(rng.randn(2, 32, 8).astype(np.float32)),
                 jnp.array(rng.randn(2, 32, 16).astype(np.float32))]
        d = np.asarray(losses.lpips_distance(feats, feats))
        np.testing.assert_allclose(d, 0.0, atol=1e-6)

    def test_positive_for_different(self, rng):
        f1 = [jnp.array(rng.randn(2, 32, 8).astype(np.float32))]
        f2 = [jnp.array(rng.randn(2, 32, 8).astype(np.float32))]
        d = np.asarray(losses.lpips_distance(f1, f2))
        assert (d > 0).all()


class TestGradFlow:
    @pytest.mark.parametrize("fn", [
        lambda a, o: losses.chamfer_dist(a, o).sum(),
        lambda a, o: losses.hausdorff_dist(a, o).sum(),
        lambda a, o: losses.knn_dist(a).sum(),
        lambda a, o: losses.l2_dist(a, o).sum(),
        lambda a, o: losses.chamfer_knn_dist(a, o).sum(),
    ])
    def test_losses_differentiable(self, rng, fn):
        a = jnp.array(rng.randn(2, 32, 3).astype(np.float32))
        o = jnp.array(rng.randn(2, 32, 3).astype(np.float32))
        g = jax.grad(fn)(a, o)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestSmoothedCE:
    def test_matches_formula(self, rng):
        logits = rng.randn(3, 8).astype(np.float32)
        targets = rng.randint(0, 8, 3)
        got = np.asarray(losses.smoothed_cross_entropy_loss(
            jnp.array(logits), jnp.array(targets), eps=0.2))
        p = softmax_np(logits)
        logp = np.log(p)
        for b in range(3):
            soft = np.full(8, 0.2 / 7)
            soft[targets[b]] = 0.8
            want = -(soft * logp[b]).sum()
            assert abs(got[b] - want) < 1e-5

    def test_eps_zero_equals_ce(self, rng):
        logits = jnp.array(rng.randn(4, 10).astype(np.float32))
        targets = jnp.array(rng.randint(0, 10, 4))
        a = losses.smoothed_cross_entropy_loss(logits, targets, eps=0.0)
        b = losses.cross_entropy_loss(logits, targets)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
