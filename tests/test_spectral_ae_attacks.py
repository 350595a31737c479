"""AOF / AdvPC / SaliencyDrop attack tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import losses
from hitadv_tpu.attacks import advpc, aof, base, drop
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.models import autoencoder, pointnet


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


@pytest.fixture(scope="module")
def ae():
    params = autoencoder.init(jax.random.PRNGKey(7), num_points=128)
    return lambda x: autoencoder.apply(params, x)


def clip(adv, ori):
    return losses.clip_points_linf(adv, ori, 0.18)


class TestLaplacian:
    def test_eigh_properties(self, rng):
        pc = jnp.array(rng.rand(2, 64, 3).astype(np.float32))
        e, v = aof.graph_laplacian(pc, k=10)
        e_np = np.asarray(e)
        # Laplacian PSD: eigenvalues >= 0 (tolerance), ascending
        assert e_np.min() > -1e-4
        assert (np.diff(e_np, axis=1) >= -1e-5).all()
        # first eigenvalue ~ 0 (constant vector in kernel)
        np.testing.assert_allclose(e_np[:, 0], 0.0, atol=1e-4)

    def test_low_pass_reconstruction(self, rng):
        # full-band reconstruction (lfc + hfc) must equal the cloud
        pc = jnp.array(rng.rand(1, 32, 3).astype(np.float32))
        _, V = aof.graph_laplacian(pc, k=8)
        lp = 10
        projs = jnp.einsum("bnc,bnm->bmc", pc, V)
        lfc = jnp.einsum("bmc,bnm->bnc", projs[:, :lp], V[:, :, :lp])
        hfc = jnp.einsum("bmc,bnm->bnc", projs[:, lp:], V[:, :, lp:])
        np.testing.assert_allclose(np.asarray(lfc + hfc), np.asarray(pc),
                                   atol=1e-4)


class TestPartialEigensolver:
    """VERDICT.md Missing #7: Chebyshev-filtered subspace iteration
    replacing the full eigh for the AOF low-band projector."""

    @staticmethod
    def _subspace_dist(V1, V2):
        s = np.linalg.svd(np.asarray(V1).T @ np.asarray(V2),
                          compute_uv=False)
        return float(np.sqrt(max(0.0, 1.0 - s.min() ** 2)))

    def test_converges_below_1e3_f64(self):
        """The acceptance criterion (low_pass=100 @ N=1024, subspace
        distance < 1e-3) in f64, where the comparison is not limited by
        eigh's own f32 floor (~1.5e-3 at this boundary gap)."""
        import jax

        jax.config.update("jax_enable_x64", True)
        try:
            pts, _ = synthetic_clouds(1, num_points=1024, seed=3)
            pc = jnp.asarray(pts[..., :3], jnp.float64)
            _, V_full = aof.graph_laplacian(pc, 30)
            _, V_p = aof.graph_laplacian_partial(pc, 30, 100)
            d = self._subspace_dist(V_full[0, :, :100], V_p[0])
            assert d < 1e-3, d
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_f32_matches_eigh_floor(self, rng):
        pc = jnp.array(rng.rand(2, 256, 3).astype(np.float32))
        lp = 30
        _, V_full = aof.graph_laplacian(pc, 20)
        e_p, V_p = aof.graph_laplacian_partial(pc, 20, lp, guard=16)
        for b in range(2):
            d = self._subspace_dist(V_full[b, :, :lp], V_p[b])
            assert d < 5e-3, d
        # ritz values match the lowest eigenvalues
        e_full, _ = aof.graph_laplacian(pc, 20)
        np.testing.assert_allclose(np.asarray(e_p),
                                   np.asarray(e_full[:, :lp]), atol=1e-3)

    def test_aof_attack_with_subspace_solver(self, victim):
        pts, labels = synthetic_clouds(2, num_points=64, seed=6)
        cfg = aof.AOFConfig(num_iter=4, binary_step=1, low_pass=10,
                            knn=8, eigensolver="subspace",
                            subspace_guard=8)
        attack = aof.make_aof(
            victim, base.make_adv_fn("logits", kappa=0.0,
                                     targeted=False), clip, cfg)
        res = attack(jnp.array(pts), jnp.array(labels),
                     jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        assert adv.shape == (2, 64, 3)
        assert np.isfinite(adv).all()


class TestAOF:
    def test_untargeted(self, victim):
        pts, labels = synthetic_clouds(2, num_points=64, seed=6)
        cfg = aof.AOFConfig(binary_step=1, num_iter=5, low_pass=20,
                            knn=10)
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = aof.make_aof(victim, adv_fn, clip, cfg)
        res = attack(jnp.array(pts[..., :3]), jnp.array(labels),
                     jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()
        delta = np.abs(np.asarray(res.adv_points) - pts[..., :3])
        assert delta.max() <= 0.18 + 1e-5          # final clip

    def test_eigh_in_restart_scan_only(self, victim):
        # Placement guard: the O(N^3) eigh belongs in the RESTART scan
        # (each restart's noisy adv0 gets its own basis, matching the
        # reference recompute per binary step) but must never slip into
        # the inner Adam scan — a silent ~num_iter x compile-size and
        # runtime regression if it does.
        pts, labels = synthetic_clouds(2, num_points=64, seed=6)
        cfg = aof.AOFConfig(binary_step=2, num_iter=3, low_pass=10,
                            knn=8)
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = aof.make_aof(victim, adv_fn, clip, cfg)
        jx = jax.make_jaxpr(attack)(jnp.array(pts[..., :3]),
                                    jnp.array(labels),
                                    jax.random.PRNGKey(0))
        depths = []

        def walk(jaxpr, depth):
            for eqn in jaxpr.eqns:
                if "eig" in eqn.primitive.name:
                    depths.append(depth)
                nxt = depth + (1 if eqn.primitive.name in ("scan",
                                                           "while")
                               else 0)
                for val in eqn.params.values():
                    for item in (val if isinstance(val, (list, tuple))
                                 else [val]):
                        sub = getattr(item, "jaxpr", None)
                        if sub is not None:
                            walk(sub, nxt)

        walk(jx.jaxpr, 0)
        assert depths == [1], depths    # restart scan, not inner

    def test_ae_variant(self, victim, ae):
        pts, labels = synthetic_clouds(2, num_points=128, seed=6)
        cfg = aof.AOFConfig(binary_step=1, num_iter=3, low_pass=20,
                            knn=10, mode="ae_untargeted")
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = aof.make_aof(victim, adv_fn, clip, cfg, ae_fn=ae)
        res = attack(jnp.array(pts[..., :3]), jnp.array(labels),
                     jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(res.adv_points)).all()


class TestAdvPC:
    def test_untargeted(self, victim, ae):
        pts, labels = synthetic_clouds(2, num_points=128, seed=8)
        cfg = advpc.AdvPCConfig(binary_step=1, num_iter=5)
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=False)
        attack = advpc.make_advpc(victim, ae, adv_fn, clip, cfg)
        res = attack(jnp.array(pts[..., :3]), jnp.array(labels),
                     jax.random.PRNGKey(0))
        delta = np.abs(np.asarray(res.adv_points) - pts[..., :3])
        assert delta.max() <= 0.18 + 1e-5
        s = np.asarray(res.success)
        assert (np.asarray(res.pred)[s] != np.asarray(labels)[s]).all()

    def test_targeted_sense(self, victim, ae):
        pts, labels = synthetic_clouds(2, num_points=128, seed=8)
        target = (labels + 1) % 40
        cfg = advpc.AdvPCConfig(binary_step=1, num_iter=5, targeted=True)
        adv_fn = base.make_adv_fn("logits", kappa=0.0, targeted=True)
        attack = advpc.make_advpc(victim, ae, adv_fn, clip, cfg)
        res = attack(jnp.array(pts[..., :3]), jnp.array(target),
                     jax.random.PRNGKey(0), y_truth=jnp.array(labels))
        assert np.isfinite(np.asarray(res.adv_points)).all()


class TestAE:
    def test_roundtrip_shapes_and_fit(self, rng):
        pts, _ = synthetic_clouds(8, num_points=128, seed=9)
        clouds = jnp.array(pts[..., :3])
        params = autoencoder.init(jax.random.PRNGKey(0), num_points=128)
        l0 = float(autoencoder.reconstruction_loss(params, clouds))
        params = autoencoder.fit(params, clouds, jax.random.PRNGKey(1),
                                 steps=30, batch_size=4)
        l1 = float(autoencoder.reconstruction_loss(params, clouds))
        assert l1 < l0                               # training reduces loss
        recon = autoencoder.apply(params, clouds)
        assert recon.shape == clouds.shape


class TestSaliencyDrop:
    def test_drop_counts_and_shape(self, victim):
        pts, labels = synthetic_clouds(2, num_points=128, seed=10)
        cfg = drop.DropConfig(num_drop=20, k=5)
        attack = drop.make_saliency_drop(victim, cfg)
        res = attack(jnp.array(pts), jnp.array(labels))
        assert res.adv_points.shape == (2, 108, 3)
        # survivors are a subset of the original points
        ori_set = {tuple(np.round(p, 5)) for p in pts[0, :, :3]}
        for p in np.asarray(res.adv_points[0]):
            assert tuple(np.round(p, 5)) in ori_set

    def test_partial_last_round(self, victim):
        # num_drop not divisible by k exercises the partial-round mask
        pts, labels = synthetic_clouds(1, num_points=64, seed=11)
        cfg = drop.DropConfig(num_drop=7, k=3)
        attack = drop.make_saliency_drop(victim, cfg)
        res = attack(jnp.array(pts), jnp.array(labels))
        assert res.adv_points.shape == (1, 57, 3)

    def test_sat_forward(self, victim):
        pts, labels = synthetic_clouds(2, num_points=64, seed=12)
        cfg = drop.DropConfig(num_drop=10, k=5)
        fn = drop.make_sat_forward(victim, budget=0.05, cfg=cfg)
        adv_pc, del_pc = fn(jnp.array(pts), jnp.array(labels))
        assert adv_pc.shape == (2, 64, 3)
        assert del_pc.shape == (2, 54, 3)
