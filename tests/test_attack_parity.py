"""Attack-TRAJECTORY parity vs the torch reference, run live on CPU.

Round 1 verified victim logit parity and loss-formula oracles; this file
closes the attack-level gap (VERDICT.md Missing #2): the reference's own
attack classes (`CW/Perturb.py:46-202`, `FGM/FGSM.py:8-300`,
`ShapeAttack/HiT_ADV.py:44-287`) are executed at tiny configs with
`.cuda()` no-op'd, identical victims (converted weights), and identical
random draws, and our scanned engines must reproduce the returned
adversarial clouds and success counts.

Sources of controlled randomness:
  * CW/IFGSM 1e-7 gaussian init noise — NOT matched across frameworks;
    its effect is below the comparison tolerances.
  * PGD's uniform random start — replicated on the torch side by
    patching `Tensor.uniform_` with the exact array our PGD derives
    from its key split.
  * HiT-ADV's per-binary-step uniform inits + random-start FPS —
    pinned via `make_hit_adv(init_overrides=...)` on our side and a
    `torch.rand` queue + fixed-start FPS monkeypatch on the reference.

Tolerances: both sides run f32 CPU with different op orderings, so
trajectories drift ~1e-6/iter; coordinate agreement is asserted at the
fraction level for sign-based attacks (a near-zero gradient coordinate
can legitimately flip sign) and atol level for the smooth optimizers.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_harness as rh

rh.install()

pytestmark = pytest.mark.skipif(not rh.HAS_REFERENCE,
                                reason="reference not mounted")

B, N = 4, 64


@pytest.fixture(scope="module")
def victim():
    return rh.build_pointnet_pair(seed=0)


def _clean_labels(m, x):
    """Labels = the victim's own clean predictions (so untargeted
    success means an actual flip, and both frameworks agree at iter 0)."""
    import torch

    with torch.no_grad():
        lg = m(torch.from_numpy(np.swapaxes(x[..., :3], 1, 2).copy()))
        if isinstance(lg, tuple):
            lg = lg[0]
    return lg.argmax(1)


def _jax_logits_fn(params):
    from hitadv_tpu.models import pointnet

    return lambda p: pointnet.apply(params, p)


def _coord_match(a, b, atol):
    return float(np.mean(np.abs(a - b) < atol))


class TestFGMParity:
    """`FGM/FGSM.py` one-step + iterative sign attacks."""

    def test_fgsm(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGSM import FGSM
        from util.adv_utils import CrossEntropyAdvLoss
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(1).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)

        atk = FGSM(m, CrossEntropyAdvLoss(), budget=0.08, pre_head=None)
        # FGSM.attack only transposes when shape[1] == 1024
        # (`FGM/FGSM.py:76`) — feed it channels-first directly.
        xt = torch.from_numpy(np.swapaxes(x, 1, 2).copy())
        adv_ref, succ_ref = atk.attack(xt, labels, None)
        adv_ref = adv_ref.numpy()                        # [B, N, 3]

        ours = fgm.make_fgsm(_jax_logits_fn(params),
                             base.make_adv_fn("cross_entropy"),
                             fgm.FGMConfig(budget=0.08))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        # sign(grad) may flip on near-zero gradient coords — fraction-level
        assert _coord_match(adv, adv_ref, 1e-5) > 0.99, (
            _coord_match(adv, adv_ref, 1e-5))
        assert int(res.success.sum()) == int(succ_ref)

    def test_ifgsm(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGSM import IFGSM
        from util.adv_utils import CrossEntropyAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(2).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)

        budget, step, iters = 0.08, 0.02, 8
        atk = IFGSM(m, CrossEntropyAdvLoss(), ClipPointsLinf(budget),
                    budget, step, iters, pre_head=None)
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()), labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_ifgsm(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=budget, step_size=step, num_iter=iters))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert _coord_match(adv, adv_ref, 1e-4) > 0.98, (
            _coord_match(adv, adv_ref, 1e-4))
        assert int(res.success.sum()) == int(succ_ref)

    def test_pgd(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGSM import PGD
        from util.adv_utils import CrossEntropyAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(3).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)
        budget, step, iters = 0.08, 0.02, 6
        key = jax.random.PRNGKey(7)

        # replicate our make_pgd's internal key split (`attacks/fgm.py`)
        # so the torch side starts from the identical perturbation
        k1, _ = jax.random.split(key)
        u = np.asarray(jax.random.uniform(
            k1, x.shape, minval=-budget, maxval=budget))

        def fake_uniform_(self, lo, hi):
            assert tuple(self.shape) == u.shape
            self.copy_(torch.from_numpy(u))
            return self

        monkeypatch.setattr(torch.Tensor, "uniform_", fake_uniform_,
                            raising=False)
        atk = PGD(m, CrossEntropyAdvLoss(), ClipPointsLinf(budget),
                  budget, step, iters)
        atk.pre_head = None
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()), labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_pgd(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=budget, step_size=step, num_iter=iters))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)), key)
        adv = np.asarray(res.adv_points)

        assert _coord_match(adv, adv_ref, 1e-4) > 0.98, (
            _coord_match(adv, adv_ref, 1e-4))
        assert int(res.success.sum()) == int(succ_ref)


class TestFGMParityExtended:
    def test_mifgsm(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGSM import MIFGSM
        from util.adv_utils import CrossEntropyAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(6).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)
        budget, step, iters, mu = 0.08, 0.02, 6, 1.0
        atk = MIFGSM(m, CrossEntropyAdvLoss(), ClipPointsLinf(budget),
                     budget, step, iters, mu=mu)
        # reference bug: MIFGSM.__init__ forwards dist_metric into the
        # parent's pre_head slot (`FGM/FGSM.py:199-200`), so get_gradient
        # would call the string 'linf' — any real run must null it
        atk.pre_head = None
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()), labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_mifgsm(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=budget, step_size=step, num_iter=iters,
                          mu=mu))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        assert _coord_match(adv, adv_ref, 1e-4) > 0.98
        assert int(res.success.sum()) == int(succ_ref)

    def test_fgm_l2(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGM_l2 import FGM_l2
        from util.adv_utils import CrossEntropyAdvLoss
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(7).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)
        atk = FGM_l2(m, CrossEntropyAdvLoss(), budget=0.5, pre_head=None)
        # transpose gate is `shape[1] == 1024` — feed channels-first
        xt = torch.from_numpy(np.swapaxes(x, 1, 2).copy())
        adv_ref, succ_ref = atk.attack(xt, labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_fgm_l2(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=0.5))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        # l2-normalized (not sign) step -> smooth, tight tolerance
        np.testing.assert_allclose(adv, adv_ref, atol=1e-4)
        assert int(res.success.sum()) == int(succ_ref)

    def test_ifgm_l2(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGM_l2 import IFGM_l2
        from util.adv_utils import CrossEntropyAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(8).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)
        budget, step, iters = 0.2, 0.05, 6
        atk = IFGM_l2(m, CrossEntropyAdvLoss(), ClipPointsLinf(budget),
                      budget, step, iters, pre_head=None)
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()), labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_ifgm_l2(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=budget, step_size=step, num_iter=iters))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        np.testing.assert_allclose(adv, adv_ref, atol=5e-4)
        assert int(res.success.sum()) == int(succ_ref)


class TestFGSMRSParity:
    def test_fgsm_rs(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from FGM.FGSM import FGSM_RS
        from util.adv_utils import CrossEntropyAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu.attacks import base, fgm

        m, params = victim
        x = np.random.RandomState(16).randn(B, N, 3).astype(
            np.float32) * .5
        labels = _clean_labels(m, x)
        budget = 0.08
        key = jax.random.PRNGKey(17)

        # replicate our make_fgsm_rs init draw so torch starts identically
        u = np.asarray(jax.random.uniform(
            key, x.shape, minval=-budget, maxval=budget))

        def fake_uniform_(self, lo, hi):
            assert tuple(self.shape) == u.shape
            self.copy_(torch.from_numpy(u))
            return self

        monkeypatch.setattr(torch.Tensor, "uniform_", fake_uniform_,
                            raising=False)
        atk = FGSM_RS(m, CrossEntropyAdvLoss(), budget,
                      ClipPointsLinf(budget))
        atk.pre_head = None
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                       labels)
        adv_ref = adv_ref.numpy()

        ours = fgm.make_fgsm_rs(
            _jax_logits_fn(params), base.make_adv_fn("cross_entropy"),
            fgm.FGMConfig(budget=budget))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)), key)
        adv = np.asarray(res.adv_points)
        assert _coord_match(adv, adv_ref, 1e-4) > 0.99, (
            _coord_match(adv, adv_ref, 1e-4))
        assert int(res.success.sum()) == int(succ_ref)


class TestSaliencyDropParity:
    """`Saliency/Drop.py:49-113` — iterative saliency-scored dropping."""

    def test_dropped_sets_match(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from Saliency.Drop import SaliencyDrop
        from hitadv_tpu.attacks import drop

        m, params = victim
        x = np.random.RandomState(9).randn(B, N, 3).astype(np.float32) * .5
        labels = _clean_labels(m, x)
        num_drop, k = 10, 4
        atk = SaliencyDrop(m, num_drop=num_drop, alpha=1, k=k)
        xt = torch.from_numpy(np.swapaxes(x, 1, 2).copy())  # [B, 3, N]
        adv_ref, succ_ref = atk.attack(xt, labels)           # [B, N-10, 3]

        ours = drop.make_saliency_drop(
            _jax_logits_fn(params),
            drop.DropConfig(num_drop=num_drop, k=k, alpha=1.0))
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)))
        adv = np.asarray(res.adv_points)

        assert adv.shape == adv_ref.shape == (B, N - num_drop, 3)
        # survivor SETS must match (orderings differ by construction)
        for b in range(B):
            want = {tuple(np.round(p, 5)) for p in adv_ref[b]}
            got = {tuple(np.round(p, 5)) for p in adv[b]}
            assert got == want, f"batch {b}: {len(got & want)} common"
        assert int(res.success.sum()) == int(succ_ref)


class TestAOFParity:
    """`CW/AOF.py:54-241` — spectral lfc optimization, live on CPU."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch

        # torch.symeig was removed in torch 2.x; the reference calls it
        # (`CW/AOF.py:50`) — shim with the modern equivalent (both
        # return ascending eigenpairs)
        monkeypatch.setattr(
            torch, "symeig",
            lambda M, eigenvectors=True: torch.linalg.eigh(M),
            raising=False)
        from CW.AOF import CWAOF
        from util.adv_utils import UntargetedLogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import aof, base

        m, params = victim
        x = np.random.RandomState(10).randn(B, N, 3).astype(
            np.float32) * .5
        labels = _clean_labels(m, x)
        # num_iter >= 5: the reference prints every num_iter//5 iters
        budget, lp, iters = 0.18, 10, 5

        # pin the 1e-7 init noise (V is computed from the noisy cloud)
        noise = np.random.RandomState(41).randn(
            1, B, N, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[0], 1, 2) / 1e-7]))

        atk = CWAOF(m, UntargetedLogitsAdvLoss(kappa=0.0), None,
                    attack_lr=1e-2, binary_step=1, num_iter=iters,
                    GAMMA=0.5, low_pass=lp,
                    clip_func=ClipPointsLinf(budget))
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                       labels)

        cfg = aof.AOFConfig(attack_lr=1e-2, binary_step=1,
                            num_iter=iters, gamma=0.5, low_pass=lp,
                            mode="untargeted")
        clip = lambda a, o: losses.clip_points_linf(a, o, budget)  # noqa: E731
        ours = aof.make_aof(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=0.0, targeted=False),
            clip, cfg, init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        # eigh eigenvectors of near-degenerate Laplacian eigenvalues are
        # float-sensitive across LAPACK implementations; the projector
        # is stable but a few coordinates drift through 5 Adam steps
        assert _coord_match(adv, adv_ref, 5e-3) > 0.995, (
            _coord_match(adv, adv_ref, 5e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestCWPerturbParity:
    """`CW/Perturb.py:46-202`: binary search + Adam + best bookkeeping."""

    def test_trajectory_and_bookkeeping(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.Perturb import CWPerturb
        from util.adv_utils import LogitsAdvLoss
        from util.dist_utils import L2Dist
        from hitadv_tpu.attacks import base, cw

        m, params = victim
        x = np.random.RandomState(4).randn(B, N, 3).astype(np.float32) * .5
        clean = _clean_labels(m, x)
        # mixed targets: half "attack to current pred" (succeeds at
        # iter 0 -> exercises the best-dist argmin + binary search
        # success branch), half far targets (fails in 10 tiny iters ->
        # exercises the last-iterate fallback, `CW/Perturb.py:191-196`)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 17) % 40

        # pin the per-step 1e-7 init noise: its *direction* is the
        # iteration-0 L2-dist gradient, so it must match across
        # frameworks (`CW/Perturb.py:79-80`)
        S = 2
        noise = np.random.RandomState(40).randn(
            S, B, N, 3).astype(np.float32) * 1e-7
        # torch draws [B, 3, K] then scales by 1e-7 itself
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[s], 1, 2) / 1e-7
                          for s in range(S)]))

        atk = CWPerturb(m, LogitsAdvLoss(kappa=1.0), L2Dist(),
                        attack_lr=1e-2, init_weight=10., max_weight=80.,
                        binary_step=S, num_iter=5)
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()), target)
        # reference returns numpy [B, N, 3]

        cfg = cw.CWConfig(attack_lr=1e-2, init_weight=10., max_weight=80.,
                          binary_step=S, num_iter=5, targeted=True)
        ours = cw.make_cw_perturb(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            cfg=cfg, init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        np.testing.assert_allclose(adv, adv_ref, atol=2e-4)
        assert int(res.success.sum()) == int(succ_ref)
        # per-example success sense: first half targeted-hit
        assert bool(np.all(np.asarray(res.success)[:B // 2]))


class TestCWKNNParity:
    """`CW/kNN.py:14-151` / `CW/UKNN.py` — Adam + ChamferkNNDist + clip."""

    def test_cw_knn_targeted(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.kNN import CWKNN
        from util.adv_utils import LogitsAdvLoss
        from util.clip_utils import ProjectInnerClipLinf
        from util.dist_utils import ChamferkNNDist
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import base, cw

        m, params = victim
        x = np.random.RandomState(12).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 5) % 40
        budget, iters = 0.18, 8

        atk = CWKNN(m, LogitsAdvLoss(kappa=1.0), ChamferkNNDist(),
                    ProjectInnerClipLinf(budget), attack_lr=1e-3,
                    num_iter=iters)
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                       target)
        adv_ref = adv_ref                                    # [B, N, 3]

        ours = cw.make_cw_knn(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            losses.chamfer_knn_dist,
            # no normals in the input -> reference's inner projection
            # is the identity, only the linf clip applies
            clip_fn=lambda a, o, n: losses.clip_points_linf(a, o,
                                                            budget),
            cfg=cw.CWKNNConfig(attack_lr=1e-3, num_iter=iters,
                               targeted=True))
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        # KNNDist's outlier cutoff (mean + alpha*std) is a hard
        # threshold: near-boundary points flip between frameworks and
        # their gradient masks diverge by ~1e-3 over the iterations
        np.testing.assert_allclose(adv, adv_ref, atol=2e-3)
        assert int(res.success.sum()) == int(succ_ref)

    def test_cw_uknn_normals_projection(self, victim, monkeypatch):
        """Untargeted variant with normals — exercises the AAAI'20
        inner-point projection (`util/clip_utils.py:90-140`)."""
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.UKNN import CWUKNN
        from util.adv_utils import UntargetedLogitsAdvLoss
        from util.clip_utils import ProjectInnerClipLinf
        from util.dist_utils import ChamferkNNDist
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import base, cw
        from hitadv_tpu.data import synthetic_clouds

        m, params = victim
        pts, _ = synthetic_clouds(B, num_points=N, seed=13)  # [B, N, 6]
        pts = np.asarray(pts, np.float32)
        labels = _clean_labels(m, pts)
        budget, iters = 0.18, 8

        atk = CWUKNN(m, UntargetedLogitsAdvLoss(kappa=0.0),
                     ChamferkNNDist(), ProjectInnerClipLinf(budget),
                     attack_lr=1e-3, num_iter=iters)
        adv_ref, succ_ref = atk.attack(torch.from_numpy(pts.copy()),
                                       labels)

        ours = cw.make_cw_knn(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=0.0, targeted=False),
            losses.chamfer_knn_dist,
            clip_fn=lambda a, o, n: losses.project_inner_clip_linf(
                a, o, budget, n),
            cfg=cw.CWKNNConfig(attack_lr=1e-3, num_iter=iters,
                               targeted=False))
        res = ours(jnp.asarray(pts),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)
        np.testing.assert_allclose(adv, adv_ref, atol=2e-3)
        assert int(res.success.sum()) == int(succ_ref)


class TestCWAddParity:
    """`CW/Add.py:45-220` — optimize only the added points, critical-
    point seeding, binary search over the chamfer weight."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.Add import CWAdd
        from util.adv_utils import LogitsAdvLoss
        from util.dist_utils import ChamferDist
        from hitadv_tpu.attacks import add, base

        m, params = victim
        x = np.random.RandomState(15).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 11) % 40
        S, num_add, iters = 2, 16, 5

        # pin init noise: added points start ON original points, so the
        # iteration-0 chamfer gradient direction IS the noise direction
        noise = np.random.RandomState(42).randn(
            S, B, num_add, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[s], 1, 2) / 1e-7
                          for s in range(S)]))

        atk = CWAdd(m, LogitsAdvLoss(kappa=1.0), ChamferDist(),
                    attack_lr=1e-2, init_weight=5e3, max_weight=4e4,
                    binary_step=S, num_iter=iters, num_add=num_add)
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          target)
        # reference returns [B, N + num_add, 3] (ori ++ added)

        ours = add.make_cw_add(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            cfg=add.AddConfig(attack_lr=1e-2, init_weight=5e3,
                              max_weight=4e4, binary_step=S,
                              num_iter=iters, num_add=num_add),
            init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert adv.shape == adv_ref.shape == (B, N + num_add, 3)
        # the original points pass through untouched
        np.testing.assert_allclose(adv[:, :N], x, atol=1e-6)
        # added points: the chamfer adv2ori argmin flips between
        # frameworks when a moved point sits near-equidistant to two
        # originals, so a few coordinates diverge — fraction-level
        assert _coord_match(adv, adv_ref, 2e-3) > 0.95, (
            _coord_match(adv, adv_ref, 2e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestCWAddClustersParity:
    """`CW/Add_Cluster.py:48-278` — FarChamferDist cluster attack.

    Both sides get the SAME cluster seeds (the seeding itself is
    host-side randomized sampling; sampling order cannot be synced
    across implementations, so it is injected) and pinned init noise.
    """

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.Add_Cluster import CWAddClusters
        from util.adv_utils import CrossEntropyAdvLoss
        from util.dist_utils import FarChamferDist
        from hitadv_tpu.attacks import add, base

        m, params = victim
        x = np.random.RandomState(18).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 13) % 40
        S, num_add, clp, iters = 2, 2, 8, 5
        A = num_add * clp

        # shared seeds: our DBSCAN seeding over our critical points
        cri = add.get_critical_points(
            _jax_logits_fn(params), jnp.asarray(x),
            jnp.asarray(target.numpy().astype(np.int32)), 32)
        seeds = add._cluster_seeds(np.asarray(cri), num_add, clp,
                                   np.random.RandomState(3))
        monkeypatch.setattr(CWAddClusters, "_init_centers",
                            lambda self, pc, label: seeds)

        noise = np.random.RandomState(43).randn(
            S, B, A, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[s], 1, 2) / 1e-7
                          for s in range(S)]))

        # CE objective: the margin loss's clamp is a hard boundary that
        # flips whole examples' gradients on/off between frameworks
        # (clamp activation differs at ~1e-4 logit drift); the margin
        # formula itself is covered by the CWPerturb/KNN parity tests
        atk = CWAddClusters(m, CrossEntropyAdvLoss(),
                            FarChamferDist(num_add=num_add),
                            attack_lr=1e-2, init_weight=5., max_weight=30.,
                            binary_step=S, num_iter=iters,
                            num_add=num_add, cl_num_p=clp)
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          target)

        ours = add.make_cw_add_clusters(
            _jax_logits_fn(params),
            base.make_adv_fn("cross_entropy"),
            cfg=add.AddClusterConfig(attack_lr=1e-2, init_weight=5.,
                                     max_weight=30., binary_step=S,
                                     num_iter=iters, num_add=num_add,
                                     cl_num_p=clp),
            init_overrides={
                "clusters": seeds.reshape(B, A, 3).astype(np.float32),
                "noise": noise,
            })
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert adv.shape == adv_ref.shape == (B, N + A, 3)
        np.testing.assert_allclose(adv[:, :N], x, atol=1e-6)
        # Added points start as EXACT duplicates of originals, so the
        # victim's max-pool hits exact f32 feature ties — torch routes
        # the tie gradient to the first index, jax splits it evenly.
        # That subgradient choice is inherent cross-framework
        # divergence for the Add family; ~10% of added coordinates fork
        # while the rest track the reference.
        assert _coord_match(adv, adv_ref, 2e-3) > 0.85, (
            _coord_match(adv, adv_ref, 2e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestAdvPCParity:
    """`CW/AdvPC.py:40-180` — AE-regularized CW, targeted sense."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.AdvPC import CWAdvPC
        from util.adv_utils import LogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import advpc, base
        from hitadv_tpu.models import autoencoder

        m, params = victim
        x = np.random.RandomState(14).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = (clean + 9) % 40
        budget, iters = 0.18, 5

        ae_params = autoencoder.init(jax.random.PRNGKey(2),
                                     num_points=N)
        t_ae = rh.build_torch_ae(ae_params, N)
        # AE mirror sanity: same reconstruction both frameworks
        with torch.no_grad():
            want = t_ae(torch.from_numpy(
                np.swapaxes(x, 1, 2).copy())).numpy()
        got = np.asarray(autoencoder.apply(ae_params, jnp.asarray(x)))
        np.testing.assert_allclose(got, np.swapaxes(want, 1, 2),
                                   atol=2e-4)

        atk = CWAdvPC(m, t_ae, LogitsAdvLoss(kappa=1.0), None,
                      attack_lr=1e-2, binary_step=1, num_iter=iters,
                      GAMMA=0.5, clip_func=ClipPointsLinf(budget))
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          target, clean)

        ours = advpc.make_advpc(
            _jax_logits_fn(params),
            lambda p: autoencoder.apply(ae_params, p),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            lambda a, o: losses.clip_points_linf(a, o, budget),
            advpc.AdvPCConfig(attack_lr=1e-2, binary_step=1,
                              num_iter=iters, gamma=0.5, targeted=True))
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0),
                   y_truth=jnp.asarray(clean.numpy().astype(np.int32)))
        adv = np.asarray(res.adv_points)
        # the unpinned 1e-7 init noise (torch global RNG state depends
        # on test order) forks a couple of coordinates by ~5e-3
        assert _coord_match(adv, adv_ref, 2e-3) > 0.99, (
            _coord_match(adv, adv_ref, 2e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestHiTADVParity:
    """`ShapeAttack/HiT_ADV.py:44-287` with every random draw pinned."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from ShapeAttack.HiT_ADV import HiT_ADV
        from util.adv_utils import UntargetedLogitsAdvLoss
        from hitadv_tpu.attacks import base, hit_adv
        from hitadv_tpu.data import synthetic_clouds

        m, params = victim
        pts, _ = synthetic_clouds(B, num_points=N, seed=5)   # [B, N, 6]
        pts = np.asarray(pts, np.float32)
        labels = _clean_labels(m, pts)

        S, Cn, Tc, k = 2, 8, 12, 4
        kwargs = dict(attack_lr=1e-2, init_weight=10., max_weight=80.,
                      binary_step=S, num_iter=5, cd_weight=1e-4,
                      ker_weight=1.0, hide_weight=1.0, curv_loss_knn=k,
                      central_num=Cn, total_central_num=Tc,
                      max_sigm=1.2, min_sigm=0.1, budget=0.55)
        atk = HiT_ADV(m, UntargetedLogitsAdvLoss(kappa=30.), **kwargs)
        monkeypatch.setattr(atk, "farthest_point_sample",
                            rh.torch_fps_fixed_start())

        draws = np.random.RandomState(11)
        u_pert = draws.rand(S, B, Cn, 3).astype(np.float32)
        u_delta = draws.rand(S, B, Cn).astype(np.float32)
        queue = []
        for s in range(S):
            queue += [u_pert[s], u_delta[s]]
        monkeypatch.setattr(torch, "rand", rh.RandQueue(queue))

        adv_ref, succ_ref = atk.attack(torch.from_numpy(pts.copy()),
                                       labels)
        # reference returns numpy [B, N, 3]

        cfg = hit_adv.HiTADVConfig(
            attack_lr=1e-2, init_weight=10., max_weight=80.,
            binary_step=S, num_iter=5, cd_weight=1e-4, ker_weight=1.0,
            hide_weight=1.0, curv_loss_knn=k, central_num=Cn,
            total_central_num=Tc, max_sigm=1.2, min_sigm=0.1,
            budget=0.55)
        overrides = {
            "pert": u_pert * 0.55,
            "delta": 0.1 + u_delta * (1.2 - 0.1),
        }
        ours = hit_adv.make_hit_adv(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=30.0, targeted=False),
            cfg, init_overrides=overrides)
        res = ours(jnp.asarray(pts),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        np.testing.assert_allclose(adv, adv_ref, atol=2e-3)
        assert int(res.success.sum()) == int(succ_ref)


class TestCWPerturbTParity:
    """`CW/PerturbT.py:13-183` — the Perturb skeleton with a per-step
    linf clip (`:139-141`) and an unconditional input transpose."""

    def test_trajectory_with_clip(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.PerturbT import CWPerturbT
        from util.adv_utils import LogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from util.dist_utils import L2Dist
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import base, cw

        m, params = victim
        x = np.random.RandomState(20).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 17) % 40
        S, iters, budget = 2, 5, 0.06   # tight budget so the clip BITES

        noise = np.random.RandomState(44).randn(
            S, B, N, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[s], 1, 2) / 1e-7
                          for s in range(S)]))

        atk = CWPerturbT(m, LogitsAdvLoss(kappa=1.0), L2Dist(),
                         attack_lr=1e-2, init_weight=10., max_weight=80.,
                         binary_step=S, num_iter=iters,
                         clip_func=ClipPointsLinf(budget))
        adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                       target)

        cfg = cw.CWConfig(attack_lr=1e-2, init_weight=10.,
                          max_weight=80., binary_step=S, num_iter=iters,
                          targeted=True)
        ours = cw.make_cw_perturb(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            cfg=cfg,
            clip_fn=lambda a, o: losses.clip_points_linf(a, o, budget),
            init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        np.testing.assert_allclose(adv, adv_ref, atol=2e-4)
        assert int(res.success.sum()) == int(succ_ref)
        # the clip must actually constrain: some offsets at the boundary
        assert np.max(np.abs(adv - x)) <= budget + 1e-5


class TestTAOFParity:
    """`CW/TAOF.py:54-242` — targeted AOF: bookkeeping needs
    pred == target AND lfc_pred != y_truth (:203); unlike AOF the final
    clip is skipped (:232, commented out)."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch

        monkeypatch.setattr(
            torch, "symeig",
            lambda M, eigenvectors=True: torch.linalg.eigh(M),
            raising=False)
        from CW.TAOF import CWTAOF
        from util.adv_utils import LogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import aof, base

        m, params = victim
        x = np.random.RandomState(21).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 17) % 40
        budget, lp, iters = 0.18, 10, 5

        noise = np.random.RandomState(45).randn(
            1, B, N, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[0], 1, 2) / 1e-7]))

        atk = CWTAOF(m, LogitsAdvLoss(kappa=1.0), None,
                     attack_lr=1e-2, binary_step=1, num_iter=iters,
                     GAMMA=0.5, low_pass=lp,
                     clip_func=ClipPointsLinf(budget))
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          target, y_truth=clean)

        cfg = aof.AOFConfig(attack_lr=1e-2, binary_step=1,
                            num_iter=iters, gamma=0.5, low_pass=lp,
                            mode="targeted")
        clip = lambda a, o: losses.clip_points_linf(a, o, budget)  # noqa: E731
        ours = aof.make_aof(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            clip, cfg, init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0),
                   y_truth=jnp.asarray(clean.numpy().astype(np.int32)))
        adv = np.asarray(res.adv_points)

        # same eigh LAPACK drift tolerance as the AOF test
        assert _coord_match(adv, adv_ref, 5e-3) > 0.995, (
            _coord_match(adv, adv_ref, 5e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestUAEAOFParity:
    """`CW/UAEAOF.py:54-241` — AE-regularized AOF: loss mixes
    (1-2Γ)·full + Γ·ae + Γ·lfc (:143-162); bookkeeping reuses the
    PRE-step logits with the post-step coords (:180-205)."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch

        monkeypatch.setattr(
            torch, "symeig",
            lambda M, eigenvectors=True: torch.linalg.eigh(M),
            raising=False)
        from CW.UAEAOF import CWUAEAOF
        from util.adv_utils import UntargetedLogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import aof, base
        from hitadv_tpu.models import autoencoder

        m, params = victim
        x = np.random.RandomState(22).randn(B, N, 3).astype(
            np.float32) * .5
        labels = _clean_labels(m, x)
        budget, lp, iters, gamma = 0.18, 10, 5, 0.25

        ae_params = autoencoder.init(jax.random.PRNGKey(3),
                                     num_points=N)
        t_ae = rh.build_torch_ae(ae_params, N)

        noise = np.random.RandomState(46).randn(
            1, B, N, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[0], 1, 2) / 1e-7]))

        atk = CWUAEAOF(m, t_ae, UntargetedLogitsAdvLoss(kappa=0.0),
                       None, attack_lr=1e-2, binary_step=1,
                       num_iter=iters, GAMMA=gamma, low_pass=lp,
                       clip_func=ClipPointsLinf(budget))
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          labels)

        cfg = aof.AOFConfig(attack_lr=1e-2, binary_step=1,
                            num_iter=iters, gamma=gamma, low_pass=lp,
                            mode="ae_untargeted")
        clip = lambda a, o: losses.clip_points_linf(a, o, budget)  # noqa: E731
        ours = aof.make_aof(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=0.0, targeted=False),
            clip, cfg,
            ae_fn=lambda p: autoencoder.apply(ae_params, p),
            init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert _coord_match(adv, adv_ref, 5e-3) > 0.995, (
            _coord_match(adv, adv_ref, 5e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestUAdvPCParity:
    """`CW/UAdvPC.py:10-167` — untargeted AdvPC: stale PRE-step
    pred/ae_pred paired with post-step clipped coords (:109-132) and
    the GAMMA < 0.001 escape on the AE condition (:129)."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.UAdvPC import CWUAdvPC
        from util.adv_utils import UntargetedLogitsAdvLoss
        from util.clip_utils import ClipPointsLinf
        from hitadv_tpu import losses
        from hitadv_tpu.attacks import advpc, base
        from hitadv_tpu.models import autoencoder

        m, params = victim
        x = np.random.RandomState(23).randn(B, N, 3).astype(
            np.float32) * .5
        labels = _clean_labels(m, x)
        budget, iters, S = 0.18, 5, 2

        ae_params = autoencoder.init(jax.random.PRNGKey(4),
                                     num_points=N)
        t_ae = rh.build_torch_ae(ae_params, N)

        noise = np.random.RandomState(47).randn(
            S, B, N, 3).astype(np.float32) * 1e-7
        monkeypatch.setattr(
            torch, "randn",
            rh.RandQueue([np.swapaxes(noise[s], 1, 2) / 1e-7
                          for s in range(S)]))

        atk = CWUAdvPC(m, t_ae, UntargetedLogitsAdvLoss(kappa=0.0),
                       None, attack_lr=1e-2, binary_step=S,
                       num_iter=iters, GAMMA=0.5,
                       clip_func=ClipPointsLinf(budget))
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          labels)

        ours = advpc.make_advpc(
            _jax_logits_fn(params),
            lambda p: autoencoder.apply(ae_params, p),
            base.make_adv_fn("logits", kappa=0.0, targeted=False),
            lambda a, o: losses.clip_points_linf(a, o, budget),
            advpc.AdvPCConfig(attack_lr=1e-2, binary_step=S,
                              num_iter=iters, gamma=0.5,
                              targeted=False),
            init_overrides={"noise": noise})
        res = ours(jnp.asarray(x),
                   jnp.asarray(labels.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert _coord_match(adv, adv_ref, 2e-3) > 0.99, (
            _coord_match(adv, adv_ref, 2e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestCWAddObjectsParity:
    """`CW/Add_Objects.py:50-367` — rigid objects with learned
    shape/shift/y-rotation, mod-2π angle wrap, L2ChamferDist."""

    def test_trajectory(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from CW.Add_Objects import CWAddObjects
        from util.adv_utils import LogitsAdvLoss
        from util.dist_utils import L2ChamferDist
        from hitadv_tpu.attacks import add, base

        m, params = victim
        x = np.random.RandomState(24).randn(B, N, 3).astype(
            np.float32) * .5
        clean = _clean_labels(m, x)
        target = clean.clone()
        target[B // 2:] = (clean[B // 2:] + 11) % 40
        S, na, op, iters = 2, 2, 16, 5
        A = na * op

        # pinned processed objects (both sides bypass their own
        # shuffle/normalize of the raw object cloud)
        objects = (np.random.RandomState(50)
                   .randn(na, op, 3).astype(np.float32) * 0.3)
        # pinned DBSCAN shift seeds: our seeding over our critical points
        cri = add.get_critical_points(
            _jax_logits_fn(params), jnp.asarray(x),
            jnp.asarray(target.numpy().astype(np.int32)), 32)
        centers = add._cluster_seeds(np.asarray(cri), na, 1,
                                     np.random.RandomState(5),
                                     as_centers=True)  # [B, na, 3]
        monkeypatch.setattr(CWAddObjects, "_init_centers",
                            lambda self, pc, label: centers)

        draws = np.random.RandomState(48)
        noise_obj = draws.randn(S, B, na, op, 3).astype(
            np.float32) * 1e-7
        noise_shift = draws.randn(S, B, na, 3).astype(np.float32) * 1e-7
        u_angles = draws.rand(S, B, na, 3).astype(np.float32)
        # torch draws randn in [B, na, op, 3]/[B, na, 3] layout directly
        # (`CW/Add_Objects.py:229-235`) and rand_like for angles (:239)
        queue = []
        for s in range(S):
            queue += [noise_obj[s] / 1e-7, noise_shift[s] / 1e-7]
        monkeypatch.setattr(torch, "randn", rh.RandQueue(queue))
        angle_queue = rh.RandQueue([u_angles[s] for s in range(S)])
        monkeypatch.setattr(
            torch, "rand_like",
            lambda t, **k: angle_queue(*tuple(t.shape)))

        atk = CWAddObjects(m, LogitsAdvLoss(kappa=1.0),
                           L2ChamferDist(num_add=na),
                           object_pc=np.random.RandomState(51)
                           .randn(64, 3).astype(np.float32),
                           attack_lr=1e-2, init_weight=5.,
                           max_weight=40., binary_step=S,
                           num_iter=iters, num_add=na, obj_num_p=op,
                           scaling=0.3)
        atk.object_pc = objects.astype(np.float64)  # pin processed objs
        _, adv_ref, succ_ref = atk.attack(torch.from_numpy(x.copy()),
                                          target)

        ours = add.make_cw_add_objects(
            _jax_logits_fn(params),
            base.make_adv_fn("logits", kappa=1.0, targeted=True),
            cfg=add.AddObjectConfig(attack_lr=1e-2, init_weight=5.,
                                    max_weight=40., binary_step=S,
                                    num_iter=iters, num_add=na,
                                    obj_num_p=op),
            init_overrides={
                "objects": objects,
                "centers": centers.astype(np.float32),
                "noise_obj": noise_obj,
                "noise_shift": noise_shift,
                "angles": u_angles * np.pi,
            })
        res = ours(jnp.asarray(x),
                   jnp.asarray(target.numpy().astype(np.int32)),
                   jax.random.PRNGKey(0))
        adv = np.asarray(res.adv_points)

        assert adv.shape == adv_ref.shape == (B, N + A, 3)
        np.testing.assert_allclose(adv[:, :N], x, atol=1e-6)
        # free-floating objects: the chamfer argmin can flip between
        # frameworks near ties (same as the Add/Add-Cluster tests)
        assert _coord_match(adv, adv_ref, 2e-3) > 0.9, (
            _coord_match(adv, adv_ref, 2e-3))
        assert int(res.success.sum()) == int(succ_ref)


class TestSatForwardParity:
    """`Saliency/Drop.py:115-165` — drop+FGM hybrid: FGM-perturb the
    num_drop most salient points, delete them from the other copy."""

    def test_outputs_match(self, victim, monkeypatch):
        rh.patch_cuda(monkeypatch)
        import torch
        from Saliency.Drop import SaliencyDrop
        from hitadv_tpu.attacks import drop

        m, params = victim
        x = np.random.RandomState(25).randn(B, N, 3).astype(
            np.float32) * .5
        labels = _clean_labels(m, x)
        num_drop, budget = 10, 0.08

        atk = SaliencyDrop(m, num_drop=num_drop, alpha=1, k=4)
        # sat_forward transposes unconditionally (`Drop.py:124`)
        adv_ref, del_ref = atk.sat_forward(torch.from_numpy(x.copy()),
                                           labels, budget)
        adv_ref, del_ref = adv_ref.numpy(), del_ref.numpy()

        ours = drop.make_sat_forward(
            _jax_logits_fn(params), budget,
            drop.DropConfig(num_drop=num_drop, alpha=1.0))
        adv, del_pc = ours(jnp.asarray(x),
                           jnp.asarray(labels.numpy().astype(np.int32)))
        adv, del_pc = np.asarray(adv), np.asarray(del_pc)

        assert adv.shape == adv_ref.shape == (B, N, 3)
        assert del_pc.shape == del_ref.shape == (B, N - num_drop, 3)
        # the perturbed block rides idx_pert whose saliency values are
        # well-separated — positional match (sign(grad) may flip on
        # near-zero gradient coords, hence fraction-level)
        assert _coord_match(adv[:, :num_drop], adv_ref[:, :num_drop],
                            1e-5) > 0.97, (
            _coord_match(adv[:, :num_drop], adv_ref[:, :num_drop], 1e-5))
        # the kept block's topk ORDER is tie-fragile (near-equal f32
        # saliencies sort differently across frameworks) — compare SETS,
        # like the SaliencyDrop survivor-set check above
        for b in range(B):
            want = {tuple(np.round(p, 5)) for p in del_ref[b]}
            got = {tuple(np.round(p, 5)) for p in del_pc[b]}
            assert got == want, f"batch {b}: {len(got & want)} common"
