"""Unsaturated ASR regression band (VERDICT.md r1 Weak #3, r2 Weak #3).

Round 1's cross-victim ASR table saturated at 1.000 everywhere — a
metric that cannot detect parity regressions. This test pins a
deliberately HARD configuration where HiT-ADV lands mid-band: a
10-class synthetic victim at ~0.72 clean accuracy, attacked at
budget 0.2 with a truncated 3x20 schedule.

The victim params are COMMITTED (`tests/data/asr_victim_params.pkl`,
trained once via `train_victim(epochs=12, batch_size=16)` on the
suite mesh and frozen) so the band tests attack semantics only — not
attack + training + XLA CPU scheduler, which r2's VERDICT flagged as
environment-coupled (device count changed the trained victim enough
to drift ASR). With the pinned victim the attack is one seeded XLA
program; measured ASR = 0.52174 (24/46) IDENTICAL on a 1-device and
an 8-device CPU mesh. The band allows ±2 examples of cross-version
float drift (vs ±4 before). `train_victim` itself keeps a separate
band-free smoke in tests/test_train_bn.py / test_data_and_drivers.py. A regression in the margin-loss masks, best-state
bookkeeping, binary-search coupling, or the deformation math moves
ASR far outside the band (e.g. round 2's two HiT-ADV loss-shape
fixes each moved it by >0.1).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import models
from hitadv_tpu.attacks import base, hit_adv
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.utils import checkpoint as ckpt

PARAMS_PKL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "asr_victim_params.pkl")
EXPECTED_ASR = 0.5217   # 24/46 clean-correct flipped
BAND = 0.045            # ±2 examples


@pytest.fixture(scope="module")
def trained_victim():
    _, apply = models.get_model("pointnet")
    params = ckpt.load_params(PARAMS_PKL)
    return lambda x: apply(params, x)


class TestUnsaturatedASR:
    def test_hit_adv_midband(self, trained_victim):
        logits_fn = trained_victim
        te_pts, te_labels = synthetic_clouds(64, 64, num_classes=10,
                                             seed=99)
        clean_pred = np.asarray(jnp.argmax(
            logits_fn(jnp.asarray(te_pts[..., :3])), -1))
        mask = clean_pred == te_labels
        acc = mask.mean()
        # the victim must be competent enough that ASR means something
        assert 0.6 <= acc <= 0.95, acc

        cfg = hit_adv.HiTADVConfig(binary_step=3, num_iter=20,
                                   central_num=16, total_central_num=24,
                                   curv_loss_knn=8, budget=0.2)
        attack = hit_adv.make_hit_adv(
            logits_fn,
            base.make_adv_fn("logits", kappa=30.0, targeted=False), cfg)
        res = attack(jnp.asarray(te_pts), jnp.asarray(te_labels),
                     jax.random.PRNGKey(5))
        pred = np.asarray(res.pred)
        asr = float(((pred != te_labels) & mask).sum() / mask.sum())

        # unsaturated: the whole point of this configuration
        assert 0.2 < asr < 0.9, asr
        # pinned regression band
        assert abs(asr - EXPECTED_ASR) <= BAND, (
            f"ASR {asr} left the pinned band "
            f"{EXPECTED_ASR}±{BAND} — attack semantics changed")


class TestTrajectoryFingerprint:
    def test_hit_adv_deterministic_fingerprint(self, trained_victim):
        """Deterministic trajectory-checksum companion to the ASR band
        (VERDICT r4 Weak #4 / Next #6): one seeded HiT-ADV program on
        the pinned committed victim, fingerprinted by final perturbation
        statistics and exact best-adv predictions. The ASR band needs a
        ~10% semantic drift to trip; this trips on ANY change to the
        attack's math (loss shapes, Adam coupling, binary-search
        bookkeeping, deformation algebra) beyond reassociation-level
        float noise. Intentional numerics changes (e.g. an
        algebra-equivalent fusion) must re-pin these values CONSCIOUSLY
        — that friction is the point. Pinned on the suite's 8-device
        CPU mesh (single-device jit program; value measured identical
        on 1 and 8 devices, same as the ASR band)."""
        cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=10,
                                   central_num=16, total_central_num=24,
                                   curv_loss_knn=8, budget=0.2)
        attack = hit_adv.make_hit_adv(
            trained_victim,
            base.make_adv_fn("logits", kappa=30.0, targeted=False), cfg)
        pts, labels = synthetic_clouds(8, 64, num_classes=10, seed=123)
        res = attack(jnp.asarray(pts), jnp.asarray(labels),
                     jax.random.PRNGKey(9))
        adv = np.asarray(res.adv_points)
        x = pts[..., :3]
        mean_l2 = float(np.sqrt(((adv - x) ** 2).sum(-1)).mean())
        max_dev = float(np.abs(adv - x).max())
        pred = np.asarray(res.pred).tolist()

        np.testing.assert_allclose(mean_l2, 0.21892890, rtol=2e-3)
        np.testing.assert_allclose(max_dev, 0.19994435, rtol=2e-3)
        assert pred == [1, 1, 5, 9, 7, 6, 5, 9], pred
