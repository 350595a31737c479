"""Unsaturated ASR regression band (VERDICT.md Weak #3).

Round 1's cross-victim ASR table saturated at 1.000 everywhere — a
metric that cannot detect parity regressions. This test pins a
deliberately HARD configuration where HiT-ADV lands mid-band: a
10-class synthetic victim trained on-device (train-mode BN) to ~0.75
clean accuracy, attacked at budget 0.2 with a truncated 3x20 schedule.

Measured in the suite environment (8-virtual-device CPU mesh — the
device count changes XLA CPU scheduling enough that 12 epochs of
training drift to a slightly different victim than a 1-device run):
ASR = 0.4815 (26/54 clean-correct flipped). Everything is seeded and
the whole attack is one XLA program, so the value is deterministic in
this environment; the band below allows ±0.075 (≈ ±4 examples) for
cross-version float drift. A regression in the margin-loss masks,
best-state bookkeeping, binary-search coupling, or the deformation
math moves ASR far outside the band (e.g. round 2's two HiT-ADV
loss-shape fixes each moved it by >0.1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import models
from hitadv_tpu.attacks import base, hit_adv
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.train import train_victim

EXPECTED_ASR = 0.4815
BAND = 0.075


@pytest.fixture(scope="module")
def trained_victim():
    init, apply = models.get_model("pointnet")
    pts, labels = synthetic_clouds(128, 64, num_classes=10, seed=1)
    params = train_victim(init, apply, pts[..., :3], labels,
                          jax.random.PRNGKey(0), epochs=12,
                          batch_size=16)
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
