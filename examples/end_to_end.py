"""End-to-end library-API walkthrough (no CLI, no downloads).

Train a small PointNet victim on synthetic clouds, craft HiT-ADV
adversarial examples against it, evaluate ASR + imperceptibility, and
dump one adversarial cloud — everything through the public Python API.
Runs anywhere (~2 min on the CPU mesh; the TPU path is identical).

    python examples/end_to_end.py
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hitadv_tpu.attacks import base
from hitadv_tpu.attacks.hit_adv import HiTADVConfig, make_hit_adv
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.evaluation import eval_asr
from hitadv_tpu.models import pointnet
from hitadv_tpu.train import train_victim


def main():
    # --- data: deterministic labeled clouds (xyz + unit normals) ----
    train_pts, train_labels = synthetic_clouds(256, num_points=256,
                                               seed=0, num_classes=10)
    test_pts, test_labels = synthetic_clouds(64, num_points=256,
                                             seed=1, num_classes=10)

    # --- victim: train a PointNet on-device ------------------------
    init = lambda k: pointnet.init(k, num_classes=10)      # noqa: E731
    params = train_victim(init, pointnet.apply,
                          train_pts[..., :3], train_labels,
                          jax.random.PRNGKey(0), epochs=10,
                          batch_size=32)
    logits_fn = lambda x: pointnet.apply(params, x)        # noqa: E731
    clean_acc = float(jnp.mean(
        jnp.argmax(logits_fn(jnp.asarray(test_pts[..., :3])), -1)
        == jnp.asarray(test_labels)))
    print(f"clean accuracy: {clean_acc:.3f}")

    # --- attack: HiT-ADV, the paper's headline engine ---------------
    # every attack factory takes (logits_fn, adv_fn, config) and
    # returns attack(points, labels, key) -> AttackResult as ONE
    # jittable program; normals ride along as channels 3:6
    attack = make_hit_adv(
        logits_fn,
        base.make_adv_fn("logits", kappa=15.0, targeted=False),
        HiTADVConfig(binary_step=2, num_iter=50,
                     central_num=24, total_central_num=32,
                     budget=0.55, curv_loss_knn=8))

    # --- evaluate: ASR + imperceptibility metrics -------------------
    batches = [(test_pts[i:i + 32], test_labels[i:i + 32])
               for i in range(0, 64, 32)]
    metrics = eval_asr(logits_fn, jax.jit(attack), batches,
                       key=jax.random.PRNGKey(7), uniform_k=5,
                       log_dir=None, verbose=False)
    print({k: round(float(v), 4) for k, v in metrics.items()})

    # --- inspect one adversarial cloud ------------------------------
    res = jax.jit(attack)(jnp.asarray(test_pts[:4]),
                          jnp.asarray(test_labels[:4]),
                          jax.random.PRNGKey(3))
    adv = np.asarray(res.adv_points[0])
    np.savetxt("adv_example.asc", adv, fmt="%.6f")
    moved = float(np.abs(adv - test_pts[0, :, :3]).max())
    print(f"wrote adv_example.asc (max|delta| = {moved:.4f})")
    return metrics


if __name__ == "__main__":
    main()
