"""Train every victim family on synthetic data and measure HiT-ADV ASR.

Produces the cross-victim ASR/imperceptibility table (the reference's
paper-table analogue) end-to-end on one chip with no external data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu import models
    from hitadv_tpu.attacks import base, hit_adv
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.evaluation import eval_asr
    from hitadv_tpu.train import train_victim

    N, CLASSES = 256, 10
    train_pts, train_labels = synthetic_clouds(1024, N, CLASSES, seed=7)
    test_pts, test_labels = synthetic_clouds(128, N, CLASSES, seed=99)
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    cfg = hit_adv.HiTADVConfig(binary_step=5, num_iter=50,
                               central_num=48, total_central_num=64,
                               curv_loss_knn=8)

    print(f"{'victim':12s} {'clean':>6s} {'ASR':>6s} {'knn':>8s} "
          f"{'curvstd':>8s} {'t_train':>8s} {'t_eval':>7s}", flush=True)
    for name in ["pointnet", "pointnet++", "pct", "pointconv", "dgcnn"]:
        init, apply = models.get_model(name)
        t0 = time.time()
        params = train_victim(init, apply, train_pts[..., :3],
                              train_labels, jax.random.PRNGKey(0),
                              epochs=15, batch_size=32, lr=1e-3)
        t_train = time.time() - t0
        logits_fn = lambda x: apply(params, x)  # noqa: E731
        acc = float(np.mean(np.argmax(np.asarray(logits_fn(
            jnp.asarray(test_pts[..., :3]))), -1) == test_labels))

        attack = hit_adv.make_hit_adv(logits_fn, adv_fn, cfg)
        t0 = time.time()
        m = eval_asr(logits_fn, attack,
                     [(test_pts[i * 32:(i + 1) * 32],
                       test_labels[i * 32:(i + 1) * 32])
                      for i in range(4)],
                     key=jax.random.PRNGKey(1), uniform_k=2,
                     verbose=False)
        t_eval = time.time() - t0
        print(f"{name:12s} {acc:6.3f} {m['asr']:6.3f} "
              f"{m['knn_dist']:8.5f} {m['curv_std_dist']:8.4f} "
              f"{t_train:7.0f}s {t_eval:6.0f}s", flush=True)


if __name__ == "__main__":
    main()
