"""Per-victim HiT-ADV attack throughput on the real chip.

Measures attack iterations/sec for each victim family (reduced loop
2x25 to bound compile time; per-iteration cost is loop-invariant).
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
    from hitadv_tpu.nn import functional as nnF

    nnF.set_compute_dtype(jnp.bfloat16)
    B, N = 16, 1024
    cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=25)
    iters = cfg.binary_step * cfg.num_iter
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    pts, labels = synthetic_clouds(B, num_points=N, seed=0)
    pts_j, labels_j = jnp.asarray(pts), jnp.asarray(labels)

    victims = sys.argv[1:] or ["pointnet", "pointnet++", "pct",
                               "pointconv", "dgcnn"]
    for name in victims:
        init, apply = models.get_model(name)
        params = init(jax.random.PRNGKey(0))
        logits_fn = lambda x: apply(params, x)  # noqa: E731
        attack = hit_adv.make_hit_adv(logits_fn, adv_fn, cfg)
        jax.block_until_ready(
            attack(pts_j, labels_j, jax.random.PRNGKey(0)))  # compile
        dts = []
        for r in range(3):   # median of 3, no data pull (bench.py r5)
            t0 = time.perf_counter()
            jax.block_until_ready(
                attack(pts_j, labels_j, jax.random.PRNGKey(1 + r)))
            dts.append(time.perf_counter() - t0)
        dt = sorted(dts)[1]
        print(f"{name:12s} {iters/dt:7.1f} attack iters/s "
              f"({dt*1e3/iters:6.2f} ms/iter at B={B}; reps "
              f"{[round(d, 3) for d in dts]})", flush=True)


if __name__ == "__main__":
    main()
