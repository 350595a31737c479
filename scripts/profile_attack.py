"""Capture an XLA profiler trace of a full attack (view in XProf).

Demonstrates the tracing subsystem (utils/profiling.py) that replaces
the reference's manual wall-clock phase counters: the attack phases show
up as named regions on the device timeline.

Usage: python scripts/profile_attack.py [--out /tmp/hitadv_trace]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu.attacks import base, hit_adv
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.models import pointnet
    from hitadv_tpu.utils import PhaseTimer, annotate, trace

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/hitadv_trace")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num_point", type=int, default=1024)
    args = p.parse_args()

    params = pointnet.init(jax.random.PRNGKey(0))
    attack = hit_adv.make_hit_adv(
        lambda x: pointnet.apply(params, x),
        base.make_adv_fn("logits", 30.0, False),
        hit_adv.HiTADVConfig(binary_step=2, num_iter=25))
    pts, labels = synthetic_clouds(args.batch, args.num_point, seed=0)
    pts, labels = jnp.asarray(pts), jnp.asarray(labels)

    timer = PhaseTimer()
    with timer.phase("compile"):
        res = attack(pts, labels, jax.random.PRNGKey(0))
        np.asarray(res.adv_points)

    with trace(args.out):
        with annotate("hit_adv_attack"):
            res = attack(pts, labels, jax.random.PRNGKey(1))
            np.asarray(res.adv_points)

    print(timer.summary())
    print(f"trace written to {args.out} "
          f"(open with: tensorboard --logdir {args.out} or xprof)")


if __name__ == "__main__":
    main()
