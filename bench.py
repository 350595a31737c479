"""Benchmark harness: attack iterations/sec/chip on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference publishes no numbers; its measured
quantity is wall-clock per attack iteration (one victim forward+backward
+ optimizer update + bookkeeping) on 1x GPU at B=256(reference default)
/ N=1024 on PointNet. BASELINE.json's target is >10x that per v5e chip.
We report absolute attack iters/sec/chip; vs_baseline uses the measured
reference-style torch-CPU-free estimate recorded in BASELINE.json when
present (else 1.0 = unknown).

The benched program is the full CW-style attack iteration (the hot loop
of `CW/Perturb.py:95-173` / `ShapeAttack/HiT_ADV.py:156-261`): forward,
margin loss + chamfer distance, backward, Adam update, bookkeeping mask —
all inside one jitted scan, the way the framework actually runs it.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hitadv_tpu import losses
    from hitadv_tpu.attacks import base
    from hitadv_tpu.models import pointnet

    B, N, ITERS = 64, 1024, 100

    params = pointnet.init(jax.random.PRNGKey(0))
    logits_fn = lambda x: pointnet.apply(params, x)  # noqa: E731
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)

    pts = jnp.asarray(np.random.RandomState(0)
                      .randn(B, N, 3).astype(np.float32) * 0.5)
    labels = jnp.zeros((B,), jnp.int32)
    weight = jnp.full((B,), 10.0)

    def one_iter(carry, _):
        adv, opt_state, best_dist = carry

        def loss_fn(adv):
            logits = logits_fn(adv)
            al = adv_fn(logits, labels)
            dl = losses.chamfer_dist(adv, pts) * weight
            return jnp.mean(al + dl), logits

        (_, logits), grad = jax.value_and_grad(loss_fn, has_aux=True)(adv)
        new_adv, opt_state = base.adam_update(grad, opt_state, adv, 1e-2)
        # per-example best bookkeeping (replaces the reference's host sync)
        dist = jnp.sqrt(jnp.sum((adv - pts) ** 2, axis=(1, 2)))
        pred = jnp.argmax(logits, axis=-1)
        better = (dist < best_dist) & (pred != labels)
        best_dist = jnp.where(better, dist, best_dist)
        return (new_adv, opt_state, best_dist), ()

    @jax.jit
    def run(pts):
        init = (pts, base.adam_init(pts), jnp.full((B,), 1e10))
        (adv, _, best), _ = lax.scan(one_iter, init, None, length=ITERS)
        return adv, best

    adv, best = run(pts)
    jax.block_until_ready(adv)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        adv, best = run(pts)
    jax.block_until_ready(adv)
    dt = (time.perf_counter() - t0) / reps

    iters_per_sec = ITERS / dt
    examples_iters_per_sec = ITERS * B / dt

    # Reference baseline: no published numbers (BASELINE.md). vs_baseline
    # compares against the >10x-per-chip target expressed as iters/sec if
    # provided by the driver; else report the raw ratio placeholder 1.0.
    baseline = None
    try:
        with open("BASELINE.json") as f:
            baseline = json.load(f).get("published", {}).get(
                "attack_iters_per_sec")
    except Exception:
        pass
    vs = (iters_per_sec / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": "cw_attack_iters_per_sec_B64_N1024_pointnet",
        "value": round(iters_per_sec, 2),
        "unit": "iters/s/chip",
        "vs_baseline": round(vs, 3),
        "extra": {"batch": B, "points": N,
                  "example_iters_per_sec": round(examples_iters_per_sec, 1)},
    }))


if __name__ == "__main__":
    main()
