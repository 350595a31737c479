"""TPU smoke sweep: every registry attack once, small config, real chip.

Usage: python scripts/tpu_smoke.py [--num_point 256] [--batch 8]
Prints one PASS/FAIL line per attack; exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import argparse
import sys
import time
import traceback

import numpy as np

ATTACKS = [
    "FGSM", "IFGSM", "MIFGSM", "PGD", "FGSM-RS", "FGM-L2", "IFGM-L2",
    "CW-Perturb", "CW-UPerturb", "CW-KNN", "CW-UKNN",
    "HiT-ADV", "GeoA3", "GeoA3-Untarget",
    "AOF", "TAOF", "UAEAOF", "AdvPC", "UAdvPC",
    "Add", "Add-Cluster", "Add-Object", "Drop",
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--num_point", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_iter", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hitadv_tpu.config import EvalConfig
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.eval import build_attack, build_model

    print(f"backend: {jax.default_backend()}", flush=True)
    cfg0 = EvalConfig(num_point=args.num_point,
                      batch_size=args.batch, num_iter=args.num_iter,
                      binary_step=2, central_num=16,
                      total_central_num=32, curv_loss_knn=8)
    _, logits_fn = build_model(cfg0)
    pts, labels = synthetic_clouds(args.batch, args.num_point, seed=3)
    pts_j = jnp.asarray(pts)
    labels_j = jnp.asarray(labels)

    failures = []
    for name in ATTACKS:
        cfg = EvalConfig(**{**cfg0.__dict__, "attack_type": name})
        t0 = time.time()
        try:
            attack = build_attack(cfg, logits_fn)
            res = attack(pts_j, labels_j, jax.random.PRNGKey(0))
            adv = np.asarray(res.adv_points)
            ok = np.isfinite(adv).all()
            status = "PASS" if ok else "FAIL(non-finite)"
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            status = f"FAIL({type(e).__name__})"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:14s} {status:18s} {time.time()-t0:6.1f}s "
              f"success={int(res.success_num) if status == 'PASS' else '-'}",
              flush=True)

    print(f"\n{len(ATTACKS) - len(failures)}/{len(ATTACKS)} attacks OK",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
