"""CW-Perturb gather-gate A/B: one-hot kernel vs XLA serial gather.

The r4 gate widening (geometry._gather_rows_mxu admitting M >= 512 at
N <= 4096) was justified by a PRE-STN-fusion profile where the XLA
chamfer-bwd gather cost 580 us/iter standing alone. After the r5
linear_bn_pre fusion reshuffled the program, bench runs suggest the
XLA gather re-fused and the one-hot route now LOSES in CW. This probe
times the exact benched CW program (bench._make_cw_run, 300 iters,
median of 5) under the HITADV_GATHER_WIDE env setting it was launched
with, printing one line; run it twice (wide=1 / wide=0) to compare.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench

    run, pts = bench._make_cw_run(jax, jnp, 64, 1024, 300)
    jax.block_until_ready(run(pts))
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pts))
        dts.append(time.perf_counter() - t0)
    med = sorted(dts)[2]
    print(f"HITADV_GATHER_WIDE={os.environ.get('HITADV_GATHER_WIDE', '1')}"
          f" cw_iters_per_sec={300 / med:.1f}"
          f" reps={[round(d, 3) for d in dts]}", flush=True)


if __name__ == "__main__":
    main()
