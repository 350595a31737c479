"""Per-op device-time breakdown of the CW-Perturb hot loop.

bench.py's secondary metric (`cw_perturb_iters_per_sec`, the
`CW/Perturb.py:95-173` analogue: PointNet fwd+bwd + adv2ori chamfer +
Adam + best-dist bookkeeping, one scanned XLA program) has been nearly
flat across rounds (275 → 356 → 357 → 375 it/s) without ever getting
the flagship's source-line attribution. This traces the EXACT benched
program (`bench._make_cw_run`) and prints the per-iteration table.

Usage: python scripts/profile_cw.py   (env: PROF_B, PROF_N, PROF_ITERS)
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from profile_victims import _top_ops
    from hitadv_tpu.nn import functional as nnF

    # bench.py runs the CW loop after the bf16 flagship benches, so the
    # module-global compute dtype is bf16 there — mirror that state.
    nnF.set_compute_dtype(jnp.bfloat16)

    B = int(os.environ.get("PROF_B", "64"))
    N = int(os.environ.get("PROF_N", "1024"))
    iters = int(os.environ.get("PROF_ITERS", "25"))
    run, pts = bench._make_cw_run(jax, jnp, B, N, iters)

    np.asarray(run(pts))                                   # compile
    out = "/tmp/prof_cw"
    with jax.profiler.trace(out):
        np.asarray(run(pts))
    print(f"== cw_perturb ({iters}-iter, B={B}, N={N}, bf16 victim) ==",
          flush=True)
    _top_ops(out, n_iters=iters)


if __name__ == "__main__":
    main()
