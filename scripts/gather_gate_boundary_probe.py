"""Spot-check the _gather_rows_mxu gate at its admitted boundary
(ADVICE r4): M=512 rows from N=4096 points, C=3 f32 — where the
one-hot kernel's N-proportional per-row cost approaches XLA's ~9 ns/row
constant and the r4-widened gate (M>=512 when N<=4096) might admit a
near-neutral or losing shape.

Times both paths with an in-jit lax.scan (carry-consuming, so XLA
cannot hoist the body) and syncs by fetching the scalar result —
block_until_ready through the relay is not trusted (bench.py canary
saga, .r5/probe_canary_sync.log).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def bench_one(jax, jnp, fn, pts, idx, iters=200):
    from jax import lax

    @jax.jit
    def run(pts, idx):
        def body(acc, _):
            out = fn(pts + acc * 1e-20, idx)       # consume the carry
            return jnp.sum(out.astype(jnp.float32)), ()
        acc, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    float(run(pts, idx))                            # compile + warm
    t0 = time.perf_counter()
    s = float(run(pts, idx))                        # scalar fetch sync
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt / iters * 1e6                         # us per call


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu.ops import pallas_kernels as PK

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    shapes = [
        (64, 512, 4096),    # the admitted boundary shape (ADVICE r4)
        (64, 512, 1024),    # mid-gate
        (64, 1024, 1024),   # the shape the gate was derived from
        (64, 512, 8192),    # just OUTSIDE the gate (N gate rejects)
    ]
    for B, M, N in shapes:
        pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M)).astype(np.int32))

        t_kernel = bench_one(
            jax, jnp, lambda p, i: PK.gather_rows_pallas(p, i), pts, idx)
        t_xla = bench_one(
            jax, jnp,
            lambda p, i: jnp.take_along_axis(p, i[..., None], axis=1),
            pts, idx)
        verdict = "kernel" if t_kernel < t_xla else "XLA"
        print(f"[B={B} M={M} N={N}] one-hot kernel {t_kernel:8.1f} us"
              f" | XLA gather {t_xla:8.1f} us  -> {verdict} wins",
              flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
