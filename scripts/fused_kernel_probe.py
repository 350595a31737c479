"""Micro-bench: fused gaussian_blend / kde_density vs their XLA paths.

Times fwd+bwd through each op with an in-jit lax.scan loop (the tunnel
costs ~30 ms per host round trip, so never time per-call). Run on the
real chip:  python scripts/fused_kernel_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _time_scan(jax, jnp, step, init, iters=50):
    from jax import lax

    @jax.jit
    def run(x):
        out, _ = lax.scan(lambda c, _: (step(c), None), x, None,
                          length=iters)
        return out

    np.asarray(jax.tree.leaves(run(init))[0])        # compile
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(run(init))[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu.ops import geometry as G

    rng = np.random.RandomState(0)

    # --- gaussian_blend at the flagship shape -------------------------
    B, Cn, N = 64, 192, 1024
    ori = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    central = ori[:, :Cn]
    delta = jnp.asarray(0.1 + rng.rand(B, Cn).astype(np.float32))
    pert = jnp.asarray(rng.randn(B, Cn, 3).astype(np.float32) * 0.1)

    for backend in ("xla", "pallas"):
        G.set_backend(backend)

        def gb_step(carry):
            p, d = carry

            def loss(p, d):
                num, deno = G.gaussian_blend(central, ori, d, p)
                return jnp.sum((ori + num / deno[..., None]) ** 2)

            gp, gd = jax.grad(loss, argnums=(0, 1))(p, d)
            return (p - 1e-3 * gp, d - 1e-3 * gd)

        ms = _time_scan(jax, jnp, gb_step, (pert, delta))
        print(f"gaussian_blend fwd+bwd  B{B} Cn{Cn} N{N}  "
              f"{backend:6s} {ms:7.3f} ms/iter", flush=True)

    # --- kde_density at PointConv stage-1 shape ------------------------
    B2, N2 = 16, 1024
    xyz = jnp.asarray(rng.randn(B2, N2, 3).astype(np.float32))
    for backend in ("xla", "pallas"):
        G.set_backend(backend)

        def kde_step(x):
            def loss(x):
                return jnp.sum(G.kde_density(x, 0.1) ** 2)

            return x - 1e-3 * jax.grad(loss)(x)

        ms = _time_scan(jax, jnp, kde_step, xyz)
        print(f"kde_density    fwd+bwd  B{B2} N{N2}       "
              f"{backend:6s} {ms:7.3f} ms/iter", flush=True)
    G.set_backend("auto")


if __name__ == "__main__":
    main()
