"""Probe the fused f32 max_linear path on the real chip.

Checks the Mosaic compile of the f32 kernel variant (interpret mode
validates none of the lowering rules), compares values/grads against
the unfused XLA f32 path (both round matmul operands to bf16 at
DEFAULT precision, so agreement should be at bf16-product grade), and
times fwd+bwd at the flagship conv3 shape with an in-jit scan.

Run on the real chip:  python -u scripts/maxlin_f32_probe.py
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
        # reduce to a SCALAR inside the jit: pulling the [64,1024,128]
        # carry through the relay tunnel costs up to ~1 s on a congested
        # relay (~20 ms/iter at iters=50), swamping the ~1 ms kernels
        # under comparison (CLAUDE.md timing rules)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))

    float(run(init))                                 # compile
    t0 = time.perf_counter()
    float(run(init))
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu.nn import functional as F
    from hitadv_tpu.ops import geometry as G

    key = jax.random.PRNGKey(0)
    B, N, K, C = 64, 1024, 128, 1024          # flagship conv3 shape
    lin = F.conv1x1_init(key, K, C, bias=True)
    bn = F.batchnorm_init(C)
    bn = {**bn,
          "mean": jax.random.normal(key, (C,)) * 0.1,
          "var": jnp.abs(jax.random.normal(key, (C,))) + 0.5}
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, K), jnp.float32)

    def fwd(x, backend):
        G.set_backend(backend)
        try:
            return F.linear_bn_max(lin, bn, x)
        finally:
            G.set_backend("auto")

    f = np.asarray(jax.jit(lambda x: fwd(x, "pallas"))(x))
    u = np.asarray(jax.jit(lambda x: fwd(x, "xla"))(x))
    print("fwd max abs diff:", np.max(np.abs(f - u)),
          " scale:", np.max(np.abs(u)))

    def loss(x, backend):
        return jnp.sum(jnp.sin(fwd(x, backend)))

    gf = np.asarray(jax.jit(jax.grad(lambda x: loss(x, "pallas")))(x))
    gu = np.asarray(jax.jit(jax.grad(lambda x: loss(x, "xla")))(x))
    print("bwd max abs diff:", np.max(np.abs(gf - gu)),
          " scale:", np.max(np.abs(gu)))

    for backend in ("xla", "pallas"):
        def step(c, backend=backend):
            g = jax.grad(lambda x: jnp.sum(
                jnp.tanh(fwd(x, backend))))(c)
            return c - 1e-3 * g

        ms = _time_scan(jax, jnp, step, x)
        print(f"{backend}: {ms:.3f} ms/iter fwd+bwd (f32, B={B}, "
              f"N={N}, {K}->{C})")


if __name__ == "__main__":
    main()
