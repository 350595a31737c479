"""graph_max_pool strategy probe — one-hot-matmul fwd vs XLA gather fwd.

The one-hot Pallas forward costs k*N^2*C MXU flops + k*N^2 VPU one-hot
construction; an XLA gather+max+argmax forward is memory-bound on the
[B, N, k, C] neighbor tensor instead. Both pair with the Pallas
one-hot^T scatter backward. Times fwd-only and fwd+bwd at the DGCNN
layer shapes on the real chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _time(jax, jnp, fn, args, iters=50):
    from jax import lax

    @jax.jit
    def run(args):
        def step(c, _):
            # perturb float inputs by the carry: loop-invariant args
            # let XLA hoist the body out of the scan, collapsing every
            # measurement to the ~30 ms host round-trip / iters
            acc = c[0]
            args_i = [a + acc.astype(a.dtype)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a
                      for a in c[1:]]
            out = fn(*args_i)
            return (acc * 0.5 + jnp.sum(out.astype(jnp.float32))
                    * 1e-30, *c[1:]), None

        (acc, *_), _ = lax.scan(step, (jnp.float32(0), *args), None,
                                length=iters)
        return acc

    np.asarray(run(args))
    t0 = time.perf_counter()
    np.asarray(run(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu.ops import geometry as G
    from hitadv_tpu.ops import pallas_kernels as PK

    rng = np.random.RandomState(0)
    B, N, k = 16, 1024, 20
    idx = jnp.asarray(rng.randint(0, N, size=(B, N, k)).astype(np.int32))

    for C in (64, 256):
        y32 = rng.randn(B, N, C).astype(np.float32)
        for dt in (jnp.bfloat16, jnp.float32):
            y = jnp.asarray(y32).astype(dt)

            def fwd_onehot(y):
                mx, _ = PK.graph_max_pool_pallas(y, idx)
                return mx

            def fwd_gather(y):
                nb = jnp.take_along_axis(
                    y[:, :, None, :],
                    jnp.broadcast_to(idx[..., None], (B, N, k, 1)),
                    axis=1)
                return jnp.max(nb, axis=2)

            def fwd_gather_amax(y):
                nb = jnp.take_along_axis(
                    y[:, :, None, :],
                    jnp.broadcast_to(idx[..., None], (B, N, k, 1)),
                    axis=1)
                return (jnp.max(nb, axis=2)
                        + jnp.argmax(nb, axis=2).astype(y.dtype) * 0)

            def fwdbwd(y):
                g = jax.grad(lambda y: jnp.sum(
                    G.graph_max_pool(y, idx).astype(jnp.float32)))(y)
                return g

            name = "bf16" if dt == jnp.bfloat16 else "f32 "
            ms1 = _time(jax, jnp, fwd_onehot, (y,))
            ms2 = _time(jax, jnp, fwd_gather, (y,))
            ms3 = _time(jax, jnp, fwd_gather_amax, (y,))
            ms4 = _time(jax, jnp, fwdbwd, (y,))
            print(f"C={C:3d} {name}  onehot {ms1:6.3f}  gather "
                  f"{ms2:6.3f}  gather+amax {ms3:6.3f}  "
                  f"full fwd+bwd(onehot) {ms4:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
