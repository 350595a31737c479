"""gaussian_blend kernel tuning probe — component costs on real TPU.

Times the raw Pallas fwd / bwd kernels at several tile sizes against
the XLA path (fwd-only and the attack-realistic pert/delta-only grad).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _time(jax, fn, args, iters=50):
    from jax import lax

    @jax.jit
    def run(args):
        def step(c, _):
            # CRITICAL: perturb the float inputs by the carry — with
            # loop-invariant args XLA hoists the whole body out of the
            # scan and every measurement collapses to the ~30 ms host
            # round-trip divided by `iters` (the trap that produced a
            # uniform "0.6 ms" for every variant of this probe once).
            acc = c[0]
            args_i = [a + acc.astype(a.dtype)
                      if jnp.issubdtype(a.dtype, jnp.floating) else a
                      for a in c[1:]]
            outs = fn(*args_i)
            leaf = jax.tree.leaves(outs)[0]
            bump = jnp.sum(leaf.astype(jnp.float32)) * 1e-20
            return (acc * 0.5 + bump * 1e-10, *c[1:]), None

        (acc, *_), _ = lax.scan(step, (jnp.float32(0), *args), None,
                                length=iters)
        return acc

    global jnp
    import jax.numpy as jnp

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
    B, Cn, N = 64, 192, 1024
    ori = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    central = ori[:, :Cn]
    delta = jnp.asarray(0.1 + rng.rand(B, Cn).astype(np.float32))
    pert = jnp.asarray(rng.randn(B, Cn, 3).astype(np.float32) * 0.1)
    gnum = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    gdeno = jnp.asarray(rng.randn(B, N).astype(np.float32))

    for tn in (256, 512, 1024):
        ms = _time(jax, lambda c, o, d, p: PK.gaussian_blend_pallas(
            c, o, d, p, tile_n=tn), (central, ori, delta, pert))
        print(f"pallas fwd  tile_n={tn:5d}  {ms:7.3f} ms", flush=True)
    for tn in (256, 512, 1024):
        ms = _time(jax, lambda c, o, d, p, gn, gd:
                   PK.gaussian_blend_bwd_pallas(c, o, d, p, gn, gd,
                                                tile_n=tn),
                   (central, ori, delta, pert, gnum, gdeno))
        print(f"pallas bwd  tile_n={tn:5d}  {ms:7.3f} ms", flush=True)

    ms = _time(jax, G._gaussian_blend_xla, (central, ori, delta, pert))
    print(f"xla    fwd               {ms:7.3f} ms", flush=True)

    def xla_pd_grad(c, o, d, p):
        def loss(d, p):
            num, deno = G._gaussian_blend_xla(c, o, d, p)
            return jnp.sum((o + num / deno[..., None]) ** 2)

        return jax.grad(loss, argnums=(0, 1))(d, p)

    ms = _time(jax, xla_pd_grad, (central, ori, delta, pert))
    print(f"xla    fwd+bwd(pert,delta) {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
