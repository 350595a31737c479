"""Probe the schedule-pinned blend-from-hoisted-field Pallas pair.

Phase 1: standalone kernel fwd / attack-realistic (pert, delta) grad
vs the stock XLA hoisted-field path, at B=64 and B=256 flagship
shapes, with on-device correctness asserts (a NEW Mosaic kernel must
be probed standalone before any full-attack compile — remote compiles
of programs containing new kernels can take 10+ minutes).

Phase 2: full flagship attack A/B via bench._bench_hit_adv with
G.set_blend_impl("xla") vs ("pallas"), at B=256 / 128 / 64 — the
target is the B=256 program-level blend fusion regression (RESULTS.md
"Batch scaling": 284 vs 84 us per 64 examples in-program).
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
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def step(c, _):
            # carry must bump the float inputs or XLA hoists the body
            # (see gblend_tuning.py — the 30 ms/iters trap)
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

    # scalar fetch both times — unfakeable sync through the relay
    float(np.asarray(run(args)))
    t0 = time.perf_counter()
    float(np.asarray(run(args)))
    return (time.perf_counter() - t0) / iters * 1e3


def standalone(jax, jnp, G, PK, B):
    rng = np.random.RandomState(0)
    Cn, N = 192, 1024
    ori = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    central = ori[:, :Cn]
    delta = jnp.asarray(0.1 + rng.rand(B, Cn).astype(np.float32))
    pert = jnp.asarray(rng.randn(B, Cn, 3).astype(np.float32) * 0.1)
    negd = jax.jit(G.neg_gaussian_field)(central, ori)
    negdt = jnp.swapaxes(negd, 1, 2)

    # correctness on hardware first
    want = jax.jit(G._blend_from_negd)(negd, delta, pert)
    got = jax.jit(PK.gaussian_blend_negdt_pallas)(negdt, delta, pert)
    for w, g, name in zip(want, got, ("num", "deno")):
        err = float(jnp.max(jnp.abs(w - g)))
        print(f"B={B} fwd {name} max|err| = {err:.3e}", flush=True)
        assert err < 1e-5, (name, err)

    def kern_grad(negdt, delta, pert):
        def loss(d, p):
            num, deno = G.gaussian_blend_negdt(negdt, d, p)
            return jnp.sum((num / deno[..., None]) ** 2)

        return jax.grad(loss, argnums=(0, 1))(delta, pert)

    def xla_grad(negd, delta, pert):
        def loss(d, p):
            num, deno = G._blend_from_negd(negd, d, p)
            return jnp.sum((num / deno[..., None]) ** 2)

        return jax.grad(loss, argnums=(0, 1))(delta, pert)

    gw = jax.jit(xla_grad)(negd, delta, pert)
    gg = jax.jit(kern_grad)(negdt, delta, pert)
    for w, g, name in zip(gw, gg, ("delta", "pert")):
        err = float(jnp.max(jnp.abs(w - g)))
        ref = float(jnp.max(jnp.abs(w))) + 1e-30
        print(f"B={B} grad {name} max|err| = {err:.3e} "
              f"(rel {err / ref:.3e})", flush=True)
        assert err / ref < 1e-4, (name, err)

    ms = _time(jax, PK.gaussian_blend_negdt_pallas,
               (negdt, delta, pert))
    print(f"B={B} pallas fwd            {ms:7.3f} ms", flush=True)
    ms = _time(jax, G._blend_from_negd, (negd, delta, pert))
    print(f"B={B} xla    fwd            {ms:7.3f} ms", flush=True)
    ms = _time(jax, kern_grad, (negdt, delta, pert))
    print(f"B={B} pallas fwd+bwd(p,d)   {ms:7.3f} ms", flush=True)
    ms = _time(jax, xla_grad, (negd, delta, pert))
    print(f"B={B} xla    fwd+bwd(p,d)   {ms:7.3f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from hitadv_tpu.ops import geometry as G
    from hitadv_tpu.ops import pallas_kernels as PK
    from hitadv_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    for B in (64, 256):
        standalone(jax, jnp, G, PK, B)

    if os.environ.get("PROBE_SKIP_ATTACK", "0") == "1":
        return
    for B in (256, 128, 64):
        for impl in ("xla", "pallas"):
            G.set_blend_impl(impl)
            try:
                r = bench._bench_hit_adv(jax, jnp, B=B)
            finally:
                G.set_blend_impl("auto")
            print(f"attack B={B:3d} impl={impl:6s}: "
                  f"{r['examples_per_sec']:.2f} ex/s "
                  f"({r['attack_seconds']:.3f} s; reps "
                  f"{r['attack_seconds_reps']}, fetch "
                  f"{r['attack_seconds_fetchsync']})", flush=True)


if __name__ == "__main__":
    main()
