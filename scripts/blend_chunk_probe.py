"""A/B the B=256 flagship attack with a batch-chunked gaussian_blend.

Round-4 finding (RESULTS.md batch-scaling): at B=256 (the reference's
config of record) the blend exp/einsum region runs at 284 us per 64
examples vs 84 at B=64 INSIDE the attack program, while a standalone
blend at B=256 scales BETTER than B=64 — a program-level fusion/layout
regression, not an op cost. Hypothesis: running the blend as
lax.map over B=64 chunks gives each chunk the B=64 fusion schedule
and recovers the difference. Per-example math is unchanged (same
formula per example; reassociation class only).

Times the FULL flagship attack via bench._bench_hit_adv (fetch-synced
timing) stock vs patched.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from hitadv_tpu.ops import geometry as G
    from hitadv_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    B = int(os.environ.get("PROBE_B", "256"))
    chunk = int(os.environ.get("PROBE_CHUNK", "64"))

    stock = bench._bench_hit_adv(jax, jnp, B=B)
    print(f"stock   B={B}: {stock['examples_per_sec']:.2f} ex/s "
          f"({stock['attack_seconds']:.3f} s; reps "
          f"{stock['attack_seconds_reps']}, fetch "
          f"{stock['attack_seconds_fetchsync']})", flush=True)

    _orig = G.gaussian_blend

    def chunked(central, ori, delta, pert, negd=None):
        from jax import lax

        Bc = ori.shape[0]
        if negd is None or Bc <= chunk or Bc % chunk:
            return _orig(central, ori, delta, pert, negd=negd)

        def body(args):
            c, o, d, p, nd = args
            return _orig(c, o, d, p, negd=nd)

        def rs(a):
            return a.reshape((Bc // chunk, chunk) + a.shape[1:])

        num, deno = lax.map(body, (rs(central), rs(ori), rs(delta),
                                   rs(pert), rs(negd)))
        return (num.reshape((Bc,) + num.shape[2:]),
                deno.reshape((Bc,) + deno.shape[2:]))

    G.gaussian_blend = chunked
    try:
        patched = bench._bench_hit_adv(jax, jnp, B=B)
    finally:
        G.gaussian_blend = _orig
    print(f"chunked B={B} (chunk={chunk}): "
          f"{patched['examples_per_sec']:.2f} ex/s "
          f"({patched['attack_seconds']:.3f} s; reps "
          f"{patched['attack_seconds_reps']}, fetch "
          f"{patched['attack_seconds_fetchsync']})", flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
