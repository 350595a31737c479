"""Standalone Mosaic probe for the grouped gather/scatter kernels.

New pattern vs the shipped kernels: 4-D BlockSpecs — out (1, tile, ns,
C) with a static-slot write `out_ref[0, :, j]`, and the grouped
cotangent read `g_ref[0, :, j]`. Interpret mode checks none of this;
only a real-TPU compile does (CLAUDE.md Mosaic rule 4). Timings
compare against the flat kernel + the reshape/retile it needs, at the
PN++/PCT/PointConv attack shapes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hitadv_tpu.ops import pallas_kernels as PK


def timeit(f, *args, iters=50):
    """In-jit scan timing; body consumes the carry (CLAUDE.md)."""
    import time

    def body(c, _):
        out = f(*((args[0] + c,) + args[1:]))
        return c + out.astype(jnp.float32).mean() * 1e-20, ()

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None,
                                       length=iters)[0])
    run().block_until_ready()
    t0 = time.perf_counter()
    r = run().block_until_ready()
    dt = (time.perf_counter() - t0) * 1e3 / iters
    return dt, r


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for (B, N, S, ns, C, dt) in [
        (16, 1024, 512, 32, 64, "bfloat16"),   # PN++ sa1 / PCT g0
        (16, 512, 128, 64, 128, "bfloat16"),   # PN++ sa2
        (16, 1024, 512, 32, 73, "float32"),    # PointConv sa1 f32 mode
    ]:
        pts = jnp.asarray(rng.normal(size=(B, N, C)),
                          jnp.float32).astype(jnp.dtype(dt))
        idx = jnp.asarray(rng.integers(0, N, (B, S, ns)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(B, ns, S, C)),
                        jnp.float32).astype(jnp.dtype(dt))

        got = jax.jit(PK.gather_group_pallas)(pts, idx)
        ref = jnp.transpose(jnp.take_along_axis(
            pts, idx.reshape(B, -1)[..., None], axis=1
        ).reshape(B, S, ns, C), (0, 2, 1, 3))
        ok_f = bool(jnp.array_equal(got, ref))

        sc = jax.jit(lambda i, gg: PK.scatter_add_group_pallas(
            i, gg, N))(idx, g)
        sc_ref = jax.jit(lambda i, gg: PK.scatter_add_rows_pallas(
            i.reshape(B, -1),
            jnp.transpose(gg, (0, 2, 1, 3)).reshape(B, -1, C), N))(idx, g)
        dmax = float(jnp.max(jnp.abs(
            sc.astype(jnp.float32) - sc_ref.astype(jnp.float32))))

        t_grp, _ = timeit(
            lambda p, i: PK.gather_group_pallas(p, i).sum(), pts, idx)
        t_flat, _ = timeit(
            lambda p, i: PK.gather_rows_pallas(
                p, i.reshape(B, -1)).reshape(B, S, ns, C).sum(),
            pts, idx)
        ts_grp, _ = timeit(
            lambda gg, i: PK.scatter_add_group_pallas(i, gg, N).sum(),
            g, idx)
        ts_flat, _ = timeit(
            lambda gg, i: PK.scatter_add_rows_pallas(
                i.reshape(B, -1),
                jnp.transpose(gg, (0, 2, 1, 3)).reshape(B, -1, C),
                N).sum(),
            g, idx)
        print(f"[{B},{N}]->[{S},{ns}] C={C} {dt:8s} "
              f"fwd_bitwise={ok_f} bwd_maxdiff={dmax:.1e}", flush=True)
        print(f"  gather  grouped {t_grp:6.3f} ms | flat+reshape "
              f"{t_flat:6.3f} ms", flush=True)
        print(f"  scatter grouped {ts_grp:6.3f} ms | flat+reshape "
              f"{ts_flat:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
