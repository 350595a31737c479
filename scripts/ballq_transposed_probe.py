"""Ball-query selection-loop layout probe: "lanes" vs "sublanes".

Measures the SHIPPED kernel (`ops.pallas_kernels.ball_query_pallas`)
under both `set_extract_layout` settings at the PointNet++ stage-1
shape. Correctness: identical index output across layouts (rim
membership can flip within FMA noise — see the kernel docstring).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.ops import pallas_kernels as pk


def timeit(fn, q, iters=300):
    @jax.jit
    def run(q):
        def body(c, _):
            out = fn(c)
            return c + 1e-9 * out[0, 0, 0].astype(jnp.float32), None
        qf, _ = lax.scan(body, q, None, length=iters)
        return qf[0, 0, 0]
    _ = float(run(q))
    t0 = time.perf_counter()
    _ = float(run(q))
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    B, N, S, nsample, radius = 16, 1024, 512, 32, 0.2
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3)) * 2 - 1
    centers = xyz[:, :S]
    idx = {}
    for layout in ("lanes", "sublanes"):
        pk.set_extract_layout(layout)
        try:
            idx[layout] = np.asarray(jax.jit(
                lambda q: pk.ball_query_pallas(radius, nsample, xyz, q)
            )(centers))
        finally:
            pk.set_extract_layout("lanes")
    same = bool(np.array_equal(idx["lanes"], idx["sublanes"]))
    print(f"[B{B} N{N} S{S} ns{nsample}] idx lanes==sublanes: {same}",
          flush=True)
    if not same:
        bad = int((idx["lanes"] != idx["sublanes"]).sum())
        print(f"  mismatched entries: {bad}/{idx['lanes'].size}")
    if on_tpu:
        ts = {}
        for layout in ("lanes", "sublanes"):
            pk.set_extract_layout(layout)
            try:
                ts[layout] = timeit(
                    lambda q: pk.ball_query_pallas(radius, nsample,
                                                   xyz, q), centers)
            finally:
                pk.set_extract_layout("lanes")
        print(f"  lanes {ts['lanes']:6.3f} ms | "
              f"sublanes {ts['sublanes']:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
