"""FPS selection-loop layout probe: "lanes" vs "sublanes".

Measures the SHIPPED kernel (`ops.pallas_kernels.fps_pallas_from_start`)
under both `set_extract_layout` settings. Correctness: identical index
output across layouts on generic data (the greedy selection is
tie-stable only up to FMA-association noise — see the kernel
docstring).
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


def timeit(fn, x, iters=300):
    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(c)
            return c + 1e-9 * out[0, 0].astype(jnp.float32), None
        xf, _ = lax.scan(body, x, None, length=iters)
        return xf[0, 0, 0]
    _ = float(run(x))
    t0 = time.perf_counter()
    _ = float(run(x))
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    for (B, N, npoint) in [(16, 1024, 512), (64, 1024, 512),
                           (16, 512, 128)]:
        xyz = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3)) * 2 - 1
        start = jnp.zeros((B,), jnp.int32)
        idx = {}
        for layout in ("lanes", "sublanes"):
            pk.set_extract_layout(layout)
            try:
                idx[layout] = np.asarray(jax.jit(
                    lambda x: pk.fps_pallas_from_start(x, npoint, start)
                )(xyz))
            finally:
                pk.set_extract_layout("lanes")
        same = bool(np.array_equal(idx["lanes"], idx["sublanes"]))
        print(f"[B{B} N{N} np{npoint}] idx lanes==sublanes: {same}",
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
                        lambda x: pk.fps_pallas_from_start(x, npoint,
                                                           start), xyz)
                finally:
                    pk.set_extract_layout("lanes")
            print(f"  lanes {ts['lanes']:6.3f} ms | "
                  f"sublanes {ts['sublanes']:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
