"""kNN selection-loop layout probe: "lanes" vs "sublanes" (transposed).

Measures the SHIPPED kernels (`ops.pallas_kernels.knn_pallas`) under
both `set_extract_layout` settings, exact and packed, at the DGCNN
feature-kNN shapes. Correctness: identical neighbor indices across
layouts (distances agree to FMA-association noise — see the kernel
docstrings).

Run with JAX_PLATFORMS=cpu for an interpret-mode correctness pass; on
TPU it also times all variants (LICM-proof scan harness, scalar
return — the Mosaic compile of a NEW kernel can take minutes).
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
            d, i = fn(c)
            # consume the carry in the float input (LICM-proof); both
            # outputs come from ONE pallas_call so neither is DCE'd
            return c + 1e-9 * d[0, 0, 0], None
        xf, _ = lax.scan(body, x, None, length=iters)
        return xf[0, 0, 0]
    _ = float(run(x))
    t0 = time.perf_counter()
    _ = float(run(x))
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    k = 20
    for (B, N, C) in [(16, 1024, 64), (16, 1024, 128), (16, 1024, 3)]:
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, C)) * 2 - 1
        out = {}
        for layout in ("lanes", "sublanes"):
            for packed in (False, True):
                pk.set_extract_layout(layout)
                try:
                    d, i = jax.jit(
                        lambda x, p=packed: pk.knn_pallas(x, x, k,
                                                          packed=p))(x)
                    out[(layout, packed)] = np.asarray(i)
                finally:
                    pk.set_extract_layout("lanes")
        same_e = bool(np.array_equal(out[("lanes", False)],
                                     out[("sublanes", False)]))
        same_p = bool(np.array_equal(out[("lanes", True)],
                                     out[("sublanes", True)]))
        print(f"[{B},{N},{C}] k={k}  idx lanes==sublanes  "
              f"exact:{same_e} packed:{same_p}", flush=True)
        if on_tpu:
            ts = {}
            for layout in ("lanes", "sublanes"):
                for packed in (False, True):
                    pk.set_extract_layout(layout)
                    try:
                        ts[(layout, packed)] = timeit(
                            lambda x, p=packed: pk.knn_pallas(
                                x, x, k, packed=p), x)
                    finally:
                        pk.set_extract_layout("lanes")
            print("  exact  lanes {:7.3f} ms | sublanes {:7.3f} ms\n"
                  "  packed lanes {:7.3f} ms | sublanes {:7.3f} ms"
                  .format(ts[("lanes", False)], ts[("sublanes", False)],
                          ts[("lanes", True)], ts[("sublanes", True)]),
                  flush=True)


if __name__ == "__main__":
    main()
