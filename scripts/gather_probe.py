"""Probe: does Mosaic support dynamic row gather in a Pallas kernel?

Gates the fused EdgeConv (gather+add+leaky+max) kernel idea for DGCNN
(CLAUDE.md round-2 leads).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _edge_max_kernel(a_ref, b_ref, idx_ref, out_ref, *, k: int):
    """out[i] = max_j leaky(a[idx[i, j]] + b[i]). One batch element.

    a_ref: [1, N, C]; b_ref: [1, TQ, C]; idx_ref: [1, TQ, k];
    out_ref: [1, TQ, C].
    """
    a = a_ref[0]                                              # [N, C]
    b = b_ref[0]                                              # [TQ, C]
    acc = jnp.full_like(b, -jnp.inf)

    def body(j, acc):
        rows = idx_ref[0, :, j]                               # [TQ] dyn
        gathered = jnp.take(a, rows, axis=0)                  # [TQ, C]
        e = gathered + b
        e = jnp.where(e >= 0, e, 0.2 * e)
        return jnp.maximum(acc, e)

    out_ref[0] = lax.fori_loop(0, k, body, acc)


def edge_max(a, b, idx, k, tile_q=256):
    B, N, C = a.shape
    TQ = b.shape[1]
    kernel = functools.partial(_edge_max_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=(B, TQ // tile_q),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((1, tile_q, C), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, tile_q, k), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, C), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, TQ, C), jnp.float32),
    )(a, b, idx)


def main():
    B, N, C, k = 16, 1024, 64, 20
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (B, N, C))
    b = jax.random.normal(jax.random.fold_in(key, 1), (B, N, C))
    idx = jax.random.randint(jax.random.fold_in(key, 2),
                             (B, N, k), 0, N, dtype=jnp.int32)
    try:
        out = jax.jit(functools.partial(edge_max, k=k))(a, b, idx)
        out = np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"PROBE FAILED: {type(e).__name__}: {str(e)[:400]}")
        return

    # reference
    gathered = jnp.take_along_axis(
        a[:, :, None, :].repeat(1, axis=2) if False else a,
        idx.reshape(B, -1)[..., None], axis=1).reshape(B, N, k, C)
    e = gathered + b[:, :, None, :]
    want = jnp.max(jnp.where(e >= 0, e, 0.2 * e), axis=2)
    err = float(jnp.abs(want - out).max())
    print(f"PROBE OK, max err {err:.2e}")

    def amortized(op, arg, iters=30):
        @jax.jit
        def run(x):
            def body(c, _):
                o = op(c)
                return c + 1e-7 * o, ()
            xf, _ = lax.scan(body, arg, None, length=iters)
            return xf.sum()
        _ = np.asarray(run(arg))
        t0 = time.perf_counter()
        _ = np.asarray(run(arg))
        return (time.perf_counter() - t0) * 1e3 / iters

    t_pal = amortized(lambda a: jnp.zeros_like(a)
                      + edge_max(a, b, idx, k).sum(), a)
    t_xla = amortized(lambda a: jnp.zeros_like(a) + jnp.max(
        jnp.where((jnp.take_along_axis(
            a, idx.reshape(B, -1)[..., None], axis=1)
            .reshape(B, N, k, C) + b[:, :, None, :]) >= 0,
            (jnp.take_along_axis(a, idx.reshape(B, -1)[..., None],
                                 axis=1).reshape(B, N, k, C)
             + b[:, :, None, :]),
            0.2 * (jnp.take_along_axis(a, idx.reshape(B, -1)[..., None],
                                       axis=1).reshape(B, N, k, C)
                   + b[:, :, None, :])), axis=2).sum(), a)
    print(f"pallas edge_max {t_pal:.2f} ms vs XLA {t_xla:.2f} ms")


if __name__ == "__main__":
    main()
