"""kNN kernel selection-loop variants — measure on real TPU.

Variants of the k-pass extraction in `_knn_kernel`:
  A: argmin + equality knockout (current)
  B: min + masked-col-min (no argmin lowering)
  C: A with unrolled selection loop
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

_POS_INF = float("inf")


def make_kernel(variant: str, k: int, n_valid: int):
    def kernel(q_ref, p_ref, pn_ref, dist_ref, idx_ref):
        q = q_ref[0]
        p = p_ref[0]
        qn = jnp.sum(q * q, axis=-1, keepdims=True)
        cross = q[:, 0:1] * p[:, 0][None, :]
        for c in range(1, 3):
            cross += q[:, c:c + 1] * p[:, c][None, :]
        d = qn - 2.0 * cross + pn_ref[0]
        TQ, N = d.shape
        k_pad = dist_ref.shape[-1]
        col = lax.broadcasted_iota(jnp.int32, (TQ, N), 1)
        if n_valid < N:
            d = jnp.where(col < n_valid, d, _POS_INF)
        slot = lax.broadcasted_iota(jnp.int32, (TQ, k_pad), 1)

        def body_a(i, carry):
            d, out_d, out_i = carry
            m = jnp.min(d, axis=1)
            a = jnp.argmin(d, axis=1).astype(jnp.int32)
            out_d = jnp.where(slot == i, m[:, None], out_d)
            out_i = jnp.where(slot == i, a[:, None], out_i)
            d = jnp.where(col == a[:, None], _POS_INF, d)
            return d, out_d, out_i

        def body_b(i, carry):
            d, out_d, out_i = carry
            m = jnp.min(d, axis=1)
            hit = d <= m[:, None]
            a = jnp.min(jnp.where(hit, col, jnp.int32(2**30)), axis=1)
            out_d = jnp.where(slot == i, m[:, None], out_d)
            out_i = jnp.where(slot == i, a[:, None], out_i)
            d = jnp.where(col == a[:, None], _POS_INF, d)
            return d, out_d, out_i

        init = (d, jnp.zeros((TQ, k_pad), jnp.float32),
                jnp.zeros((TQ, k_pad), jnp.int32))
        if variant == "A":
            _, out_d, out_i = lax.fori_loop(0, k, body_a, init)
        elif variant == "B":
            _, out_d, out_i = lax.fori_loop(0, k, body_b, init)
        else:  # C: unrolled A
            carry = init
            for i in range(k):
                carry = body_a(i, carry)
            _, out_d, out_i = carry
        dist_ref[0] = out_d
        idx_ref[0] = out_i

    return kernel


def run_variant(variant, x, k=17, tile_q=256):
    B, N, C = x.shape
    k_pad = -(-k // 128) * 128
    pnorm = jnp.sum(x * x, axis=-1)[:, None, :]
    kernel = make_kernel(variant, k, N)
    d, i = pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile_q, k_pad), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, N, k_pad), jnp.int32),
        ],
    )(x, x, pnorm)
    return d[..., :k], i[..., :k]


def amortized(op, arg, iters=40):
    @jax.jit
    def run(x):
        def body(c, _):
            out = op(c)
            return c + 1e-7 * out, ()
        xf, _ = lax.scan(body, arg, None, length=iters)
        return xf.sum()
    _ = np.asarray(run(arg))
    t0 = time.perf_counter()
    _ = np.asarray(run(arg))
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    B, N = 64, 1024
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, N, 3)) * 2 - 1
    ref_d, ref_i = run_variant("A", x)
    for v in ("A", "B", "C"):
        d, i = jax.jit(functools.partial(run_variant, v))(x)
        same = bool(jnp.all(i == ref_i))
        t = amortized(lambda x, v=v: jnp.zeros_like(x)
                      + run_variant(v, x)[0].sum(), x)
        print(f"variant {v}: {t:6.2f} ms  idx==A: {same}", flush=True)


if __name__ == "__main__":
    main()
