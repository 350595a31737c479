"""Transposed ball-query extraction — probe vs the shipped kernel.

Same hypothesis as scripts/knn_transposed_probe.py: replace the
per-pass CROSS-LANE min reduction over N with a sublane halving tree
by holding the key block transposed (points on sublanes, queries on
lanes). Unlike the packed kNN case this variant is BITWISE identical
to the shipped kernel: the rank-1 cross products commute and the
qn - 2*cross + pn accumulation order is preserved, so the in-ball
predicate — and therefore the selected index sequence — matches
exactly.

Run with JAX_PLATFORMS=cpu for an interpret-mode bitwise check; on
TPU it also times both variants (LICM-proof scan, scalar return).
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

from hitadv_tpu.ops import pallas_kernels as pk


def _tree_min(t: jnp.ndarray) -> jnp.ndarray:
    r = t.shape[0]
    while r > 1:
        h = r // 2
        t = jnp.minimum(t[:h], t[h:])
        r = h
    return t                                                  # [1, TQ]


def _ballq_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, idx_ref, *,
                    nsample: int, n_valid: int, r2: float):
    """p_ref [1, Np, C]; qt_ref [1, C, TQ]; pn_ref [1, Np, 1];
    qn_ref [1, 1, TQ]; out [1, k_pad, TQ]. Np must be a power of two.
    """
    p = p_ref[0]                                              # [Np, C]
    qt = qt_ref[0]                                            # [C, TQ]
    C = qt.shape[0]
    cross = p[:, 0:1] * qt[0:1, :]
    for c in range(1, C):
        cross += p[:, c:c + 1] * qt[c:c + 1, :]               # [Np, TQ]
    d = qn_ref[0] - 2.0 * cross + pn_ref[0]                   # [Np, TQ]

    Np, TQ = d.shape
    k_pad = idx_ref.shape[-2]
    sent = jnp.int32(2 ** 30)
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    key = jnp.where((d <= r2) & (row < n_valid), row, sent)
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)

    def body(i, carry):
        key, out = carry
        m = _tree_min(key)                                    # [1, TQ]
        out = jnp.where(slot == i, m, out)
        key = jnp.where(key == m, sent, key)                  # knockout
        return key, out

    _, out = lax.fori_loop(0, nsample, body,
                           (key, jnp.zeros((k_pad, TQ), jnp.int32)))
    first = out[0:1]                                          # [1, TQ]
    out = jnp.where(out == sent, jnp.broadcast_to(first, (k_pad, TQ)),
                    out)
    idx_ref[0] = jnp.minimum(out, n_valid - 1)


def ball_query_t(radius: float, nsample: int, xyz: jnp.ndarray,
                 new_xyz: jnp.ndarray, tile_q: int = 128) -> jnp.ndarray:
    B, N, C = xyz.shape
    S = new_xyz.shape[1]
    query = new_xyz.astype(jnp.float32)
    points = xyz.astype(jnp.float32)
    pad_q = (-S) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    Np = 1 << max(3, (N - 1).bit_length())
    if Np != N:
        points = jnp.pad(points, ((0, 0), (0, Np - N), (0, 0)))
    qt = jnp.swapaxes(query, 1, 2)                            # [B, C, S]
    pnorm = jnp.sum(points * points, axis=-1)[..., None]      # [B, Np, 1]
    qnorm = jnp.sum(query * query, axis=-1)[:, None, :]       # [B, 1, S]
    k_pad = -(-nsample // 8) * 8

    idx = pl.pallas_call(
        functools.partial(_ballq_t_kernel, nsample=nsample, n_valid=N,
                          r2=float(radius) ** 2),
        grid=(B, (S + pad_q) // tile_q),
        interpret=pk._interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, C, tile_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, tile_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, k_pad, tile_q),
                               lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, k_pad, S + pad_q), jnp.int32),
    )(points, qt, pnorm, qnorm)
    return jnp.swapaxes(idx, 1, 2)[:, :S, :nsample]


def timeit(fn, *args, iters=300):
    @jax.jit
    def run(q):
        def body(c, _):
            out = fn(c)
            return c + 1e-9 * out[0, 0, 0].astype(jnp.float32), None
        qf, _ = lax.scan(body, q, None, length=iters)
        return qf[0, 0, 0]
    _ = float(run(*args))
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    # PointNet++ SSG stage-1 shape
    B, N, S, nsample, radius = 16, 1024, 512, 32, 0.2
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, N, 3)) * 2 - 1
    centers = xyz[:, :S]
    iA = jax.jit(lambda q: pk.ball_query_pallas(radius, nsample, xyz, q)
                 )(centers)
    iT = jax.jit(lambda q: ball_query_t(radius, nsample, xyz, q)
                 )(centers)
    same = bool(jnp.all(iA == iT))
    print(f"[B{B} N{N} S{S} ns{nsample}] T==shipped idx: {same}",
          flush=True)
    if not same:
        print(f"  mismatched entries: {int(jnp.sum(iA != iT))}/{iA.size}")
    if on_tpu:
        tA = timeit(lambda q: pk.ball_query_pallas(radius, nsample,
                                                   xyz, q), centers)
        tT = timeit(lambda q: ball_query_t(radius, nsample, xyz, q),
                    centers)
        print(f"  shipped {tA:6.3f} ms | transposed {tT:6.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
