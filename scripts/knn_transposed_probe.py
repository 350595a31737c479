"""Transposed packed kNN extraction — probe vs the shipped kernels.

Hypothesis: the k-pass extraction loop's cost is dominated by the
per-step CROSS-LANE min reduction over N lanes (plus the [TQ, N]
knockout sweep), not by arithmetic. Holding the distance block
TRANSPOSED — points on the SUBLANE axis, queries on lanes — turns the
per-step reduction into a halving tree of elementwise mins over
sublanes (total work ~1 sweep-equivalent, no lane shuffles) and the
knockout into a sublane-broadcast compare.

Variants at the DGCNN feature-kNN shape:
  E: shipped exact kernel        (ops.pallas_kernels._knn_kernel)
  P: shipped packed kernel       (lane-min over packed dist|idx int32)
  T: transposed packed kernel    (this file)

Correctness: T must match P's neighbor sets exactly (same packed
truncation, same lowest-index tie-break). Run with JAX_PLATFORMS=cpu
for an interpret-mode correctness pass; on TPU it also times all
variants (LICM-proof scan harness, scalar return).
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

_POS_INF = float("inf")


def _tree_min(t: jnp.ndarray) -> jnp.ndarray:
    """Min over axis 0 (sublanes) via elementwise halving; rows must be
    a power of two. Total work ~= one sweep of the input block."""
    r = t.shape[0]
    while r > 1:
        h = r // 2
        t = jnp.minimum(t[:h], t[h:])
        r = h
    return t                                                  # [1, TQ]


def _knn_packed_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, dist_ref,
                         idx_ref, *, k: int, n_valid: int, nb: int):
    """One (batch, query-tile) program, transposed layout.

    p_ref: [1, Np, C] points; qt_ref: [1, C, TQ] queries transposed;
    pn_ref: [1, Np, 1] |p|^2; qn_ref: [1, 1, TQ] |q|^2;
    outputs [1, k_pad, TQ] (transposed back outside).
    Np must be a power of two (host pads; padded rows masked to +inf).
    """
    p = p_ref[0]                                              # [Np, C]
    qt = qt_ref[0]                                            # [C, TQ]
    C = p.shape[-1]
    if C <= 4:
        # rank-1 outer products keep geometry-space f32 exactness
        cross = p[:, 0:1] * qt[0:1, :]
        for c in range(1, C):
            cross += p[:, c:c + 1] * qt[c:c + 1, :]           # [Np, TQ]
    else:
        cross = lax.dot_general(
            p, qt, (((1,), (0,)), ((), ())),                  # NN contraction
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = jnp.maximum(pn_ref[0] - 2.0 * cross + qn_ref[0], 0.0)  # [Np, TQ]

    Np, TQ = d.shape
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    if n_valid < Np:
        d = jnp.where(row < n_valid, d, _POS_INF)
    mask = (1 << nb) - 1
    bits = lax.bitcast_convert_type(d, jnp.int32)
    pkd = lax.bitwise_or(lax.bitwise_and(bits, jnp.int32(~mask)), row)

    k_pad = dist_ref.shape[-2]
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)
    maxi = jnp.int32(0x7FFFFFFF)

    def body(i, carry):
        pkd, out_d, out_i = carry
        m = _tree_min(pkd)                                    # [1, TQ]
        out_i = jnp.where(slot == i, lax.bitwise_and(m, mask), out_i)
        dv = lax.bitcast_convert_type(
            lax.bitwise_and(m, jnp.int32(~mask)), jnp.float32)
        out_d = jnp.where(slot == i, dv, out_d)
        pkd = jnp.where(pkd == m, maxi, pkd)                  # knockout
        return pkd, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (pkd, jnp.zeros((k_pad, TQ), jnp.float32),
         jnp.zeros((k_pad, TQ), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def _knn_exact_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, dist_ref,
                        idx_ref, *, k: int, n_valid: int):
    """Exact transposed variant: per step, one value tree-min plus one
    masked index tree-min (same selection semantics as _knn_kernel —
    lowest-index tie-break, full-precision distances). Target: the f32
    feature space where the packed kernels' truncation is disallowed.
    """
    p = p_ref[0]                                              # [Np, C]
    qt = qt_ref[0]                                            # [C, TQ]
    C = qt.shape[0]
    if C <= 4:
        cross = p[:, 0:1] * qt[0:1, :]
        for c in range(1, C):
            cross += p[:, c:c + 1] * qt[c:c + 1, :]           # [Np, TQ]
    else:
        cross = lax.dot_general(
            p, qt, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = qn_ref[0] - 2.0 * cross + pn_ref[0]                   # [Np, TQ]

    Np, TQ = d.shape
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    if n_valid < Np:
        d = jnp.where(row < n_valid, d, _POS_INF)
    k_pad = dist_ref.shape[-2]
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)
    big = jnp.int32(2 ** 30)

    def body(i, carry):
        d, out_d, out_i = carry
        m = _tree_min(d)                                      # [1, TQ]
        hit = d <= m
        a = _tree_min(jnp.where(hit, row, big))               # [1, TQ]
        out_d = jnp.where(slot == i, m, out_d)
        out_i = jnp.where(slot == i, a, out_i)
        d = jnp.where(row == a, _POS_INF, d)                  # knockout
        return d, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (d, jnp.zeros((k_pad, TQ), jnp.float32),
         jnp.zeros((k_pad, TQ), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def knn_packed_t(query: jnp.ndarray, points: jnp.ndarray, k: int,
                 tile_q: int = 128, exact: bool = False):
    B, Nq, C = query.shape
    N = points.shape[1]
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)

    Np = 1 << max(3, (N - 1).bit_length())                    # pow2 rows
    if Np != N:
        points = jnp.pad(points, ((0, 0), (0, Np - N), (0, 0)))
    pad_q = (-Nq) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    Cp = C if C <= 4 else -(-C // 8) * 8
    if Cp != C:
        query = jnp.pad(query, ((0, 0), (0, 0), (0, Cp - C)))
        points = jnp.pad(points, ((0, 0), (0, 0), (0, Cp - C)))
    qt = jnp.swapaxes(query, 1, 2)                            # [B, Cp, Nq]
    pnorm = jnp.sum(points * points, axis=-1)[..., None]      # [B, Np, 1]
    qnorm = jnp.sum(query * query, axis=-1)[:, None, :]       # [B, 1, Nq]
    k_pad = -(-k // 8) * 8
    nb = max(1, (Np - 1).bit_length())

    grid = (B, (Nq + pad_q) // tile_q)
    if exact:
        kernel = functools.partial(_knn_exact_t_kernel, k=k, n_valid=N)
    else:
        kernel = functools.partial(_knn_packed_t_kernel, k=k, n_valid=N,
                                   nb=nb)
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=pk._interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, Np, Cp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Cp, tile_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, Np, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, tile_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, tile_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, k_pad, tile_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k_pad, Nq + pad_q), jnp.float32),
            jax.ShapeDtypeStruct((B, k_pad, Nq + pad_q), jnp.int32),
        ],
    )(points, qt, pnorm, qnorm)
    return (jnp.swapaxes(dists, 1, 2)[:, :Nq, :k],
            jnp.swapaxes(idx, 1, 2)[:, :Nq, :k])


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
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (B, N, C)) * 2 - 1
        dP, iP = jax.jit(lambda x: pk.knn_pallas(x, x, k, packed=True))(x)
        dT, iT = jax.jit(lambda x: knn_packed_t(x, x, k))(x)
        same_i = bool(jnp.all(iP == iT))
        same_d = bool(jnp.all(dP == dT))
        dE, iE = jax.jit(lambda x: pk.knn_pallas(x, x, k, packed=False))(x)
        dX, iX = jax.jit(lambda x: knn_packed_t(x, x, k, exact=True))(x)
        same_xi = bool(jnp.all(iE == iX))
        same_xd = bool(jnp.all(dE == dX))
        print(f"[{B},{N},{C}] k={k}  T==P idx:{same_i} dist:{same_d} | "
              f"Texact==E idx:{same_xi} dist:{same_xd}", flush=True)
        for name, a, b in (("packed", iP, iT), ("exact", iE, iX)):
            bad = int(jnp.sum(a != b))
            if bad:
                print(f"  {name} mismatched entries: {bad}/{a.size}")
        if on_tpu:
            tE = timeit(lambda x: pk.knn_pallas(x, x, k, packed=False), x)
            tP = timeit(lambda x: pk.knn_pallas(x, x, k, packed=True), x)
            tT = timeit(lambda x: knn_packed_t(x, x, k), x)
            tX = timeit(lambda x: knn_packed_t(x, x, k, exact=True), x)
            print(f"  exact {tE:6.3f} ms | packed {tP:6.3f} ms | "
                  f"T-packed {tT:6.3f} ms | T-exact {tX:6.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
