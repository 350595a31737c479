"""Transposed FPS — probe vs the shipped whole-batch kernel.

The shipped `_fps_kernel` holds state as [B, N] (points on LANES) and
pays per step: three cross-lane one-hot SUMS (selected-point coords),
one cross-lane argmax, on npoint serial steps. Transposed ([N, B] —
points on SUBLANES, batch on lanes) every reduction becomes a halving
tree of elementwise ops; the lane dim is underfilled at small B but
the serial reduction chain is what the step time is made of.

Selection semantics match the shipped kernel exactly: first-wins
argmax == max tree + lowest-index tie-break tree; distance updates are
elementwise and commute bitwise. Run with JAX_PLATFORMS=cpu for the
interpret-mode bitwise check; on TPU it also times both.
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

_NEG_INF = float("-inf")


def _tree(op, t):
    r = t.shape[0]
    while r > 1:
        h = r // 2
        t = op(t[:h], t[h:])
        r = h
    return t                                                  # [1, B]


def _fps_t_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, *,
                  npoint: int, n_valid: int):
    """x/y/z_ref: [Np, B] coordinate planes (Np a power of two);
    start_ref: [8, B] start index (row 0); out_ref: [np_pad, B]."""
    x, y, z = x_ref[:], y_ref[:], z_ref[:]                   # [Np, B]
    Np, B = x.shape
    np_pad = out_ref.shape[0]
    row = lax.broadcasted_iota(jnp.int32, (Np, B), 0)
    valid = row < n_valid
    out_row = lax.broadcasted_iota(jnp.int32, (np_pad, B), 0)
    big = jnp.int32(2 ** 30)

    def body(i, carry):
        dists, farthest, out = carry                         # [Np,B],[1,B]
        out = jnp.where(out_row == i, farthest, out)
        sel = row == farthest                                # [Np, B]
        cx = _tree(jnp.add, jnp.where(sel, x, 0.0))          # [1, B]
        cy = _tree(jnp.add, jnp.where(sel, y, 0.0))
        cz = _tree(jnp.add, jnp.where(sel, z, 0.0))
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2    # [Np, B]
        dists = jnp.minimum(dists, d)
        masked = jnp.where(valid, dists, _NEG_INF)
        m = _tree(jnp.maximum, masked)                       # [1, B]
        farthest = _tree(jnp.minimum,
                         jnp.where(masked == m, row, big))   # [1, B]
        return dists, farthest, out

    init = (jnp.full((Np, B), 1e10, x.dtype), start_ref[0:1, :],
            jnp.zeros((np_pad, B), jnp.int32))
    _, _, out = lax.fori_loop(0, npoint, body, init)
    out_ref[:] = out


def fps_t_from_start(xyz: jnp.ndarray, npoint: int,
                     start: jnp.ndarray) -> jnp.ndarray:
    B, N, _ = xyz.shape
    Bp = -(-B // 128) * 128 if B > 8 else B   # lane dim: B as-is (<128 ok)
    Np = 1 << max(3, (N - 1).bit_length())
    if Np != N:
        xyz = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)))
    planes = [jnp.swapaxes(xyz[..., c], 0, 1) for c in range(3)]  # [Np,B]
    start8 = jnp.broadcast_to(start.astype(jnp.int32)[None, :], (8, B))
    np_pad = -(-npoint // 8) * 8

    out = pl.pallas_call(
        functools.partial(_fps_t_kernel, npoint=npoint, n_valid=N),
        interpret=pk._interpret(),
        in_specs=[
            pl.BlockSpec((Np, B), lambda: (0, 0)),
            pl.BlockSpec((Np, B), lambda: (0, 0)),
            pl.BlockSpec((Np, B), lambda: (0, 0)),
            pl.BlockSpec((8, B), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((np_pad, B), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((np_pad, B), jnp.int32),
    )(*planes, start8)
    return jnp.swapaxes(out, 0, 1)[:, :npoint]


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
        iA = jax.jit(lambda x: pk.fps_pallas_from_start(x, npoint, start)
                     )(xyz)
        iT = jax.jit(lambda x: fps_t_from_start(x, npoint, start))(xyz)
        same = bool(jnp.all(iA == iT))
        print(f"[B{B} N{N} np{npoint}] T==shipped: {same}", flush=True)
        if not same:
            print(f"  mismatched: {int(jnp.sum(iA != iT))}/{iA.size}")
        if on_tpu:
            tA = timeit(lambda x: pk.fps_pallas_from_start(
                x, npoint, start), xyz)
            tT = timeit(lambda x: fps_t_from_start(x, npoint, start), xyz)
            print(f"  shipped {tA:6.3f} ms | transposed {tT:6.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
