"""Pallas TPU kernels for the hot geometry ops.

Measured on one v5e chip at B=64, N=1024 (the flagship eval shape), the
pure-XLA backend costs per call:
  * kNN(k=17): ~20 ms — ``lax.top_k`` sorts the full [B, N, N] distance
    matrix through HBM;
  * FPS(512):  ~10 ms — 512 sequential XLA loop steps.
These kernels fuse the whole computation in VMEM:
  * `knn_pallas`: distance tile computed on the MXU per query block and
    reduced by k-pass min-extraction — only ``[B, Nq, K]`` ever touches
    HBM (no N×N materialization, no sort);
  * `fps_pallas`: the entire greedy loop runs in one kernel with the
    min-distance field resident in VMEM (one-hot matmul gathers replace
    dynamic indexing).

Both match the pure-JAX reference ops in `ops/geometry.py` exactly (same
tie-breaking: lowest index wins). Results are accumulated in loop
carries and stored once — Mosaic cannot prove alignment for
per-iteration dynamic-column vector stores.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


_NEG_INF = float("-inf")
_POS_INF = float("inf")


# ---------------------------------------------------------------------------
# Fused kNN
# ---------------------------------------------------------------------------

def _knn_kernel(q_ref, p_ref, pn_ref, dist_ref, idx_ref, *, k: int,
                n_valid: int):
    """One (batch, query-tile) program.

    q_ref: [1, TQ, 3] queries; p_ref: [1, N, 3] points;
    pn_ref: [1, 1, N] precomputed |p|^2; outputs [1, TQ, k_pad].
    """
    q = q_ref[0]                                             # [TQ, C]
    p = p_ref[0]                                             # [N, C]
    qn = jnp.sum(q * q, axis=-1, keepdims=True)              # [TQ, 1]
    C = q.shape[-1]
    if C <= 4:
        # |q|^2 + |p|^2 - 2 q.p with the cross term as per-coordinate
        # f32 rank-1 products: the MXU would round inputs to bf16 (abs
        # error ~1e-2, enough to flip neighbor order vs the XLA
        # HIGHEST-precision path), and at C=3 the MXU is idle anyway.
        cross = q[:, 0:1] * p[:, 0][None, :]
        for c in range(1, C):
            cross += q[:, c:c + 1] * p[:, c][None, :]        # [TQ, N]
    else:
        # feature-space kNN (DGCNN edge conv, C up to 256): real matmul
        # on the MXU at full f32 precision.
        cross = jax.lax.dot_general(
            q, p, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = qn - 2.0 * cross + pn_ref[0]                         # [TQ, N]

    TQ, N = d.shape
    k_pad = dist_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (TQ, N), 1)
    if n_valid < N:                                          # padded cols
        d = jnp.where(col < n_valid, d, _POS_INF)
    slot = lax.broadcasted_iota(jnp.int32, (TQ, k_pad), 1)

    def body(i, carry):
        d, out_d, out_i = carry
        m = jnp.min(d, axis=1)                               # [TQ]
        # index via masked column-min rather than argmin: ~1.8x faster
        # under Mosaic AND matches top_k's lowest-index tie-breaking
        hit = d <= m[:, None]
        a = jnp.min(jnp.where(hit, col, jnp.int32(2 ** 30)), axis=1)
        out_d = jnp.where(slot == i, m[:, None], out_d)
        out_i = jnp.where(slot == i, a[:, None], out_i)
        d = jnp.where(col == a[:, None], _POS_INF, d)        # knock out
        return d, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (d, jnp.zeros((TQ, k_pad), jnp.float32),
         jnp.zeros((TQ, k_pad), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def knn_pallas(query: jnp.ndarray, points: jnp.ndarray, k: int,
               tile_q: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (sq dists [B, Nq, k], idx [B, Nq, k]), ascending.

    Exact (not approximate); ties broken by lowest index, matching
    ``lax.top_k`` of the negative distance matrix.
    """
    B, Nq, C = query.shape
    N = points.shape[1]
    tile_q = min(tile_q, max(8, Nq))
    # distances are always computed in f32 (bf16 victims feed bf16
    # features here; Mosaic also rejects fp32-precision matmuls on bf16
    # operands)
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)

    pad_q = (-Nq) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    pad_n = (-N) % 128
    if pad_n:
        points = jnp.pad(points, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    k_pad = -(-k // 128) * 128
    pnorm = jnp.sum(points * points, axis=-1)[:, None, :]    # [B, 1, Np]

    grid = (B, (Nq + pad_q) // tile_q)
    kernel = functools.partial(_knn_kernel, k=k, n_valid=N)
    dists, idx = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, k_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile_q, k_pad), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq + pad_q, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, Nq + pad_q, k_pad), jnp.int32),
        ],
    )(query, points, pnorm)
    return dists[:, :Nq, :k], idx[:, :Nq, :k]


# ---------------------------------------------------------------------------
# Fused FPS
# ---------------------------------------------------------------------------

def _fps_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, *, npoint: int,
                n_valid: int):
    """Whole-batch FPS in one program.

    x/y/z_ref: [B, N] coordinate planes; start_ref: [B, 128] start index
    (column 0); out_ref: [B, npoint_pad] int32 indices.
    """
    x, y, z = x_ref[:], y_ref[:], z_ref[:]                   # [B, N]
    B, N = x.shape
    np_pad = out_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (B, N), 1)
    valid = col < n_valid
    out_col = lax.broadcasted_iota(jnp.int32, (B, np_pad), 1)

    def body(i, carry):
        dists, farthest, out = carry
        out = jnp.where(out_col == i, farthest[:, None], out)
        onehot = (col == farthest[:, None]).astype(x.dtype)  # [B, N]
        cx = jnp.sum(onehot * x, axis=1, keepdims=True)      # [B, 1]
        cy = jnp.sum(onehot * y, axis=1, keepdims=True)
        cz = jnp.sum(onehot * z, axis=1, keepdims=True)
        d = ((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)  # [B, N]
        dists = jnp.minimum(dists, d)
        masked = jnp.where(valid, dists, _NEG_INF)
        farthest = jnp.argmax(masked, axis=1).astype(jnp.int32)
        return dists, farthest, out

    init = (jnp.full((B, N), 1e10, x.dtype), start_ref[:, 0],
            jnp.zeros((B, np_pad), jnp.int32))
    _, _, out = lax.fori_loop(0, npoint, body, init)
    out_ref[:] = out


def fps_pallas_from_start(xyz: jnp.ndarray, npoint: int,
                          start: jnp.ndarray) -> jnp.ndarray:
    """FPS kernel taking explicit per-batch start indices ``[B]``."""
    B, N, _ = xyz.shape
    start = jnp.pad(start.reshape(B, 1).astype(jnp.int32),
                    ((0, 0), (0, 127)))                      # lane-pad

    pad_n = (-N) % 128
    if pad_n:
        xyz = jnp.pad(xyz, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    npoint_pad = -(-npoint // 128) * 128
    planes = [xyz[..., 0], xyz[..., 1], xyz[..., 2]]          # [B, Np] x3

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_valid=N)
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((B, Np), lambda: (0, 0)),
            pl.BlockSpec((B, Np), lambda: (0, 0)),
            pl.BlockSpec((B, Np), lambda: (0, 0)),
            pl.BlockSpec((B, 128), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, npoint_pad), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, npoint_pad), jnp.int32),
    )(*planes, start)
    return out[:, :npoint]


def fps_pallas(xyz: jnp.ndarray, npoint: int,
               key: Optional[jax.Array] = None,
               start_idx: int = 0) -> jnp.ndarray:
    """Farthest point sampling, single fused kernel.

    Matches `ops.geometry.farthest_point_sample` (including argmax
    first-wins tie-breaking and the random/fixed start conventions).
    """
    B, N, _ = xyz.shape
    if key is not None:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        start = jnp.full((B,), start_idx, dtype=jnp.int32)
    return fps_pallas_from_start(xyz, npoint, start)


# ---------------------------------------------------------------------------
# Fused graph max-pool (DGCNN EdgeConv neighbor reduction)
# ---------------------------------------------------------------------------
#
# mx[b, n, c] = max_j y[b, idx[b, n, j], c]  (plus the argmax slot for
# the custom VJP). Dynamic row gathers do not lower in this Mosaic
# version (scripts/gather_probe.py), so each neighbor slot is gathered
# by a one-hot matmul built in VMEM — unlike the XLA one-hot
# formulation, the [T, N] one-hot never touches HBM, and the backward
# scatter-add becomes one-hot^T matmuls accumulated in VMEM.


def _gmp_fwd_kernel(y_ref, idx_ref, mx_ref, amax_ref, *, k: int):
    """One (batch, row-tile) program.

    y_ref: [1, Np, C]; idx_ref: [1, T, k_pad] int32;
    mx_ref: [1, T, C] f32; amax_ref: [1, T, C] int32.
    """
    y = y_ref[0]                                             # [Np, C]
    idx = idx_ref[0]                                         # [T, k_pad]
    T = idx.shape[0]
    Np, C = y.shape
    row = lax.broadcasted_iota(jnp.int32, (T, Np), 1)

    mx = jnp.full((T, C), _NEG_INF, jnp.float32)
    amax = jnp.zeros((T, C), jnp.int32)
    # static unroll: idx[:, j] with a traced j would be a lane-dim
    # dynamic_slice, which Mosaic cannot lower
    for j in range(k):
        onehot = (row == idx[:, j][:, None]).astype(y.dtype)  # [T, Np]
        nb = jax.lax.dot_general(
            onehot, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [T, C]
        better = nb > mx
        mx = jnp.where(better, nb, mx)
        amax = jnp.where(better, j, amax)
    mx_ref[0] = mx
    amax_ref[0] = amax


def _gmp_bwd_kernel(idx_ref, amax_ref, g_ref, out_ref, *, k: int):
    """grad_y accumulation: out[m, c] += sum over rows n in this tile
    with idx[n, amax[n, c]] == m of g[n, c]."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[0]                                         # [T, k_pad]
    amax = amax_ref[0]                                       # [T, C]
    g = g_ref[0].astype(jnp.float32)                         # [T, C]
    Np = out_ref.shape[1]
    T = idx.shape[0]
    rowT = lax.broadcasted_iota(jnp.int32, (Np, T), 0)

    # accumulate into the ref per slot — an SSA accumulator chain keeps
    # every unrolled [Np, C] partial alive and blows the 16M scoped
    # VMEM limit at C=256
    for j in range(k):
        gj = jnp.where(amax == j, g, 0.0)                    # [T, C]
        onehotT = (rowT == idx[:, j][None, :]).astype(jnp.float32)
        out_ref[0] += jax.lax.dot_general(
            onehotT, gj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Np, C]


def graph_max_pool_pallas(y: jnp.ndarray, idx: jnp.ndarray,
                          tile: int = 128):
    """(mx [B, N, C] in y.dtype, amax [B, N, k-slot] int32)."""
    B, N, C = y.shape
    k = idx.shape[-1]
    yf = y.astype(jnp.float32)
    pad_n = (-N) % tile
    if pad_n:
        yf = jnp.pad(yf, ((0, 0), (0, pad_n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_pad - k)))

    grid = (B, Np // tile)
    mx, amax = pl.pallas_call(
        functools.partial(_gmp_fwd_kernel, k=k),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, Np, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, tile, k_pad), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, C), jnp.int32),
        ],
    )(yf, idx)
    return mx[:, :N].astype(y.dtype), amax[:, :N]


def graph_max_pool_bwd_pallas(idx: jnp.ndarray, amax: jnp.ndarray,
                              g: jnp.ndarray, n_points: int,
                              tile: int = 128) -> jnp.ndarray:
    """grad wrt y: scatter-add of g at the argmax neighbors, as
    one-hot^T matmuls accumulated across row tiles."""
    B, N, C = g.shape
    k = idx.shape[-1]
    gf = g.astype(jnp.float32)
    pad_n = (-N) % tile
    if pad_n:
        # padded rows carry zero gradient -> contribute nothing
        gf = jnp.pad(gf, ((0, 0), (0, pad_n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_n), (0, 0)))
        amax = jnp.pad(amax, ((0, 0), (0, pad_n), (0, 0)))
    Nr = N + pad_n
    pad_out = (-n_points) % 128
    Np = n_points + pad_out
    if Np != n_points:
        # target rows only reach n_points-1; pad block only
        pass
    k_pad = -(-k // 128) * 128
    if k_pad != k:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_pad - k)))

    grid = (B, Nr // tile)
    out = pl.pallas_call(
        functools.partial(_gmp_bwd_kernel, k=k),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile, k_pad), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, C), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
    )(idx, amax, gf)
    return out[:, :n_points].astype(g.dtype)


def _scatter_add_rows_kernel(idx_ref, g_ref, out_ref, *, k: int):
    """out[m, c] += sum over rows n in this tile with idx[n, j] == m of
    g[n, j*Cchunk...]: the gather-VJP scatter-add as one-hot^T matmuls.

    idx_ref: [1, T, k_pad] int32 (k index columns per row);
    g_ref: [1, T, k_pad is folded into rows upstream] — here g is
    [1, T, C] with k == 1 (rows pre-flattened); kept general over k for
    symmetry with the max-pool kernel.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[0]
    g = g_ref[0].astype(jnp.float32)                         # [T, C]
    Np = out_ref.shape[1]
    T = idx.shape[0]
    rowT = lax.broadcasted_iota(jnp.int32, (Np, T), 0)
    for j in range(k):
        onehotT = (rowT == idx[:, j][None, :]).astype(jnp.float32)
        out_ref[0] += jax.lax.dot_general(
            onehotT, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def scatter_add_rows_pallas(idx: jnp.ndarray, g: jnp.ndarray,
                            n_points: int,
                            tile: int = 256) -> jnp.ndarray:
    """grad_points[b, idx[b, m], :] += g[b, m, :] without XLA scatter.

    idx: [B, M] int32; g: [B, M, C]. Returns [B, n_points, C] in
    g.dtype. The TPU-native transpose of a row gather: XLA's
    scatter-add runs 5-20x slower than these accumulated one-hot^T
    matmuls at attack shapes (see graph_max_pool measurements).
    """
    B, M = idx.shape
    C = g.shape[-1]
    gf = g.astype(jnp.float32)
    pad_m = (-M) % tile
    if pad_m:
        gf = jnp.pad(gf, ((0, 0), (0, pad_m), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_m)))  # pad rows carry g=0
    Mp = M + pad_m
    idx = jnp.pad(idx[..., None], ((0, 0), (0, 0), (0, 127)))  # lane pad

    pad_out = (-n_points) % 8
    Np = n_points + pad_out
    grid = (B, Mp // tile)
    out = pl.pallas_call(
        functools.partial(_scatter_add_rows_kernel, k=1),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile, 128), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, C), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
    )(idx, gf)
    return out[:, :n_points].astype(g.dtype)
