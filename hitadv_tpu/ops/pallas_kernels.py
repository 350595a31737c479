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
import os
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


# ---------------------------------------------------------------------------
# Selection-loop layout
# ---------------------------------------------------------------------------
#
# The kNN / ball-query / FPS kernels all spend their time in a serial
# selection loop whose per-step costs are REDUCTIONS over the candidate
# axis. Two layouts:
#   * "lanes":    candidates on the lane axis ([TQ, N] blocks) — each
#     step pays cross-lane min/argmax reductions (Mosaic lowers these
#     through lane shuffles);
#   * "sublanes": transposed ([N, TQ]) — each reduction becomes a
#     halving tree of ELEMENTWISE mins over sublane slices (total work
#     ~1 sweep of the block, no lane shuffles) and the knockout a
#     sublane-broadcast compare. Selection semantics are preserved
#     exactly (probes: scripts/{knn,ballq,fps}_transposed_probe.py —
#     bitwise-identical outputs for the exact/ball-query/FPS kernels,
#     identical neighbor sets for the packed kernel).
# The candidate axis is padded to a power of two in "sublanes" (masked
# rows); the dispatcher falls back to "lanes" when that pad exceeds 25%.
#
# Hardware verdict (round 4, v5e — scripts/{knn,ballq,fps}_
# transposed_probe.py): the trade is PER-OP, not global. At the DGCNN/
# PN++ shapes the sublane layout wins the kNN selection loop (exact
# 1.48→1.20 ms; packed 1.30→0.92) and ball query (0.91→0.68), but
# LOSES FPS ~2.5x (0.30→0.76 at npoint=512): FPS's per-step cost is
# one argmax over a [B, N] running-min array — a single cross-lane
# reduction the lane layout already amortizes over its huge parallel
# update step, while the transposed kernel pays the halving tree on
# the critical serial path npoint times. Default "auto" encodes that
# verdict; "lanes"/"sublanes" force one layout everywhere (probes,
# regression hunts).

_AUTO_SUBLANE_OPS = frozenset({"knn_exact", "knn_packed", "ballq"})


def set_extract_layout(layout: str) -> None:
    """Selection-loop layout: "auto" (per-op) | "lanes" | "sublanes"."""
    global _EXTRACT_LAYOUT
    if layout not in ("auto", "lanes", "sublanes"):
        raise ValueError(f"unknown extract layout: {layout!r}")
    _EXTRACT_LAYOUT = layout


def get_extract_layout() -> str:
    return _EXTRACT_LAYOUT


# The env override goes through the same validation as the setter: a
# typo'd HITADV_EXTRACT_LAYOUT must fail loudly, not silently measure
# the default layout while reporting the experiment's name.
set_extract_layout(os.environ.get("HITADV_EXTRACT_LAYOUT", "auto"))


def _pow2_rows(n: int) -> int:
    return 1 << max(3, (n - 1).bit_length())


def _use_transposed(n_candidates: int, op: str = "knn_exact") -> bool:
    if _EXTRACT_LAYOUT == "lanes":
        return False
    if _EXTRACT_LAYOUT == "auto" and op not in _AUTO_SUBLANE_OPS:
        return False
    return 4 * _pow2_rows(n_candidates) <= 5 * n_candidates


def _tree(op, t: jnp.ndarray) -> jnp.ndarray:
    """Reduce axis 0 (sublanes, a power of two) by elementwise halving."""
    r = t.shape[0]
    while r > 1:
        h = r // 2
        t = op(t[:h], t[h:])
        r = h
    return t                                                 # [1, lanes]


_tree_min = functools.partial(_tree, jnp.minimum)


_NEG_INF = float("-inf")
_POS_INF = float("inf")


# ---------------------------------------------------------------------------
# Fused kNN
# ---------------------------------------------------------------------------

def _knn_kernel(q_ref, p_ref, pn_ref, dist_ref, idx_ref, *, k: int,
                n_valid: int, dot_precision=None):
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
        # on the MXU. HIGHEST for real f32 data; DEFAULT (one pass, not
        # six) when the wrapper proved the operands bf16-valued — see
        # `_knn_dot_precision`.
        cross = jax.lax.dot_general(
            q, p, (((1,), (1,)), ((), ())),
            precision=dot_precision or jax.lax.Precision.HIGHEST,
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


def _knn_packed_kernel(q_ref, p_ref, pn_ref, dist_ref, idx_ref, *,
                       k: int, n_valid: int, nb: int,
                       dot_precision=None):
    """Single-reduction variant: distance and index packed into ONE
    int32 per candidate — low ``nb`` bits carry the column index, the
    upper bits the f32 distance pattern (d clamped >= 0, so the int32
    ordering of the bit pattern equals the value ordering). Each of the
    k selection steps is then one lane-min plus one knockout pass
    (~2x fewer [TQ, N] sweeps than the exact kernel), and because
    packed values are UNIQUE the equality knockout is exact and ties
    break to the lowest index, matching top_k.

    Cost: distances are compared with the low nb mantissa bits
    truncated — selection can differ from the exact kernel only
    between candidates within ~2^-nb relative distance of each other
    at the k-th-neighbor boundary. Use for index-only consumers
    (graph rings, grouping gathers), where near-tie membership swaps
    are immaterial; returned distances are the truncated values.
    """
    q = q_ref[0]                                             # [TQ, C]
    p = p_ref[0]                                             # [N, C]
    qn = jnp.sum(q * q, axis=-1, keepdims=True)              # [TQ, 1]
    C = q.shape[-1]
    if C <= 4:
        cross = q[:, 0:1] * p[:, 0][None, :]
        for c in range(1, C):
            cross += q[:, c:c + 1] * p[:, c][None, :]        # [TQ, N]
    else:
        cross = jax.lax.dot_general(
            q, p, (((1,), (1,)), ((), ())),
            precision=dot_precision or jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = jnp.maximum(qn - 2.0 * cross + pn_ref[0], 0.0)       # [TQ, N]

    TQ, N = d.shape
    k_pad = dist_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (TQ, N), 1)
    if n_valid < N:                                          # padded cols
        d = jnp.where(col < n_valid, d, _POS_INF)
    mask = (1 << nb) - 1
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    # inf = 0x7F800000; OR-ing the index keeps padded cols above every
    # finite packed value (finite max after truncation is 0x7F7FFC00)
    pk = jax.lax.bitwise_or(
        jax.lax.bitwise_and(bits, jnp.int32(~mask)), col)
    slot = lax.broadcasted_iota(jnp.int32, (TQ, k_pad), 1)
    maxi = jnp.int32(0x7FFFFFFF)

    # monotone extraction — see _knn_packed_t_kernel (identical
    # selection sequence, read-only pk, [TQ, 1] running-min carry)
    def body(i, carry):
        m_prev, out_d, out_i = carry
        m = jnp.min(jnp.where(pk > m_prev, pk, maxi),
                    axis=1, keepdims=True)                   # [TQ, 1]
        out_i = jnp.where(slot == i,
                          jax.lax.bitwise_and(m, mask), out_i)
        dv = jax.lax.bitcast_convert_type(
            jax.lax.bitwise_and(m, jnp.int32(~mask)), jnp.float32)
        out_d = jnp.where(slot == i, dv, out_d)
        return m, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (jnp.full((TQ, 1), -1, jnp.int32),
         jnp.zeros((TQ, k_pad), jnp.float32),
         jnp.zeros((TQ, k_pad), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def _knn_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, dist_ref, idx_ref, *,
                  k: int, n_valid: int, dot_precision=None):
    """Exact kNN, sublane layout — one (batch, query-tile) program.

    p_ref [1, Np, C] points (Np a power of two, padded rows masked);
    qt_ref [1, C, TQ] queries transposed; pn_ref [1, Np, 1];
    qn_ref [1, 1, TQ]; outputs [1, k_pad, TQ] (untransposed outside).
    Selection per step: value tree-min + masked lowest-index tree-min —
    same semantics as `_knn_kernel`, with the cross-lane reductions
    replaced by elementwise sublane halving. Distances agree with the
    lane layout to FMA-association noise (~2 ulp: the compiler
    contracts the cross term differently per layout), so near-exact
    ties can select differently within that noise — the same tolerance
    class as the documented XLA-vs-Pallas tie notes
    (scripts/knn_transposed_probe.py).
    """
    p = p_ref[0]                                             # [Np, C]
    qt = qt_ref[0]                                           # [C, TQ]
    C = qt.shape[0]
    if C <= 4:
        cross = p[:, 0:1] * qt[0:1, :]
        for c in range(1, C):
            cross += p[:, c:c + 1] * qt[c:c + 1, :]          # [Np, TQ]
    else:
        cross = lax.dot_general(
            p, qt, (((1,), (0,)), ((), ())),
            precision=dot_precision or lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = qn_ref[0] - 2.0 * cross + pn_ref[0]                  # [Np, TQ]

    Np, TQ = d.shape
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    if n_valid < Np:
        d = jnp.where(row < n_valid, d, _POS_INF)
    k_pad = dist_ref.shape[-2]
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)
    big = jnp.int32(2 ** 30)

    def body(i, carry):
        d, out_d, out_i = carry
        m = _tree_min(d)                                     # [1, TQ]
        hit = d <= m
        a = _tree_min(jnp.where(hit, row, big))              # [1, TQ]
        out_d = jnp.where(slot == i, m, out_d)
        out_i = jnp.where(slot == i, a, out_i)
        d = jnp.where(row == a, _POS_INF, d)                 # knockout
        return d, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (d, jnp.zeros((k_pad, TQ), jnp.float32),
         jnp.zeros((k_pad, TQ), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def _knn_packed_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, dist_ref,
                         idx_ref, *, k: int, n_valid: int, nb: int,
                         dot_precision=None):
    """Packed kNN, sublane layout: one tree-min + one knockout sweep
    per neighbor (see `_knn_packed_kernel` for the packing contract).
    Neighbor sets match the lane-layout packed kernel exactly; returned
    distances can differ by one truncation quantum (the
    qn - 2·cross + pn accumulation runs in the transposed broadcast
    order before truncation)."""
    p = p_ref[0]                                             # [Np, C]
    qt = qt_ref[0]                                           # [C, TQ]
    C = qt.shape[0]
    if C <= 4:
        cross = p[:, 0:1] * qt[0:1, :]
        for c in range(1, C):
            cross += p[:, c:c + 1] * qt[c:c + 1, :]          # [Np, TQ]
    else:
        cross = lax.dot_general(
            p, qt, (((1,), (0,)), ((), ())),
            precision=dot_precision or lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    d = jnp.maximum(qn_ref[0] - 2.0 * cross + pn_ref[0], 0.0)

    Np, TQ = d.shape
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    if n_valid < Np:
        d = jnp.where(row < n_valid, d, _POS_INF)
    mask = (1 << nb) - 1
    bits = lax.bitcast_convert_type(d, jnp.int32)
    pk = lax.bitwise_or(lax.bitwise_and(bits, jnp.int32(~mask)), row)
    k_pad = dist_ref.shape[-2]
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)
    maxi = jnp.int32(0x7FFFFFFF)

    # MONOTONE extraction (r5): packed keys are strictly distinct (the
    # low idx bits), so the (i+1)-th smallest == min{pk > m_i} — the
    # knockout write-back of the full [Np, TQ] carry per neighbor is
    # replaced by a read-only pk and a [1, TQ] running-min carry
    # (identical selection sequence; keys non-negative, init -1).
    def body(i, carry):
        m_prev, out_d, out_i = carry
        m = _tree_min(jnp.where(pk > m_prev, pk, maxi))      # [1, TQ]
        out_i = jnp.where(slot == i, lax.bitwise_and(m, mask), out_i)
        dv = lax.bitcast_convert_type(
            lax.bitwise_and(m, jnp.int32(~mask)), jnp.float32)
        out_d = jnp.where(slot == i, dv, out_d)
        return m, out_d, out_i

    _, out_d, out_i = lax.fori_loop(
        0, k, body,
        (jnp.full((1, TQ), -1, jnp.int32),
         jnp.zeros((k_pad, TQ), jnp.float32),
         jnp.zeros((k_pad, TQ), jnp.int32)))
    dist_ref[0] = out_d
    idx_ref[0] = out_i


def _knn_dot_precision(query: jnp.ndarray, points: jnp.ndarray):
    """In-kernel precision for the feature-space cross-term matmul.

    Real f32 data needs HIGHEST (the MXU's DEFAULT rounds f32 operands
    to bf16 — CLAUDE.md Mosaic rule 5: one-hot "exact" matmuls were off
    by 2e-2). When BOTH operands arrive as bf16 (bf16 attack mode's
    feature kNN), the f32 upcast is exact and DEFAULT's operand
    rounding is the identity — the bf16xbf16->f32 products are BITWISE
    the ones HIGHEST computes, at one MXU pass instead of six
    (hardware-asserted in scripts/tpu_verify.py)."""
    both_bf16 = (query.dtype == jnp.bfloat16
                 and points.dtype == jnp.bfloat16)
    return lax.Precision.DEFAULT if both_bf16 else lax.Precision.HIGHEST


def _knn_pallas_transposed(query: jnp.ndarray, points: jnp.ndarray,
                           k: int, tile_q: int,
                           packed: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, Nq, C = query.shape
    N = points.shape[1]
    dot_precision = _knn_dot_precision(query, points)
    query = query.astype(jnp.float32)
    points = points.astype(jnp.float32)

    Np = _pow2_rows(N)
    if Np != N:
        points = jnp.pad(points, ((0, 0), (0, Np - N), (0, 0)))
    pad_q = (-Nq) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    Cp = C if C <= 4 else -(-C // 8) * 8
    if Cp != C:
        query = jnp.pad(query, ((0, 0), (0, 0), (0, Cp - C)))
        points = jnp.pad(points, ((0, 0), (0, 0), (0, Cp - C)))
    qt = jnp.swapaxes(query, 1, 2)                           # [B, Cp, Nq]
    pnorm = jnp.sum(points * points, axis=-1)[..., None]     # [B, Np, 1]
    qnorm = jnp.sum(query * query, axis=-1)[:, None, :]      # [B, 1, Nq]
    k_pad = -(-k // 8) * 8

    if packed:
        nb = max(1, (Np - 1).bit_length())
        kernel = functools.partial(_knn_packed_t_kernel, k=k,
                                   n_valid=N, nb=nb,
                                   dot_precision=dot_precision)
    else:
        kernel = functools.partial(_knn_t_kernel, k=k, n_valid=N,
                                   dot_precision=dot_precision)
    dists, idx = pl.pallas_call(
        kernel,
        grid=(B, (Nq + pad_q) // tile_q),
        interpret=_interpret(),
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


def knn_pallas(query: jnp.ndarray, points: jnp.ndarray, k: int,
               tile_q: int = 256,
               packed: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kNN: (sq dists [B, Nq, k], idx [B, Nq, k]), ascending.

    Exact (not approximate); ties broken by lowest index, matching
    ``lax.top_k`` of the negative distance matrix. With
    ``packed=True`` the selection loop runs on dist|idx packed int32s
    (~2x faster extraction; distances truncated by ceil(log2(N)) low
    mantissa bits — see _knn_packed_kernel for when that is safe).
    Layout dispatch: see `set_extract_layout`.
    """
    if _use_transposed(points.shape[1],
                       "knn_packed" if packed else "knn_exact"):
        # queries sit on the LANE axis in this layout, so the tile is
        # additionally capped at the 128-lane register width
        return _knn_pallas_transposed(query, points, k,
                                      min(tile_q, 128,
                                          max(8, query.shape[1])),
                                      packed)
    B, Nq, C = query.shape
    N = points.shape[1]
    tile_q = min(tile_q, max(8, Nq))
    # distances are always computed in f32 (bf16 victims feed bf16
    # features here; Mosaic also rejects fp32-precision matmuls on bf16
    # operands) — but bf16-origin operands take the one-pass DEFAULT
    # dot, which is bitwise HIGHEST on bf16 values (_knn_dot_precision)
    dot_precision = _knn_dot_precision(query, points)
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
    if packed:
        nb = max(1, (Np - 1).bit_length())
        kernel = functools.partial(_knn_packed_kernel, k=k, n_valid=N,
                                   nb=nb, dot_precision=dot_precision)
    else:
        kernel = functools.partial(_knn_kernel, k=k, n_valid=N,
                                   dot_precision=dot_precision)
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
# Fused ball query (radius grouping, PointNet++/PCT set abstraction)
# ---------------------------------------------------------------------------


def _ballq_kernel(q_ref, p_ref, pn_ref, idx_ref, *, nsample: int,
                  n_valid: int, r2: float):
    """One (batch, query-tile) program.

    q_ref [1, TQ, 3]; p_ref [1, N, 3]; pn_ref [1, 1, N] = |p|^2;
    out [1, TQ, k_pad] int32. The selection KEY is the column index
    masked by the in-ball predicate, so ``nsample`` min+knockout
    passes yield the first in-ball indices in ascending index order —
    the reference's sort-and-fill semantics
    (`model/pointnet2_utils.py:87-107`) without the [B, S, N] sort
    (profiled at 1.44 ms/iter of PointNet++'s 7.4 under attack).
    Pad-with-first and the empty-ball clamp happen in-kernel.

    Membership at the ball RIM is float-rounding sensitive: the XLA
    path's HIGHEST-precision matmul distance and this kernel's
    rank-1 form can disagree on points within ~2e-7 of |d^2 - r^2|
    (measured 2 query rows in 8192 on hardware, each off by one such
    point; CPU interpret mode is bitwise identical). Rim ties are
    implementation-defined in the reference too (CUDA fp32 cdist).
    """
    q = q_ref[0]                                             # [TQ, 3]
    p = p_ref[0]                                             # [N, 3]
    qn = jnp.sum(q * q, axis=-1, keepdims=True)              # [TQ, 1]
    C = q.shape[-1]
    # per-coordinate f32 rank-1 cross term (exact-kNN-kernel formula:
    # MXU DEFAULT would round to bf16 and flip membership at the rim)
    cross = q[:, 0:1] * p[:, 0][None, :]
    for c in range(1, C):
        cross += q[:, c:c + 1] * p[:, c][None, :]            # [TQ, N]
    d = qn - 2.0 * cross + pn_ref[0]                         # [TQ, N]

    TQ, N = d.shape
    k_pad = idx_ref.shape[-1]
    sent = jnp.int32(2 ** 30)
    col = lax.broadcasted_iota(jnp.int32, (TQ, N), 1)
    key = jnp.where((d <= r2) & (col < n_valid), col, sent)
    slot = lax.broadcasted_iota(jnp.int32, (TQ, k_pad), 1)

    # monotone extraction (see _knn_packed_t_kernel): keys are distinct
    # indices, so min{key > m_prev} is the knockout sequence with a
    # read-only key array. Exhausted balls self-stabilize: once m hits
    # ``sent`` no key exceeds it, so every later slot also yields
    # ``sent`` — exactly the fill the pad-with-first pass expects.
    def body(i, carry):
        m_prev, out = carry
        m = jnp.min(jnp.where(key > m_prev, key, sent),
                    axis=1, keepdims=True)                   # [TQ, 1]
        out = jnp.where(slot == i, m, out)
        return m, out

    _, out = lax.fori_loop(
        0, nsample, body,
        (jnp.full((TQ, 1), -1, jnp.int32),
         jnp.zeros((TQ, k_pad), jnp.int32)))
    first = out[:, 0:1]                                      # [TQ, 1]
    out = jnp.where(out == sent,
                    jnp.broadcast_to(first, (TQ, k_pad)), out)
    idx_ref[0] = jnp.minimum(out, n_valid - 1)


def _ballq_t_kernel(p_ref, qt_ref, pn_ref, qn_ref, idx_ref, *,
                    nsample: int, n_valid: int, r2: float):
    """Ball query, sublane layout (see `_ballq_kernel` for semantics).
    The rank-1 cross products commute and the qn - 2·cross + pn order
    is preserved; rim membership can still flip vs the lane layout for
    points with |d^2 - r^2| within FMA-association noise (~1e-7) — the
    rim tolerance class already documented on `_ballq_kernel`
    (scripts/ballq_transposed_probe.py)."""
    p = p_ref[0]                                             # [Np, C]
    qt = qt_ref[0]                                           # [C, TQ]
    C = qt.shape[0]
    cross = p[:, 0:1] * qt[0:1, :]
    for c in range(1, C):
        cross += p[:, c:c + 1] * qt[c:c + 1, :]              # [Np, TQ]
    d = qn_ref[0] - 2.0 * cross + pn_ref[0]                  # [Np, TQ]

    Np, TQ = d.shape
    k_pad = idx_ref.shape[-2]
    sent = jnp.int32(2 ** 30)
    row = lax.broadcasted_iota(jnp.int32, (Np, TQ), 0)
    key = jnp.where((d <= r2) & (row < n_valid), row, sent)
    slot = lax.broadcasted_iota(jnp.int32, (k_pad, TQ), 0)

    # monotone extraction — see _ballq_kernel
    def body(i, carry):
        m_prev, out = carry
        m = _tree_min(jnp.where(key > m_prev, key, sent))    # [1, TQ]
        out = jnp.where(slot == i, m, out)
        return m, out

    _, out = lax.fori_loop(
        0, nsample, body,
        (jnp.full((1, TQ), -1, jnp.int32),
         jnp.zeros((k_pad, TQ), jnp.int32)))
    first = out[0:1]                                         # [1, TQ]
    out = jnp.where(out == sent, jnp.broadcast_to(first, (k_pad, TQ)),
                    out)
    idx_ref[0] = jnp.minimum(out, n_valid - 1)


def _ball_query_transposed(radius: float, nsample: int,
                           xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                           tile_q: int) -> jnp.ndarray:
    B, N, C = xyz.shape
    S = new_xyz.shape[1]
    query = new_xyz.astype(jnp.float32)
    points = xyz.astype(jnp.float32)
    pad_q = (-S) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    Np = _pow2_rows(N)
    if Np != N:
        points = jnp.pad(points, ((0, 0), (0, Np - N), (0, 0)))
    qt = jnp.swapaxes(query, 1, 2)                           # [B, C, S]
    pnorm = jnp.sum(points * points, axis=-1)[..., None]     # [B, Np, 1]
    qnorm = jnp.sum(query * query, axis=-1)[:, None, :]      # [B, 1, S]
    k_pad = -(-nsample // 8) * 8

    idx = pl.pallas_call(
        functools.partial(_ballq_t_kernel, nsample=nsample, n_valid=N,
                          r2=float(radius) ** 2),
        grid=(B, (S + pad_q) // tile_q),
        interpret=_interpret(),
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


def ball_query_pallas(radius: float, nsample: int, xyz: jnp.ndarray,
                      new_xyz: jnp.ndarray,
                      tile_q: int = 256) -> jnp.ndarray:
    """[B, S, nsample] int32 — first ``nsample`` in-ball indices per
    center, ascending index order, padded with the first in-ball index
    (empty balls clamp to N-1, matching the XLA path).
    Layout dispatch: see `set_extract_layout`."""
    if _use_transposed(xyz.shape[1], "ballq"):
        return _ball_query_transposed(
            radius, nsample, xyz, new_xyz,
            min(128, max(8, new_xyz.shape[1])))
    B, N, C = xyz.shape
    S = new_xyz.shape[1]
    query = new_xyz.astype(jnp.float32)
    points = xyz.astype(jnp.float32)
    tile_q = min(tile_q, max(8, S))
    pad_q = (-S) % tile_q
    if pad_q:
        query = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0)))
    pad_n = (-N) % 128
    if pad_n:
        points = jnp.pad(points, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    k_pad = -(-nsample // 128) * 128
    pnorm = jnp.sum(points * points, axis=-1)[:, None, :]    # [B, 1, Np]

    idx = pl.pallas_call(
        functools.partial(_ballq_kernel, nsample=nsample, n_valid=N,
                          r2=float(radius) ** 2),
        grid=(B, (S + pad_q) // tile_q),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, k_pad), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S + pad_q, k_pad), jnp.int32),
    )(query, points, pnorm)
    return idx[:, :S, :nsample]


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


def _fps_t_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, *,
                  npoint: int, n_valid: int):
    """Whole-batch FPS, sublane layout: x/y/z_ref [Np, B] coordinate
    planes (Np a power of two), start_ref [8, B] (row 0), out_ref
    [np_pad, B]. Selection semantics match `_fps_kernel`: first-wins
    argmax == max tree + lowest-index tie tree; the one-hot coordinate
    extraction sums exactly one nonzero. The greedy selection is
    tie-stable only up to FMA-association noise in the squared
    distances (scripts/fps_transposed_probe.py checks equality on
    generic data)."""
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


def _fps_transposed_from_start(xyz: jnp.ndarray, npoint: int,
                               start: jnp.ndarray) -> jnp.ndarray:
    B, N, _ = xyz.shape
    Np = _pow2_rows(N)
    if Np != N:
        xyz = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)))
    planes = [jnp.swapaxes(xyz[..., c], 0, 1) for c in range(3)]  # [Np,B]
    start8 = jnp.broadcast_to(start.astype(jnp.int32)[None, :], (8, B))
    np_pad = -(-npoint // 8) * 8

    out = pl.pallas_call(
        functools.partial(_fps_t_kernel, npoint=npoint, n_valid=N),
        interpret=_interpret(),
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


def fps_pallas_from_start(xyz: jnp.ndarray, npoint: int,
                          start: jnp.ndarray) -> jnp.ndarray:
    """FPS kernel taking explicit per-batch start indices ``[B]``.
    Layout dispatch: see `set_extract_layout`."""
    B, N, _ = xyz.shape
    if B == 1:
        # Mosaic's layout inference dies (inferReshape check-fail) on
        # the kernel's [1]/[1, N] intermediates when the whole-batch
        # block has a single sublane — duplicate the row and keep the
        # first result (probed on TPU: B=1 SIGABRTs, B=2 compiles).
        xyz2 = jnp.concatenate([xyz, xyz], axis=0)
        start2 = jnp.concatenate([start, start], axis=0)
        return fps_pallas_from_start(xyz2, npoint, start2)[:1]
    if _use_transposed(N, "fps"):
        return _fps_transposed_from_start(xyz, npoint, start)
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
    # f32 operands MUST say HIGHEST: Mosaic's default rounds matmul
    # inputs to bf16, so even a 0/1 one-hot gather corrupts the DATA
    # operand (measured 2e-2 abs vs exact; HIGHEST measured exact AND
    # 2.5x faster than the default lowering here). bf16 operands can't
    # take f32 precision (Mosaic rejects it) and are 1-pass exact.
    prec = (jax.lax.Precision.HIGHEST if y.dtype == jnp.float32
            else None)
    # static unroll: idx[:, j] with a traced j would be a lane-dim
    # dynamic_slice, which Mosaic cannot lower
    for j in range(k):
        onehot = (row == idx[:, j][:, None]).astype(y.dtype)  # [T, Np]
        nb = jax.lax.dot_general(
            onehot, y, (((1,), (0,)), ((), ())),
            precision=prec,
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
    g = g_ref[0]                                             # [T, C]
    Np = out_ref.shape[1]
    T = idx.shape[0]
    rowT = lax.broadcasted_iota(jnp.int32, (Np, T), 0)

    # accumulate into the ref per slot — an SSA accumulator chain keeps
    # every unrolled [Np, C] partial alive and blows the 16M scoped
    # VMEM limit at C=256. f32 gradients need HIGHEST (the default
    # rounds the data operand to bf16 — see _gmp_fwd_kernel); bf16
    # gradients are 1-pass exact and can't take f32 precision.
    prec = (jax.lax.Precision.HIGHEST if g.dtype == jnp.float32
            else None)
    zero = jnp.zeros((), g.dtype)
    for j in range(k):
        gj = jnp.where(amax == j, g, zero)                   # [T, C]
        onehotT = (rowT == idx[:, j][None, :]).astype(g.dtype)
        out_ref[0] += jax.lax.dot_general(
            onehotT, gj, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)              # [Np, C]


def graph_max_pool_pallas(y: jnp.ndarray, idx: jnp.ndarray,
                          tile: int = 128):
    """(mx [B, N, C] in y.dtype, amax [B, N, k-slot] int32).

    bf16 inputs stay bf16 through the one-hot matmuls (the MXU's native
    mode, ~4x the f32 throughput): one-hot rows have a single exact 1,
    so the f32-accumulated product reproduces each gathered value
    exactly in any dtype — no precision is lost vs the f32 cast."""
    B, N, C = y.shape
    k = idx.shape[-1]
    yf = y if y.dtype == jnp.bfloat16 else y.astype(jnp.float32)
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
    one-hot^T matmuls accumulated across row tiles (bf16 stays bf16 —
    see graph_max_pool_pallas; accumulation is f32 regardless)."""
    B, N, C = g.shape
    k = idx.shape[-1]
    gf = g if g.dtype == jnp.bfloat16 else g.astype(jnp.float32)
    pad_n = (-N) % tile
    if pad_n:
        # padded rows carry zero gradient -> contribute nothing
        gf = jnp.pad(gf, ((0, 0), (0, pad_n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_n), (0, 0)))
        amax = jnp.pad(amax, ((0, 0), (0, pad_n), (0, 0)))
    Nr = N + pad_n
    pad_out = (-n_points) % 128
    # Np > n_points pads the OUTPUT block only (BlockSpec/out_shape
    # below); the final [:, :n_points] slice drops the pad rows.
    Np = n_points + pad_out
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


# ---------------------------------------------------------------------------
# Fused Gaussian-kernel blend (HiT-ADV deformation field)
# ---------------------------------------------------------------------------
#
# num[b,n,c] = sum_j pert[b,j,c] * ker[b,j,n]
# deno[b,n]  = sum_j ker[b,j,n]
# ker        = exp(-|ori_n - central_j| / (2 delta_j^2))
#
# The XLA formulation (reference parity path in attacks/hit_adv.py,
# `ShapeAttack/HiT_ADV.py:168-175,298-304`) materializes ker [B, Cn, N]
# (50 MB at the flagship shape) through HBM in the forward AND keeps it
# (plus d) as autodiff residuals for the backward. These kernels compute
# ker tile-by-tile in VMEM and never write it out; the backward
# recomputes the tiles flash-attention-style from the [B, Cn]-sized
# inputs. Distances use the broadcast-subtract form, NOT the matmul
# |a|^2+|b|^2-2ab form: central points coincide with cloud points and
# the cancellation error near d=0 is amplified ~50x by exp at
# delta=0.1 (see attacks/hit_adv.py measurement notes).


def _gblend_fwd_kernel(cd_ref, ori_ref, pert4_ref, out_ref, *,
                       cn_valid: int):
    """One (batch, N-tile) program, tiles oriented [TN, Cnp] (cloud
    points in sublanes, centers in lanes).

    cd_ref: [1, Cnp, 4] packed (cx, cy, cz, delta); ori_ref: [1, TN, 3];
    pert4_ref: [1, Cnp, 4] packed (px, py, pz, 1); out_ref:
    [1, TN, 4] columns (num_x, num_y, num_z, deno).

    Orientation rules learned the hard way on real Mosaic (interpret
    mode checks none of this): axis-0 vector reductions don't lower
    ("unsupported output implicit dimension"), and small/odd outputs
    like [B, 4, N] get placed in VMEM (S(1)) by XLA inside scan bodies,
    blowing the 16M scoped-vmem budget. With points-in-sublanes the
    center contraction is one standard ker . pert4 MXU matmul and the
    output is the proven [B, N, C] / (1, tile, C) pattern. HIGHEST
    precision keeps f32 accuracy (default rounds operands to bf16).
    """
    cd = cd_ref[0]                                           # [Cnp, 4]
    o = ori_ref[0]                                           # [TN, 3]
    pert4 = pert4_ref[0]                                     # [Cnp, 4]
    Cnp = cd.shape[0]

    s = None
    for c in range(3):
        dc = o[:, c:c + 1] - cd[:, c][None, :]               # [TN, Cnp]
        s = dc * dc if s is None else s + dc * dc
    d = jnp.sqrt(s + 1e-24)
    delta = cd[:, 3][None, :]                                # [1, Cnp]
    ker = jnp.exp(-d / (2.0 * delta * delta))                # [TN, Cnp]
    if cn_valid < Cnp:
        col = lax.broadcasted_iota(jnp.int32, ker.shape, 1)
        ker = jnp.where(col < cn_valid, ker, 0.0)

    out_ref[0] = jax.lax.dot_general(
        ker, pert4, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                  # [TN, 4]


def _gblend_bwd_kernel(cd_ref, ori_ref, pertt_ref, gn4_ref,
                       go_ref, gcd_ref, *, cn_valid: int):
    """Backward: recompute the ker tile, push cotangents to all inputs.

    pertt_ref: [1, 3, Cnp] pert transposed (host-side); gn4_ref:
    [1, TN, 4] packed (gnum_x, gnum_y, gnum_z, gdeno). go_ref:
    [1, TN, 4] grad of ori in cols 0-2 (per-tile); gcd_ref: [1, 8, Cnp]
    accumulated across tiles — rows 0-2 grad central, 3 grad delta,
    4-6 grad pert.

    Keeps the gs*diff PRODUCT form for both ori and central grads:
    decomposing into o_c*sum(gs) - (cen^T gs)_c cancels catastrophically
    where d ~ 0 (gs ~ 1/sqrt(1e-24) while diff = 0). Per-point sums are
    native lane reductions; per-center sums are ones-row matmuls
    (axis-0 reductions don't lower — see _gblend_fwd_kernel).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        gcd_ref[0] = jnp.zeros_like(gcd_ref[0])

    cd = cd_ref[0]                                           # [Cnp, 4]
    o = ori_ref[0]                                           # [TN, 3]
    pertt = pertt_ref[0]                                     # [3, Cnp]
    gn4 = gn4_ref[0]                                         # [TN, 4]
    Cnp = cd.shape[0]
    TN = o.shape[0]
    hi = jax.lax.Precision.HIGHEST

    diffs = []
    s = None
    for c in range(3):
        dc = o[:, c:c + 1] - cd[:, c][None, :]               # [TN, Cnp]
        diffs.append(dc)
        s = dc * dc if s is None else s + dc * dc
    d = jnp.sqrt(s + 1e-24)
    delta = cd[:, 3][None, :]                                # [1, Cnp]
    inv2d2 = 1.0 / (2.0 * delta * delta)
    ker = jnp.exp(-d * inv2d2)                               # [TN, Cnp]
    if cn_valid < Cnp:
        col = lax.broadcasted_iota(jnp.int32, ker.shape, 1)
        ker = jnp.where(col < cn_valid, ker, 0.0)

    # g_ker[n,j] = sum_c gnum[n,c] * pert[j,c] + gdeno[n]
    gker = jax.lax.dot_general(
        gn4[:, 0:3], pertt, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32) \
        + gn4[:, 3:4]                                        # [TN, Cnp]
    gkk = gker * ker
    gs = gkk * (-inv2d2) / (2.0 * d)                         # grad wrt s

    ones_row = jnp.ones((1, TN), jnp.float32)
    acc = jnp.zeros((8, Cnp), jnp.float32)
    row8 = lax.broadcasted_iota(jnp.int32, (8, Cnp), 0)
    go = jnp.zeros((TN, 4), jnp.float32)
    col4 = lax.broadcasted_iota(jnp.int32, (TN, 4), 1)

    def colsum(x):  # [TN, Cnp] -> [1, Cnp] via ones-row matmul
        return jax.lax.dot_general(
            ones_row, x, (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)

    for c in range(3):
        gsd = gs * diffs[c]                                  # [TN, Cnp]
        go = go + jnp.where(
            col4 == c,
            2.0 * jnp.sum(gsd, axis=1, keepdims=True), 0.0)
        acc = acc + jnp.where(row8 == c, -2.0 * colsum(gsd), 0.0)
        acc = acc + jnp.where(row8 == 4 + c,
                              colsum(ker * gn4[:, c:c + 1]), 0.0)
    dinv = 1.0 / delta                                       # [1, Cnp]
    gdelta = colsum(gkk * d) * (dinv * dinv * dinv)
    acc = acc + jnp.where(row8 == 3, gdelta, 0.0)
    go_ref[0] = go
    gcd_ref[0] += acc


def _gblend_pad(central, ori, delta, pert, tile_n: int):
    """Pad Cn to sublane multiple (delta pad 1.0 to keep 1/delta finite)
    and N to the tile size; returns padded operands + sizes."""
    B, Cn, _ = central.shape
    N = ori.shape[1]
    cn_pad = (-Cn) % 8
    if cn_pad:
        central = jnp.pad(central, ((0, 0), (0, cn_pad), (0, 0)))
        pert = jnp.pad(pert, ((0, 0), (0, cn_pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, cn_pad)),
                        constant_values=1.0)
    n_pad = (-N) % tile_n
    if n_pad:
        ori = jnp.pad(ori, ((0, 0), (0, n_pad), (0, 0)))
    cd = jnp.concatenate([central, delta[..., None]], axis=-1)
    return cd, ori, pert, Cn + cn_pad, N + n_pad


def gaussian_blend_pallas(central: jnp.ndarray, ori: jnp.ndarray,
                          delta: jnp.ndarray, pert: jnp.ndarray,
                          tile_n: int = 512
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward: (num [B, N, 3], deno [B, N]), all f32."""
    B, Cn, _ = central.shape
    N = ori.shape[1]
    tile_n = min(tile_n, max(128, -(-N // 128) * 128))
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    cd, orip, pertp, Cnp, Np = _gblend_pad(
        f32(central), f32(ori), f32(delta), f32(pert), tile_n)

    grid = (B, Np // tile_n)
    pert4 = jnp.concatenate(
        [pertp, jnp.ones(pertp.shape[:2] + (1,), jnp.float32)], axis=-1)
    out = pl.pallas_call(
        functools.partial(_gblend_fwd_kernel, cn_valid=Cn),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, Cnp, 4), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Cnp, 4), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, 4), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, 4), jnp.float32),
    )(cd, orip, pert4)
    return out[:, :N, 0:3], out[:, :N, 3]


def gaussian_blend_bwd_pallas(central: jnp.ndarray, ori: jnp.ndarray,
                              delta: jnp.ndarray, pert: jnp.ndarray,
                              g_num: jnp.ndarray, g_deno: jnp.ndarray,
                              tile_n: int = 512):
    """Grads wrt (central, ori, delta, pert) by tile recompute."""
    B, Cn, _ = central.shape
    N = ori.shape[1]
    tile_n = min(tile_n, max(128, -(-N // 128) * 128))
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    cd, orip, pertp, Cnp, Np = _gblend_pad(
        f32(central), f32(ori), f32(delta), f32(pert), tile_n)
    gn = f32(g_num)
    gd = f32(g_deno)
    n_pad = Np - N
    if n_pad:  # zero cotangents on padded columns contribute nothing
        gn = jnp.pad(gn, ((0, 0), (0, n_pad), (0, 0)))
        gd = jnp.pad(gd, ((0, 0), (0, n_pad)))
    gn4 = jnp.concatenate([gn, gd[..., None]], axis=-1)      # [B, Np, 4]
    pertt = jnp.swapaxes(pertp, 1, 2)                        # [B, 3, Cnp]

    grid = (B, Np // tile_n)
    go, gcd = pl.pallas_call(
        functools.partial(_gblend_bwd_kernel, cn_valid=Cn),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, Cnp, 4), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, tile_n, 3), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 3, Cnp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, tile_n, 4), lambda b, t: (b, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, 4), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 8, Cnp), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, Cnp), jnp.float32),
        ],
    )(cd, orip, pertt, gn4)
    g_ori = go[:, :N, 0:3]
    g_central = jnp.swapaxes(gcd[:, 0:3, :Cn], 1, 2)         # [B, Cn, 3]
    g_delta = gcd[:, 3, :Cn]
    g_pert = jnp.swapaxes(gcd[:, 4:7, :Cn], 1, 2)
    return g_central, g_ori, g_delta, g_pert


# ---------------------------------------------------------------------------
# Gaussian-kernel blend from the hoisted distance field (HiT-ADV scan)
# ---------------------------------------------------------------------------
#
# In the HiT-ADV inner loop ori/central are fixed and the [B, Cn, N]
# distance field is precomputed once (`G.neg_gaussian_field`, hoisted in
# attacks/hit_adv.py:186). These kernels consume that field directly
# (pre-transposed [B, N, Cn] so the cloud dim rides sublanes exactly
# like `_gblend_fwd_kernel`) and only pay the per-iteration math:
# exp(negd / (2 delta^2)) plus the two tiny contractions. Unlike the
# XLA path, the fusion/layout schedule is pinned by the kernel — the
# motivation was the measured B=256 program-level fusion regression
# (RESULTS.md "Batch scaling": the blend exp/einsum region runs 284 us
# per 64 examples at B=256 vs 84 at B=64 inside the big program, while
# a standalone blend probe scales BETTER at B=256 — XLA's choice, not
# the op). The backward recomputes the ker tile from negd (one exp)
# instead of saving the [B, Cn, N] residual pair.
#
# OUTCOME (v5e, .r5/blend_negdt_probe.log): hardware-correct but
# REJECTED as a default — the bwd exp recompute is exactly what makes
# it lose to XLA's saved-residual autodiff (standalone fwd+bwd(p,d)
# B=256: 4.72 ms vs 1.37; full attack 23.6 vs 43.3 ex/s). Dispatch is
# opt-in via geometry.set_blend_impl("pallas").


def _gblend_negdt_fwd_kernel(negdt_ref, pd_ref, out_ref, *,
                             cn_valid: int):
    """One (batch, N-tile) program, tiles oriented [TN, Cnp].

    negdt_ref: [1, TN, Cnp] hoisted -|ori_n - central_j| field
    (transposed host-side, one-time); pd_ref: [1, Cnp, 8] packed
    (px, py, pz, 1, delta, 0, 0, 0); out_ref: [1, TN, 4] columns
    (num_x, num_y, num_z, deno). Padded centers carry delta=1 and
    negd=0 (ker would be 1) and are masked to 0 so deno stays exact.
    """
    negdt = negdt_ref[0]                                     # [TN, Cnp]
    pd = pd_ref[0]                                           # [Cnp, 8]
    Cnp = pd.shape[0]
    delta = pd[:, 4][None, :]                                # [1, Cnp]
    ker = jnp.exp(negdt / (2.0 * delta * delta))             # [TN, Cnp]
    if cn_valid < Cnp:
        col = lax.broadcasted_iota(jnp.int32, ker.shape, 1)
        ker = jnp.where(col < cn_valid, ker, 0.0)
    out_ref[0] = jax.lax.dot_general(
        ker, pd[:, 0:4], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                  # [TN, 4]


def _gblend_negdt_bwd_kernel(negdt_ref, pd_ref, pertt_ref, gn4_ref,
                             gpd_ref, *, cn_valid: int):
    """Backward from the hoisted field: recompute the ker tile, push
    cotangents to (pert, delta) only — negd/ori/central are constants
    inside the attack scan (the XLA-side g_negdt expression in
    `geometry._gaussian_blend_negdt_bwd` covers the general case and
    is dead-code-eliminated when unused).

    gn4_ref: [1, TN, 4] packed (gnum_x, gnum_y, gnum_z, gdeno);
    gpd_ref: [1, 8, Cnp] accumulated across N-tiles — rows 0-2 grad
    pert, row 3 grad delta. Per-center sums are ones-row matmuls
    (axis-0 vector reductions don't lower — see _gblend_fwd_kernel).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        gpd_ref[0] = jnp.zeros_like(gpd_ref[0])

    negdt = negdt_ref[0]                                     # [TN, Cnp]
    pd = pd_ref[0]                                           # [Cnp, 8]
    pertt = pertt_ref[0]                                     # [3, Cnp]
    gn4 = gn4_ref[0]                                         # [TN, 4]
    Cnp = pd.shape[0]
    TN = negdt.shape[0]
    hi = jax.lax.Precision.HIGHEST

    delta = pd[:, 4][None, :]                                # [1, Cnp]
    ker = jnp.exp(negdt / (2.0 * delta * delta))             # [TN, Cnp]
    if cn_valid < Cnp:
        col = lax.broadcasted_iota(jnp.int32, ker.shape, 1)
        ker = jnp.where(col < cn_valid, ker, 0.0)

    # g_ker[n,j] = sum_c gnum[n,c] * pert[j,c] + gdeno[n]
    gker = jax.lax.dot_general(
        gn4[:, 0:3], pertt, (((1,), (0,)), ((), ())),
        precision=hi, preferred_element_type=jnp.float32) \
        + gn4[:, 3:4]                                        # [TN, Cnp]
    gkk = gker * ker

    ones_row = jnp.ones((1, TN), jnp.float32)
    acc = jnp.zeros((8, Cnp), jnp.float32)
    row8 = lax.broadcasted_iota(jnp.int32, (8, Cnp), 0)

    def colsum(x):  # [TN, Cnp] -> [1, Cnp] via ones-row matmul
        return jax.lax.dot_general(
            ones_row, x, (((1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)

    for c in range(3):
        acc = acc + jnp.where(row8 == c,
                              colsum(ker * gn4[:, c:c + 1]), 0.0)
    # d ker / d delta = ker * d * delta^-3 with d = -negd (see
    # _gblend_bwd_kernel — identical expression there).
    dinv = 1.0 / delta                                       # [1, Cnp]
    gdelta = colsum(gkk * (-negdt)) * (dinv * dinv * dinv)
    acc = acc + jnp.where(row8 == 3, gdelta, 0.0)
    gpd_ref[0] += acc


def _gblend_negdt_pad(negdt, delta, pert, tile_n: int):
    """Pad Cn to a sublane multiple (delta pad 1.0 keeps 1/delta
    finite; ker on padded centers is masked in-kernel) and N to the
    tile size; returns padded operands + padded sizes."""
    B, N, Cn = negdt.shape
    cn_pad = (-Cn) % 8
    if cn_pad:
        negdt = jnp.pad(negdt, ((0, 0), (0, 0), (0, cn_pad)))
        pert = jnp.pad(pert, ((0, 0), (0, cn_pad), (0, 0)))
        delta = jnp.pad(delta, ((0, 0), (0, cn_pad)),
                        constant_values=1.0)
    n_pad = (-N) % tile_n
    if n_pad:
        negdt = jnp.pad(negdt, ((0, 0), (0, n_pad), (0, 0)))
    shp = pert.shape[:2]
    pd = jnp.concatenate(
        [pert, jnp.ones(shp + (1,), jnp.float32),
         delta[..., None], jnp.zeros(shp + (3,), jnp.float32)],
        axis=-1)                                             # [B, Cnp, 8]
    return negdt, pd, pert, Cn + cn_pad, N + n_pad


def gaussian_blend_negdt_pallas(negdt: jnp.ndarray, delta: jnp.ndarray,
                                pert: jnp.ndarray, tile_n: int = 512
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused blend forward from the hoisted field:
    (num [B, N, 3], deno [B, N]), all f32. negdt is [B, N, Cn]."""
    B, N, Cn = negdt.shape
    tile_n = min(tile_n, max(128, -(-N // 128) * 128))
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    negdtp, pd, _, Cnp, Np = _gblend_negdt_pad(
        f32(negdt), f32(delta), f32(pert), tile_n)

    out = pl.pallas_call(
        functools.partial(_gblend_negdt_fwd_kernel, cn_valid=Cn),
        grid=(B, Np // tile_n),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_n, Cnp), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Cnp, 8), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, 4), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, 4), jnp.float32),
    )(negdtp, pd)
    return out[:, :N, 0:3], out[:, :N, 3]


def gaussian_blend_negdt_bwd_pallas(negdt: jnp.ndarray,
                                    delta: jnp.ndarray,
                                    pert: jnp.ndarray,
                                    g_num: jnp.ndarray,
                                    g_deno: jnp.ndarray,
                                    tile_n: int = 512):
    """Grads wrt (delta [B, Cn], pert [B, Cn, 3]) by tile recompute."""
    B, N, Cn = negdt.shape
    tile_n = min(tile_n, max(128, -(-N // 128) * 128))
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    negdtp, pd, pertp, Cnp, Np = _gblend_negdt_pad(
        f32(negdt), f32(delta), f32(pert), tile_n)
    gn = f32(g_num)
    gd = f32(g_deno)
    n_pad = Np - N
    if n_pad:  # zero cotangents on padded rows contribute nothing
        gn = jnp.pad(gn, ((0, 0), (0, n_pad), (0, 0)))
        gd = jnp.pad(gd, ((0, 0), (0, n_pad)))
    gn4 = jnp.concatenate([gn, gd[..., None]], axis=-1)      # [B, Np, 4]
    pertt = jnp.swapaxes(pertp, 1, 2)                        # [B, 3, Cnp]

    gpd = pl.pallas_call(
        functools.partial(_gblend_negdt_bwd_kernel, cn_valid=Cn),
        grid=(B, Np // tile_n),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile_n, Cnp), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Cnp, 8), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 3, Cnp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, tile_n, 4), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, Cnp), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 8, Cnp), jnp.float32),
    )(negdtp, pd, pertt, gn4)
    g_delta = gpd[:, 3, :Cn]
    g_pert = jnp.swapaxes(gpd[:, 0:3, :Cn], 1, 2)            # [B, Cn, 3]
    return g_delta, g_pert


# ---------------------------------------------------------------------------
# Fused KDE density (PointConv)
# ---------------------------------------------------------------------------
#
# density_i = mean_j exp(-|x_i - x_j|^2 / (2 bw^2)) / (2.5 bw)
# (`util/pointconv_util.py:209-219`). The XLA path materializes the
# [B, N, N] squared-distance matrix AND keeps the [B, N, N] Gaussian as
# an autodiff residual; PointConv recomputes density at every attack
# iteration (the cloud moves), making this the single hottest op of the
# PointConv victim. These kernels keep everything in VMEM: forward
# reads [B, N, 3], writes [B, N]; backward recomputes the Gaussian tile
# and contracts it against the cotangent in one pass (w is symmetric:
# g_p = c * [x_p (g_p r_p + (Wg)_p) - (g_p (WX)_p + (W(gX))_p)]).


def _kde_fwd_kernel(xr_ref, xa_ref, out_ref, *, n_valid: int,
                    inv2bw2: float, scale: float):
    """Tiles are [TR, Np] (query tile in sublanes, all points in lanes)
    so the density reduction is a native lane reduce; the output is the
    proven [B, N, C] / (1, tile, C) pattern (see _gblend_fwd_kernel
    orientation notes).

    xr_ref: [1, TR, 3] query tile; xa_ref: [1, Np, 3] all points;
    out_ref: [1, TR, 8] with density in column 0.
    """
    xr = xr_ref[0]                                           # [TR, 3]
    xa = xa_ref[0]                                           # [Np, 3]
    TR = xr.shape[0]
    s = None
    for c in range(3):
        dc = xr[:, c:c + 1] - xa[:, c][None, :]              # [TR, Np]
        s = dc * dc if s is None else s + dc * dc
    w = jnp.exp(-s * inv2bw2)
    if n_valid < xa.shape[0]:
        col = lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(col < n_valid, w, 0.0)
    dens = jnp.sum(w, axis=1, keepdims=True) * scale         # [TR, 1]
    col8 = lax.broadcasted_iota(jnp.int32, (TR, 8), 1)
    out_ref[0] = jnp.where(col8 == 0, dens, 0.0)


def _kde_bwd_kernel(xgr_ref, xga_ref, out_ref, *, n_valid: int,
                    inv2bw2: float, scale: float):
    """Inputs packed (x, y, z, g); out_ref: [1, TR, 4] with the
    coordinate gradients in columns 0-2.

    g_p = c0 * [x_p (g_p r_p + (Wg)_p) - (g_p (WX)_p + (W(gX))_p)],
    c0 = -2 * scale * inv2bw2, using the symmetry of W. With queries in
    sublanes every contraction is a native lane reduce.
    """
    xgr = xgr_ref[0]                                         # [TR, 4]
    xga = xga_ref[0]                                         # [Np, 4]
    TR = xgr.shape[0]
    s = None
    for c in range(3):
        dc = xgr[:, c:c + 1] - xga[:, c][None, :]            # [TR, Np]
        s = dc * dc if s is None else s + dc * dc
    w = jnp.exp(-s * inv2bw2)
    if n_valid < xga.shape[0]:
        col = lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(col < n_valid, w, 0.0)

    ga = xga[:, 3][None, :]                                  # [1, Np]
    gr = xgr[:, 3:4]                                         # [TR, 1]
    r = jnp.sum(w, axis=1, keepdims=True)                    # [TR, 1]
    wg = jnp.sum(w * ga, axis=1, keepdims=True)              # [TR, 1]
    c0 = -2.0 * scale * inv2bw2
    out = jnp.zeros((TR, 4), jnp.float32)
    col4 = lax.broadcasted_iota(jnp.int32, (TR, 4), 1)
    for c in range(3):
        xac = xga[:, c][None, :]                             # [1, Np]
        wx = jnp.sum(w * xac, axis=1, keepdims=True)         # [TR, 1]
        wgx = jnp.sum(w * ga * xac, axis=1, keepdims=True)   # [TR, 1]
        gc = c0 * (xgr[:, c:c + 1] * (gr * r + wg)
                   - (gr * wx + wgx))                        # [TR, 1]
        out = out + jnp.where(col4 == c, gc, 0.0)
    out_ref[0] = out


def kde_density_pallas(xyz: jnp.ndarray, bandwidth: float,
                       tile_r: int = 256) -> jnp.ndarray:
    """Fused KDE density: [B, N, 3] -> [B, N], f32."""
    B, N, _ = xyz.shape
    tile_r = min(tile_r, max(128, -(-N // 128) * 128))
    xf = xyz.astype(jnp.float32)
    pad = (-N) % tile_r
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad
    kernel = functools.partial(
        _kde_fwd_kernel, n_valid=N,
        inv2bw2=1.0 / (2.0 * bandwidth * bandwidth),
        scale=1.0 / (N * 2.5 * bandwidth))
    out = pl.pallas_call(
        kernel,
        grid=(B, Np // tile_r),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_r, 3), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Np, 3), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_r, 8), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, 8), jnp.float32),
    )(xf, xf)
    return out[:, :N, 0]


def kde_density_bwd_pallas(xyz: jnp.ndarray, bandwidth: float,
                           g: jnp.ndarray,
                           tile_r: int = 256) -> jnp.ndarray:
    """Grad of kde_density wrt xyz, one recompute pass. [B, N, 3]."""
    B, N, _ = xyz.shape
    tile_r = min(tile_r, max(128, -(-N // 128) * 128))
    xf = xyz.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    pad = (-N) % tile_r
    if pad:  # zero cotangents on padded queries; padded rows masked
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, pad)))
    Np = N + pad
    xg = jnp.concatenate([xf, gf[..., None]], axis=-1)       # [B, Np, 4]
    kernel = functools.partial(
        _kde_bwd_kernel, n_valid=N,
        inv2bw2=1.0 / (2.0 * bandwidth * bandwidth),
        scale=1.0 / (N * 2.5 * bandwidth))
    out = pl.pallas_call(
        kernel,
        grid=(B, Np // tile_r),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile_r, 4), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Np, 4), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_r, 4), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, 4), jnp.float32),
    )(xg, xg)
    return out[:, :N, 0:3]


def _scatter_add_rows_kernel(idx_ref, g_ref, out_ref, *, k: int,
                             splits: int = 1):
    """out[m, c] += sum over rows n in this tile with idx[n, j] == m of
    g[n, j*Cchunk...]: the gather-VJP scatter-add as one-hot^T matmuls.

    idx_ref: [1, T, k_pad] int32 (k index columns per row);
    g_ref: [1, T, splits*C] — k MUST be 1 (callers pre-flatten the k
    columns into rows): g carries no per-j slice, so a k > 1
    instantiation would scatter the SAME [T, C] tile once per index
    column — a silently wrong gradient. The grouped sibling
    `_scatter_add_group_kernel` is the real k > 1 kernel.
    """
    assert k == 1, "scatter_add_rows: pre-flatten k into rows (see doc)"
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[0]
    g = g_ref[0]                                             # [T, C]
    Np = out_ref.shape[1]
    T = idx.shape[0]
    rowT = lax.broadcasted_iota(jnp.int32, (Np, T), 0)
    # Mosaic's DEFAULT precision rounds f32 matmul operands to bf16
    # (measured 2e-2 abs error on the kNN VJP), and HIGHEST costs 6
    # MXU passes — profiled at 8.5 ms/iter on PointConv, where the
    # C=3 xyz scatters pad to 128 lanes so every extra pass is pure
    # waste. Instead f32 gradients are split hi|lo into bf16 halves
    # packed SIDE-BY-SIDE in the lane dim: ONE native bf16 pass
    # ([T, 2C] still <= 128 lanes for C <= 64 — same matmul cost as
    # the unsplit 1-pass), reconstructed as hi + lo after the dot.
    # Max error 2^-17 relative per contribution (measured 2.4e-5 on
    # O(2) data) — gradient-grade exact. bf16 gradients stay 1-pass.
    # splits == 2: f32 gradients arrive PRE-SPLIT hi|lo bf16 from the
    # wrapper (_split2_bf16 via lax.reduce_precision — elision-proof;
    # an in-kernel astype round-trip was compiler-version fragile
    # under --xla_allow_excess_precision, ADVICE r4).
    C = out_ref.shape[-1]
    for j in range(k):
        onehotT = (rowT == idx[:, j][None, :]).astype(g.dtype)
        acc = jax.lax.dot_general(
            onehotT, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] += (acc[:, :C] + acc[:, C:] if splits == 2 else acc)


def _gather_rows_kernel(idx_ref, y_ref, out_ref, *, splits: int):
    """out[t, :] = y[idx[t], :] as a one-hot matmul.

    bf16 data (splits=1) is bitwise exact in one native MXU pass: the
    single 1 per one-hot row selects one value with no other summands.
    f32 data arrives pre-split into ``splits=3`` bf16 planes packed
    side-by-side in the lane dim (hi|mid|lo, 8+8+8 mantissa bits,
    exact by construction — see gather_rows_pallas); reconstruction
    hi + mid + lo in the f32 accumulator is bitwise exact too.
    """
    idx = idx_ref[0]                                         # [T, 1]
    y = y_ref[0]                                             # [Np, S*C]
    T = idx.shape[0]
    Np = y.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (T, Np), 1)
    onehot = (col == idx[:, 0][:, None]).astype(y.dtype)     # [T, Np]
    acc = jax.lax.dot_general(
        onehot, y, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [T, S*C]
    C = out_ref.shape[-1]
    if splits == 1:
        out = acc
    else:
        out = acc[:, :C] + acc[:, C:2 * C] + acc[:, 2 * C:]
    out_ref[0] = out.astype(out_ref.dtype)


def _gather_group_kernel(idx_ref, y_ref, out_ref, *, k: int,
                         splits: int):
    """Grouped gather: out[t, j, :] = y[idx[t, j], :] — one one-hot
    matmul per neighbor slot, exactly `_gmp_fwd_kernel`'s loop without
    the max fold. Consuming the [B, S, ns] idx DIRECTLY (instead of
    the flat [B, S*ns, 1] form) matters on TPU: the flat int32 operand
    is laid out T(8,128) with a 1-wide minor dim, so XLA pads it 128x
    in HBM — profiled at ~0.2 ms/iter of pure pad traffic per gather
    program on PointNet++ (r4 HLO: broadcast_in_dim.880), and the
    [B, M, C] -> [B, S, ns, C] output reshape re-tiles again. Here idx
    tiles densely and the output is written grouped. Same exactness
    contract as `_gather_rows_kernel` (bf16 native 1-pass; f32 via the
    3-plane bf16 split)."""
    idx = idx_ref[0]                                         # [T, k_pad]
    y = y_ref[0]                                             # [Np, S*C]
    T = idx.shape[0]
    Np = y.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (T, Np), 1)
    C = out_ref.shape[-1]
    for j in range(k):
        onehot = (col == idx[:, j][:, None]).astype(y.dtype)  # [T, Np]
        acc = jax.lax.dot_general(
            onehot, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [T, S*C]
        out = (acc if splits == 1
               else acc[:, :C] + acc[:, C:2 * C] + acc[:, 2 * C:])
        # neighbors-major out block (1, ns, T, C): the [T, C] store at
        # slot j rank-extends with LEADING unit dims only — a mid-
        # tensor unit insert ([T,C]->[1,T,1,C] for a [B,S,ns,C] out)
        # is an "unsupported shape cast" in Mosaic's layout inference
        out_ref[0, j] = out.astype(out_ref.dtype)


def _scatter_add_group_kernel(idx_ref, g_ref, out_ref, *, k: int,
                              splits: int = 1):
    """Grouped scatter-add (the grouped gather's VJP): out[m, :] +=
    sum over (t, j) in this tile with idx[t, j] == m of g[t, j, :] —
    `_gmp_bwd_kernel`'s accumulation with the cotangent read per slot
    instead of masked by argmax. f32 gradients ride the hi|lo bf16
    split (see `_scatter_add_rows_kernel`)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    idx = idx_ref[0]                                         # [T, k_pad]
    Np = out_ref.shape[1]
    T = idx.shape[0]
    rowT = lax.broadcasted_iota(jnp.int32, (Np, T), 0)
    C = out_ref.shape[-1]
    # splits == 2: f32 gradients arrive PRE-SPLIT hi|lo bf16 (see
    # _scatter_add_rows_kernel / _split2_bf16)
    for j in range(k):
        gj = g_ref[0, j]        # [T, splits*C] (neighbors-major)
        onehotT = (rowT == idx[:, j][None, :]).astype(gj.dtype)
        acc = jax.lax.dot_general(
            onehotT, gj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] += (acc[:, :C] + acc[:, C:] if splits == 2 else acc)


def _group_tile(tile: int, ns: int, C: int, dtype, S: int) -> int:
    """Shrink the S-tile so the [1, ns, tile, C] 4-D block stays under
    ~4 MB: the big block plus the unrolled loop's SSA temporaries must
    fit Mosaic's 16 MB scoped-VMEM stack (the PCT group1 scatter at
    B=32/f32/C=256 measured 16.86M at tile=256 — a hard compile
    failure, not a perf cliff)."""
    bytes_per_row = ns * C * jnp.dtype(dtype).itemsize
    # 6 MB keeps the measured-good bf16 cases at their probed tiles
    # (ns=32 C=256 bf16 = 4.2 MB compiled and ran); the f32 8.4 MB
    # block is what blew the stack. Floor is 8 (one sublane), not a
    # perf-motivated 64: ns*C can be wide enough (e.g. ns=128, C=1024
    # f32 = 512 KB/row) that tile=64 would still double the 16 MB
    # scoped-VMEM stack — the cap must always win.
    while tile > 8 and tile * bytes_per_row > 6 * 2 ** 20:
        tile //= 2
    if 8 * bytes_per_row > 6 * 2 ** 20:
        # even one sublane of rows overflows the cap — there is no
        # valid tile; the caller must take the XLA path instead
        # (geometry.gather_group_nm's dispatch gate mirrors this bound)
        raise ValueError(
            f"grouped-kernel row of {bytes_per_row} bytes (ns={ns}, "
            f"C={C}, {jnp.dtype(dtype).name}) cannot fit the ~6 MB "
            "scoped-VMEM block cap even at the one-sublane tile; use "
            "the XLA path for this shape")
    return min(tile, max(8, S))


def gather_group_pallas(points: jnp.ndarray, idx: jnp.ndarray,
                        tile: int = 128) -> jnp.ndarray:
    """``out[b, j, s, :] = points[b, idx[b, s, j], :]`` — NEIGHBORS-
    MAJOR output [B, ns, S, C], bitwise exact (bf16: one native pass;
    f32: exact 3-plane bf16 split). Grouped sibling of
    `gather_rows_pallas` — see `_gather_group_kernel` for why the
    [B, S, ns] idx layout is kept and the output is neighbors-major."""
    B, N, C = points.shape
    S, ns = idx.shape[1], idx.shape[2]
    if points.dtype == jnp.bfloat16:
        y, splits, odt = points, 1, jnp.bfloat16
    else:
        y, splits, odt = (_split3_bf16(points.astype(jnp.float32)), 3,
                          jnp.float32)
    pad_n = (-N) % 8
    if pad_n:
        y = jnp.pad(y, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    tile = _group_tile(tile, ns, C, odt, S)
    pad_s = (-S) % tile
    if pad_s:
        idx = jnp.pad(idx, ((0, 0), (0, pad_s), (0, 0)))
    Sp = S + pad_s
    k_pad = -(-ns // 128) * 128
    if k_pad != ns:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_pad - ns)))

    out = pl.pallas_call(
        functools.partial(_gather_group_kernel, k=ns, splits=splits),
        grid=(B, Sp // tile),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile, k_pad), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Np, splits * C), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ns, tile, C),
                               lambda b, t: (b, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, ns, Sp, C), odt),
    )(idx, y)
    return out[:, :, :S]


def scatter_add_group_pallas(idx: jnp.ndarray, g: jnp.ndarray,
                             n_points: int,
                             tile: int = 256) -> jnp.ndarray:
    """grad_points[b, idx[b, s, j], :] += g[b, j, s, :] — grouped
    sibling of `scatter_add_rows_pallas` (same hi|lo f32 contract).
    ``g`` is NEIGHBORS-MAJOR [B, ns, S, C] to match
    `gather_group_pallas`'s output.

    ``tile`` is the contraction K of each per-slot one-hot^T dot:
    128 measured 1.8x slower (MXU pipeline-fill on K=128 across ns
    unrolled dots), 256 wins (2.52 -> 1.38 ms at [16,1024]<-[512,32]
    C=64 bf16), 512 crashes the Mosaic compile (scoped-VMEM)."""
    B, S, ns = idx.shape
    C = g.shape[-1]
    # tile sizing BEFORE the split: the pre-split bf16 [.., 2C] block
    # carries exactly the same bytes as the f32 [.., C] original
    tile = _group_tile(
        tile, ns, C,
        g.dtype if g.dtype == jnp.bfloat16 else jnp.float32, S)
    if g.dtype == jnp.bfloat16:
        gf, splits = g, 1
    else:
        # f32: pre-split hi|lo bf16 host-side (elision-proof)
        gf, splits = _split2_bf16(g.astype(jnp.float32)), 2
    pad_s = (-S) % tile
    if pad_s:
        # padded rows carry zero gradient -> contribute nothing
        gf = jnp.pad(gf, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_s), (0, 0)))
    Sp = S + pad_s
    k_pad = -(-ns // 128) * 128
    if k_pad != ns:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, k_pad - ns)))
    pad_out = (-n_points) % 8
    Np = n_points + pad_out

    out = pl.pallas_call(
        functools.partial(_scatter_add_group_kernel, k=ns,
                          splits=splits),
        grid=(B, Sp // tile),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile, k_pad), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, ns, tile, splits * C),
                         lambda b, t: (b, 0, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, C), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
    )(idx, gf)
    return out[:, :n_points].astype(g.dtype)


def _split3_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 3-plane bf16 decomposition of f32, packed on the last dim.

    hi = bf16(x); r1 = x - hi is exact in f32 (hi within a relative
    2^-8 of x — Sterbenz); mid = bf16(r1); r2 = r1 - mid likewise
    exact and <= 8 significant bits, so lo = bf16(r2) is exact.
    x == hi + mid + lo bitwise (away from the f32 subnormal floor).
    """
    # lax.reduce_precision, NOT an astype round-trip: the environment
    # compiles with --xla_allow_excess_precision=true, which elides
    # x.astype(bf16).astype(f32) to x and silently zeroes the residual
    # planes (measured: the reconstruction degraded to hi-plane-only)
    hi = lax.reduce_precision(x, 8, 7)
    r1 = x - hi
    mid = lax.reduce_precision(r1, 8, 7)
    lo = r1 - mid
    return jnp.concatenate([hi.astype(jnp.bfloat16),
                            mid.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=-1)


def _split2_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """2-plane bf16 decomposition of f32 gradients, packed on the last
    dim: hi = bf16(x); lo = bf16(x - hi). Same lax.reduce_precision
    recipe as `_split3_bf16` (elision-proof under
    --xla_allow_excess_precision, unlike an astype round-trip). Max
    error 2^-17 relative per contribution — the scatter-add gradient
    contract (2.8e-5 measured on hardware), vs the 3-plane split's
    bitwise exactness that gathers require."""
    hi = lax.reduce_precision(x, 8, 7)
    lo = x - hi
    return jnp.concatenate([hi.astype(jnp.bfloat16),
                            lo.astype(jnp.bfloat16)], axis=-1)


def gather_rows_pallas(points: jnp.ndarray, idx: jnp.ndarray,
                       tile: int = 1024) -> jnp.ndarray:
    """``out[b, m, :] = points[b, idx[b, m], :]``, bitwise exact.

    XLA lowers big row gathers to VMEM-read-bound dynamic-slice loops
    (profiled 2.7 ms/iter for PointConv's [16,16384] C=1 f32 density
    gather ALONE); the one-hot matmul runs the same gather on the MXU.
    bf16 data: one native pass. f32 data: exact 3-plane bf16 split
    (see _split3_bf16), still one pass at 3C lanes.
    """
    B, N, C = points.shape
    M = idx.shape[1]
    if points.dtype == jnp.bfloat16:
        y, splits, odt = points, 1, jnp.bfloat16
    else:
        y, splits, odt = (_split3_bf16(points.astype(jnp.float32)), 3,
                          jnp.float32)
    pad_n = (-N) % 8
    if pad_n:
        y = jnp.pad(y, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    pad_m = (-M) % tile
    if pad_m:
        idx = jnp.pad(idx, ((0, 0), (0, pad_m)))
    Mp = M + pad_m
    idx = idx[..., None]                                     # [B, Mp, 1]

    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, splits=splits),
        grid=(B, Mp // tile),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Np, splits * C), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), odt),
    )(idx, y)
    return out[:, :M]


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
    if g.dtype == jnp.bfloat16:
        gf, splits = g, 1
    else:
        # f32: pre-split hi|lo bf16 host-side (elision-proof; same
        # HBM bytes as the f32 original)
        gf, splits = _split2_bf16(g.astype(jnp.float32)), 2
    pad_m = (-M) % tile
    if pad_m:
        gf = jnp.pad(gf, ((0, 0), (0, pad_m), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad_m)))  # pad rows carry g=0
    Mp = M + pad_m
    # lane dim 1 == array dim (allowed): padding idx to 128 lanes
    # materialized an s32[B, M, 128] in HBM — profiled 0.4 ms/iter of
    # pure pad traffic on PointConv
    idx = idx[..., None]                                     # [B, Mp, 1]

    pad_out = (-n_points) % 8
    Np = n_points + pad_out
    grid = (B, Mp // tile)
    out = pl.pallas_call(
        functools.partial(_scatter_add_rows_kernel, k=1, splits=splits),
        grid=grid,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, splits * C), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, Np, C), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
    )(idx, gf)
    return out[:, :n_points].astype(g.dtype)


# ---------------------------------------------------------------------------
# Fused linear + global max-pool (PointNet's [B, N, 1024] bottleneck)
# ---------------------------------------------------------------------------
#
# g[b, c] = max_n (h[b, n, :] @ W[:, c] + bias[c])  — the conv3+maxpool
# pair of `model/pointnet_utils.py:47-55`. Unfused, the [B, N, 1024]
# activation streams through HBM ~5x per attack iteration (conv write,
# maxpool read, dense max-bwd cotangent write, dx read, dW read —
# ~670 MB at the flagship shape, the profiled HBM floor of the whole
# attack). The fused forward computes z tiles in VMEM, keeps a running
# (max, argmax-row) pair, and only [B, 8, C] partials leave the chip;
# the backward is SPARSE: the cotangent routes to exactly one h-row per
# (b, c) through one-hot matmuls, so the dense [B, N, C] tensor never
# exists in either direction.


def _maxlin_fwd_kernel(h_ref, w_ref, mx_ref, row_ref, *,
                       tile_n: int, n_valid: int):
    """One (batch, N-tile) program; the N-tile grid dim accumulates.

    h_ref [1, TN, K] bf16; w_ref [K, C] bf16;
    mx_ref [1, 8, C] f32 / row_ref [1, 8, C] i32 running partials.
    The bias is NOT added here: a per-column constant commutes with
    the row max (argmax unchanged), and a [1, C] bias broadcast from a
    singleton-sublane block crashes Mosaic at C > 128 lanes
    ("limits[i] <= dim(i) (8 vs 1)" in layout assignment) — the
    wrapper adds it to the combined [B, C] result instead.
    """
    t = pl.program_id(1)
    h = h_ref[0]                                             # [TN, K]
    TN = h.shape[0]
    C = w_ref.shape[1]

    # ONE full-width dot: [TN, K] @ [K, C] in a single MXU pass —
    # chunking the dot into 8 [TN, K] @ [K, 128] pieces measured 2.8x
    # off the MXU floor (roofline_maxlin.py: 36% vs the dh kernel's
    # 82%); small dots pay pipeline fill + serialize with the folds.
    z_all = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [TN, C]

    # Only the FOLD is processed in <= 128-lane chunks: its SUBLANE
    # slices crash Mosaic's extract_strided_slice on multi-lane-tile
    # vectors ("Check failed: limits[i] <= dim(i)" in
    # ApplyVectorLayout — probed: C <= 128 compiles, C >= 256
    # SIGABRTs). Lane-dim slices of the wide z_all are fine (the
    # hi|lo scatter kernel relies on them), so each chunk folds
    # single-tile and the results concat.
    #
    # (A max-only fold + equality-pass argmax recovery was probed and
    # measured the same: the kernel is DOT-bound, not fold-bound —
    # the [TN, 128] @ [128, C] contraction runs at ~83 TF/s for XLA
    # and Pallas alike, the hardware's short-K pipeline-fill penalty.
    # See RESULTS.md roofline note.)
    has_pad = (n_valid % tile_n) != 0                        # last tile
    vs, ids = [], []
    for c0 in range(0, C, 128):
        cw = min(128, C - c0)
        z = z_all[:, c0:c0 + cw]                             # [TN, cw]
        ridx = (lax.broadcasted_iota(jnp.int32, (TN, cw), 0)
                + t * tile_n)                                # global rows
        if has_pad:
            z = jnp.where(ridx < n_valid, z, _NEG_INF)       # pad rows

        # fold TN -> 8 sublanes (TN a power of two, enforced by the
        # wrapper), carrying the source-row plane; ties keep the
        # SMALLER global row (torch.max first-argmax semantics)
        half = TN // 2
        while half >= 8:
            lo_v, hi_v = z[:half], z[half:2 * half]
            lo_i, hi_i = ridx[:half], ridx[half:2 * half]
            keep = (lo_v > hi_v) | ((lo_v == hi_v) & (lo_i <= hi_i))
            z = jnp.where(keep, lo_v, hi_v)
            ridx = jnp.where(keep, lo_i, hi_i)
            half //= 2
        vs.append(z)
        ids.append(ridx)
    z = vs[0] if len(vs) == 1 else jnp.concatenate(vs, axis=1)
    ridx = ids[0] if len(ids) == 1 else jnp.concatenate(ids, axis=1)

    @pl.when(t == 0)
    def _init():
        mx_ref[0] = jnp.full_like(mx_ref[0], _NEG_INF)
        row_ref[0] = jnp.zeros_like(row_ref[0])

    mx, row = mx_ref[0], row_ref[0]
    better = (z > mx) | ((z == mx) & (ridx < row))
    mx_ref[0] = jnp.where(better, z, mx)
    row_ref[0] = jnp.where(better, ridx, row)


def max_linear_pallas(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray):
    """(mx8 [B, 8, C] f32, row8 [B, 8, C] i32) partials of
    ``max_n (h @ w + b)``; combine with a first-argmax reduce over
    axis 1 (8 rows — trivial on the XLA side).

    The N-tile is not a caller knob: it is always the largest
    power-of-two <= min(1024, N) (see below)."""
    B, N, K = h.shape
    C = w.shape[1]
    # the in-kernel fold needs a power-of-two tile >= 16. Cap 1024:
    # at the flagship shape one [1024, K] program per batch halves the
    # per-program overhead (DMA + pipeline fill dominate: 128 programs
    # of 2 us measured vs an 0.7 us MXU floor per program).
    tile_n = 16
    while tile_n < min(1024, N):
        tile_n *= 2
    pad_n = (-N) % tile_n
    if pad_n:
        h = jnp.pad(h, ((0, 0), (0, pad_n), (0, 0)))
    Np = N + pad_n
    kernel = functools.partial(_maxlin_fwd_kernel, tile_n=tile_n,
                               n_valid=N)
    mx, row = pl.pallas_call(
        kernel,
        grid=(B, Np // tile_n),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((1, tile_n, K), lambda bb, t: (bb, t, 0)),
            pl.BlockSpec((K, C), lambda bb, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, C), lambda bb, t: (bb, 0, 0)),
            pl.BlockSpec((1, 8, C), lambda bb, t: (bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, C), jnp.int32),
        ],
    )(h, w)
    # bias applied to the folded partials: a per-column constant
    # commutes with the row max and leaves the argmax unchanged
    return mx + b.astype(jnp.float32)[None, None, :], row


def _maxlin_dh_kernel(row_ref, g_ref, wt_ref, out_ref, *, tile_n: int):
    """dh tile: route g[b, c] to the argmax row, contract with W^T.

    row_ref/g_ref [1, 1, C]; wt_ref [C, K] (pre-transposed — the NT
    contraction emitted an i1 relayout Mosaic rejects); out [1, TN, K].
    """
    t = pl.program_id(1)
    C = g_ref.shape[-1]
    TN = out_ref.shape[1]
    ridx = (lax.broadcasted_iota(jnp.int32, (TN, C), 0) + t * tile_n)
    onehot = (ridx == jnp.broadcast_to(row_ref[0], (TN, C))
              ).astype(g_ref.dtype)                          # [TN, C]
    onehotg = onehot * jnp.broadcast_to(g_ref[0], (TN, C))
    out_ref[0] = jax.lax.dot_general(
        onehotg, wt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def max_linear_dh_pallas(row: jnp.ndarray, g: jnp.ndarray,
                         w: jnp.ndarray, n_points: int,
                         tile_n: int = 512) -> jnp.ndarray:
    """dL/dh of max_linear: [B, N, K] in w.dtype. row/g: [B, C]."""
    B, C = row.shape
    K = w.shape[0]
    tile_n = min(tile_n, max(8, -(-n_points // 8) * 8))
    pad_n = (-n_points) % tile_n
    Np = n_points + pad_n
    out = pl.pallas_call(
        functools.partial(_maxlin_dh_kernel, tile_n=tile_n),
        grid=(B, Np // tile_n),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, 1, C), lambda bb, t: (bb, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda bb, t: (bb, 0, 0)),
            pl.BlockSpec((C, K), lambda bb, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, K), lambda bb, t: (bb, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Np, K), w.dtype),
    )(row.reshape(B, 1, C), g.astype(w.dtype).reshape(B, 1, C),
      w.T)
    return out[:, :n_points]
