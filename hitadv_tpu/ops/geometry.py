"""TPU-native point-cloud geometry ops (pure JAX/XLA reference backend).

This module is the single geometry-ops layer of the framework. It replaces
the five duplicated pure-torch copies scattered across the reference repo
(`model/pointnet2_utils.py`, `model/pct_utils.py`, `util/pointconv_util.py`,
`ShapeAttack/HiT_ADV.py`, `util/other_utils.py`) as well as the vendored CUDA
extension `pointnet2_ops_lib/` (furthest_point_sampling, gather, ball_query,
group, three_nn, three_interpolate — see reference `bindings.cpp:6-19`) and
pytorch3d's `knn_points` / `knn_gather`.

Design notes (TPU-first):
  * All pairwise distances go through one matmul-based kernel so the MXU does
    the FLOPs: ``|x|^2 + |y|^2 - 2 x.y``.
  * kNN / ball-query are ``lax.top_k`` / sort over that distance matrix —
    static shapes, no data-dependent control flow, fully fusable by XLA.
  * FPS is the one inherently sequential op; it is a ``lax.fori_loop``
    carrying the running min-distance field ``[B, N]`` (resident in VMEM at
    reference sizes). A Pallas variant lives in ``ops/pallas_kernels.py``.
  * Gathers use ``jnp.take_along_axis`` whose transpose is a scatter-add —
    the exact semantics of the reference's hand-written ``*_grad`` CUDA
    kernels (`sampling_gpu.cu:33-57`, `group_points_gpu.cu`), so no custom
    VJPs are required for correctness; autodiff matches by construction.

Conventions: point clouds are ``[B, N, 3]`` (points-last-dim) unless a
function documents otherwise. Everything is batch-first and jit/vmap/pjit
friendly.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Input validation (trace-time; the CUDA lib's CHECK_CONTIGUOUS /
# CHECK_IS_FLOAT analogue, `_ext-src/include/utils.h:1-25`)
# ---------------------------------------------------------------------------

_VALIDATE = True


def set_validation(on: bool) -> None:
    """Toggle trace-time shape/dtype contract checks."""
    global _VALIDATE
    _VALIDATE = on


def _check_cloud(x, name: str, rank: int = 3) -> None:
    if not _VALIDATE:
        return
    if x.ndim != rank:
        raise ValueError(
            f"{name}: expected rank-{rank} [B, N, C], got {x.shape}")
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(f"{name}: expected float dtype, got {x.dtype}")


def _check_idx(idx, name: str) -> None:
    if not _VALIDATE:
        return
    if not jnp.issubdtype(idx.dtype, jnp.integer):
        raise TypeError(f"{name}: expected int dtype, got {idx.dtype}")


# ---------------------------------------------------------------------------
# Pairwise distances
# ---------------------------------------------------------------------------

def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance between every pair of points.

    Matches reference `model/pointnet2_utils.py:19-40` (and its 5 dupes).

    Args:
      src: ``[B, N, C]`` source points.
      dst: ``[B, M, C]`` target points.
    Returns:
      ``[B, N, M]`` squared distances.
    """
    _check_cloud(src, "square_distance:src")
    _check_cloud(dst, "square_distance:dst")
    # -2 x.y via MXU; the norms ride along as rank-1 broadcasts that XLA
    # fuses into the matmul epilogue. Precision HIGHEST is required: with
    # the TPU default (bf16 inputs) the absolute error (~1e-2 at unit
    # scale) exceeds ball-query radii and breaks self-distance==0, which
    # downstream index ops (ball query sentinel, kNN drop-self) rely on.
    inner = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       precision=lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)          # [B, N, 1]
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)          # [B, M, 1]
    return s2 - 2.0 * inner + jnp.swapaxes(d2, -1, -2)


def pairwise_distance(points: jnp.ndarray) -> jnp.ndarray:
    """Self squared-distance matrix ``[B, N, N]``."""
    return square_distance(points, points)


# ---------------------------------------------------------------------------
# Gather / indexing
# ---------------------------------------------------------------------------

def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched fancy-index: ``points[b, idx[b, ...], :]``.

    Matches reference `model/pointnet2_utils.py:43-60` and the CUDA
    `gather_points` (`sampling_gpu.cu:8-31`); its autodiff transpose is the
    scatter-add of `gather_points_grad` (`sampling_gpu.cu:33-57`).

    Args:
      points: ``[B, N, C]``.
      idx: integer ``[B, S]`` or ``[B, S, K]`` (any trailing index dims).
    Returns:
      ``[B, *idx.shape[1:], C]``.
    """
    _check_cloud(points, "index_points:points")
    _check_idx(idx, "index_points:idx")
    B, N, C = points.shape
    idx_flat = idx.reshape(B, -1)                             # [B, S*]
    if _pallas_active() and N >= 128 and idx_flat.shape[1] >= 512:
        # large gathers: custom VJP replaces the autodiff scatter-add
        # (pathological on TPU) with one-hot^T matmuls (5-20x faster
        # at attack shapes); bf16 forwards also ride the one-hot MXU
        # gather (XLA's dynamic-slice gather loop is VMEM-read-bound:
        # 2.6 ms vs 1.6 for PointConv's [16,16384,131] stage gather)
        out = _gather_rows_mxu(N, points, idx_flat)
    else:
        out = jnp.take_along_axis(points, idx_flat[..., None], axis=1)
    return out.reshape(*idx.shape, C)


def gather_group_nm(points: jnp.ndarray,
                    idx: jnp.ndarray) -> jnp.ndarray:
    """Grouped gather, NEIGHBORS-MAJOR: ``out[b, j, s, :] =
    points[b, idx[b, s, j], :]`` for idx ``[B, S, ns]`` ->
    ``[B, ns, S, C]``.

    The grouped TPU kernel keeps idx in its produced [B, S, ns] layout:
    `index_points`' flat [B, M, 1] int32 operand is tile-padded 128x in
    HBM (T(8,128) on a 1-wide minor dim — ~0.2 ms/iter of pad traffic
    per PN++ gather program, r4 HLO broadcast_in_dim.880) and the
    [B, M, C] -> [B, S, ns, C] output reshape re-tiles again. The
    neighbors-major output is what Mosaic can store per slot (leading-
    unit rank extension); consumers reduce over axis 1 instead of -2.
    Same bitwise contract as `index_points`' one-hot path; VJP is the
    grouped one-hot^T scatter-add."""
    _check_cloud(points, "gather_group_nm:points")
    _check_idx(idx, "gather_group_nm:idx")
    B, N, C = points.shape
    S, ns = idx.shape[1], idx.shape[2]
    # last clause: one sublane of rows must fit the grouped kernels'
    # ~6 MB scoped-VMEM block cap (pallas_kernels._group_tile raises
    # past it — fwd AND bwd scatter share this row width)
    if (_pallas_active() and N >= 128 and S * ns >= 2048 and ns <= 128
            and points.dtype in (jnp.bfloat16, jnp.float32)
            and 8 * ns * C * points.dtype.itemsize <= 6 * 2 ** 20):
        return _gather_group_mxu(N, points, idx)
    return jnp.transpose(index_points(points, idx), (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_group_mxu(n_points, points, idx):
    from hitadv_tpu.ops import pallas_kernels as PK

    return PK.gather_group_pallas(points, idx)


def _gather_group_fwd(n_points, points, idx):
    return _gather_group_mxu(n_points, points, idx), (idx,)


def _gather_group_bwd(n_points, res, g):
    (idx,) = res
    from hitadv_tpu.ops import pallas_kernels as PK

    return PK.scatter_add_group_pallas(idx, g, n_points), None


_gather_group_mxu.defvjp(_gather_group_fwd, _gather_group_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows_mxu(n_points, points, idx_flat):
    import os as _os

    wide = _os.environ.get("HITADV_GATHER_WIDE", "1") != "0"
    if (points.dtype in (jnp.bfloat16, jnp.float32) and _pallas_active()
            and (idx_flat.shape[1] >= 2048
                 or (wide and idx_flat.shape[1] >= 512
                     and points.shape[1] <= 4096))):
        # bitwise exact both ways: bf16 rides one native MXU pass (a
        # one-hot row selects a single value); f32 is decomposed into
        # three exact bf16 planes (hi|mid|lo) and reconstructed in the
        # f32 accumulator. XLA's dynamic-slice gather loop measured
        # 2.7 ms/iter for PointConv's [16,16384] f32 gathers alone.
        # Gate: XLA's serial gather costs ~constant per row (~9 ns
        # measured) regardless of N, while the one-hot kernel's cost
        # per row scales with N — so at SMALL N the kernel wins even
        # for mid-size M. The CW-Perturb chamfer backward's
        # [64,1024]-row f32 gather from a [64,1024,3] cloud was 580
        # us/iter as an XLA gather vs ~0.1 ms one-hot (r4 profile,
        # RESULTS.md "CW-Perturb floor attribution"). Crossover
        # spot-checked on hardware at the admitted boundary (r5,
        # scripts/gather_gate_boundary_probe.py,
        # .r5/gather_gate_boundary2.log, f32 C=3 B=64): kernel wins
        # at M=512/N=4096 (635 vs 849 us) and M=512/N=1024 (286 vs
        # 314); XLA wins just outside the gate at N=8192 (1235 vs
        # 523) — the N<=4096 cutoff stands as measured, not
        # extrapolated.
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.gather_rows_pallas(points, idx_flat)
    return jnp.take_along_axis(points, idx_flat[..., None], axis=1)


def _gather_rows_fwd(n_points, points, idx_flat):
    return _gather_rows_mxu(n_points, points, idx_flat), (idx_flat,)


def _gather_rows_bwd(n_points, res, g):
    (idx_flat,) = res
    from hitadv_tpu.ops import pallas_kernels as PK

    return PK.scatter_add_rows_pallas(idx_flat, g, n_points), None


_gather_rows_mxu.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _gmp_fwd_impl(y, idx):
    if _pallas_active() and y.shape[1] >= 128:
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.graph_max_pool_pallas(y, idx)
    nb = index_points(y, idx)                                # [B,N,k,C]
    return (jnp.max(nb, axis=2),
            jnp.argmax(nb, axis=2).astype(jnp.int32))


def graph_max_pool(y: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``mx[b, n, c] = max_j y[b, idx[b, n, j], c]`` — the EdgeConv
    neighbor reduction (`model/dgcnn_cls.py:16-43` max over the kNN
    ring), fused so the ``[B, N, k, C]`` neighbor tensor never exists.

    On TPU both directions run as Pallas one-hot matmuls generated in
    VMEM (dynamic row gathers do not lower in this Mosaic version; the
    XLA gather VJP would emit a pathological scatter-add). The custom
    VJP routes each (row, channel) gradient to the FIRST slot attaining
    the max — torch's max backward picks the same first-argmax; ties
    between exactly-equal neighbor features are measure-zero.
    """
    return _graph_max_pool(y.shape[1], y, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _graph_max_pool(n_points, y, idx):
    mx, _ = _gmp_fwd_impl(y, idx)
    return mx


def _gmp_vjp_fwd(n_points, y, idx):
    mx, amax = _gmp_fwd_impl(y, idx)
    return mx, (idx, amax)


def _gmp_vjp_bwd(n_points, res, g):
    idx, amax = res
    if _pallas_active() and g.shape[1] >= 128:
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.graph_max_pool_bwd_pallas(idx, amax, g, n_points), None
    B, N, C = g.shape
    rows = jnp.take_along_axis(idx, amax, axis=2)            # [B, N, C]
    b_iota = jnp.arange(B)[:, None, None]
    c_iota = jnp.arange(C)[None, None, :]
    gy = jnp.zeros((B, n_points, C), g.dtype).at[
        b_iota, rows, c_iota].add(g)
    return gy, None


_graph_max_pool.defvjp(_gmp_vjp_fwd, _gmp_vjp_bwd)


def knn_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features, pytorch3d `knn_gather` parity.

    Args:
      points: ``[B, N, C]``.
      idx: ``[B, S, K]`` neighbor indices.
    Returns:
      ``[B, S, K, C]``.
    """
    return index_points(points, idx)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------

class KNNResult(NamedTuple):
    """pytorch3d-compatible kNN result: squared dists + indices."""
    dists: jnp.ndarray  # [B, S, K] squared distances, ascending
    idx: jnp.ndarray    # [B, S, K] int32


# Geometry backend: "auto" picks the fused Pallas kernels on TPU and the
# pure-XLA reference path elsewhere. `set_backend` overrides globally.
_BACKEND = "auto"


def set_backend(name: str) -> None:
    """Select "auto" | "xla" | "pallas" for the hot geometry ops."""
    global _BACKEND
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(name)
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _pallas_active() -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _knn_xla(query: jnp.ndarray, points: jnp.ndarray, k: int) -> KNNResult:
    d = square_distance(query, points)                        # [B, S, N]
    neg, idx = lax.top_k(-d, k)                               # ascending dist
    return KNNResult(dists=-neg, idx=idx.astype(jnp.int32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _knn_pallas_diff(query, points, k):
    from hitadv_tpu.ops import pallas_kernels as PK

    return PK.knn_pallas(query, points, k)


def _knn_pallas_fwd(query, points, k):
    dists, idx = _knn_pallas_diff(query, points, k)
    return (dists, idx), (query, points, idx)


def _knn_pallas_bwd(k, res, grads):
    """VJP of sq dists: d_i = |q - p_{idx_i}|^2 (idx non-differentiable,
    matching the selection semantics of the XLA top_k path)."""
    query, points, idx = res
    g_d, _ = grads                                            # [B, S, K]
    qf = query.astype(jnp.float32)
    pf = points.astype(jnp.float32)
    neighbors = index_points(pf, idx)                         # [B, S, K, 3]
    diff = qf[:, :, None, :] - neighbors                      # [B, S, K, 3]
    gq = jnp.sum(2.0 * g_d[..., None] * diff, axis=2)         # [B, S, 3]
    contrib = (-2.0 * g_d[..., None] * diff)                  # [B, S, K, 3]
    B, N, C = points.shape
    flat_idx = idx.reshape(B, -1)
    if _pallas_active() and N >= 128 and flat_idx.shape[1] >= 512:
        # XLA scatter-add is pathological on TPU; one-hot^T matmuls
        # accumulated in VMEM (same kernel as the gather VJP)
        from hitadv_tpu.ops import pallas_kernels as PK

        gp = PK.scatter_add_rows_pallas(flat_idx,
                                        contrib.reshape(B, -1, C), N)
    else:
        gp = jnp.zeros((B, N, C), jnp.float32)
        gp = jax.vmap(lambda g, i, c: g.at[i].add(c))(
            gp, flat_idx, contrib.reshape(B, -1, C))
    return gq.astype(query.dtype), gp.astype(points.dtype)


_knn_pallas_diff.defvjp(_knn_pallas_fwd, _knn_pallas_bwd)


def knn_points(query: jnp.ndarray, points: jnp.ndarray, k: int) -> KNNResult:
    """k nearest neighbors of each query point, pytorch3d parity.

    Sorted ascending by squared distance (pytorch3d returns squared
    dists). On TPU this dispatches to the fused Pallas kernel
    (`ops/pallas_kernels.py`) with a custom VJP; neighbor order for
    exactly-tied distances may differ from the XLA sort path (harmless:
    downstream consumers are order-invariant reductions).
    """
    if _pallas_active() and k <= points.shape[1]:
        dists, idx = _knn_pallas_diff(query, points, k)
        return KNNResult(dists=dists, idx=idx)
    return _knn_xla(query, points, k)


def knn_idx(query: jnp.ndarray, points: jnp.ndarray,
            k: int) -> jnp.ndarray:
    """Neighbor INDICES only — for graph rings and grouping gathers.

    Equivalent to ``knn_points(...).idx`` under stop_gradient (torch's
    topk indices carry no gradient either). On TPU it dispatches to the
    fused Pallas kernel; the packed single-reduction variant (dist|idx
    packed int32s, ~2x fewer [TQ, N] sweeps per neighbor) is used only
    where its ceil(log2(N))-bit mantissa truncation is provably
    immaterial:
      - geometry space (C <= 4): truncation is ~2^-14 relative on
        squared distances — measured 100% neighbor-set agreement with
        the exact kernel on random clouds;
      - bf16 features: the 2^-14 relative truncation sits far below
        the 2^-8 bf16 feature noise.
    f32 FEATURE space (DGCNN parity mode) takes the exact kernel:
    packed there swapped near-tied neighbors on ~2.5% of grad entries
    (measured through a full DGCNN grad on TPU), while the exact
    kernel reproduces the XLA backend's gradients bitwise.
    """
    query = lax.stop_gradient(query)
    points = lax.stop_gradient(points)
    if _pallas_active() and k <= points.shape[1]:
        from hitadv_tpu.ops import pallas_kernels as PK

        packed = (query.shape[-1] <= 4
                  or (query.dtype == jnp.bfloat16
                      and points.dtype == jnp.bfloat16))
        _, idx = PK.knn_pallas(query, points, k, packed=packed)
        return idx
    return _knn_xla(query, points, k).idx


def knn_indices(points: jnp.ndarray, k: int,
                exclude_self: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-kNN used by DGCNN / KNNDist / Laplacian.

    Matches `util/dist_utils.py:217-229` (k+1 then drop-self convention).

    Args:
      points: ``[B, N, C]``.
      k: neighbors (excluding self when ``exclude_self``).
    Returns:
      (sq_dists ``[B, N, k]``, idx ``[B, N, k]``).
    """
    kk = k + 1 if exclude_self else k
    res = knn_points(points, points, kk)
    if exclude_self:
        return res.dists[..., 1:], res.idx[..., 1:]
    return res.dists, res.idx


# ---------------------------------------------------------------------------
# Farthest point sampling
# ---------------------------------------------------------------------------

def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          key: Optional[jax.Array] = None,
                          start_idx: Optional[int] = 0) -> jnp.ndarray:
    """Greedy max-min farthest point sampling.

    Matches reference `model/pointnet2_utils.py:63-84` (random start when a
    PRNG ``key`` is given — the attack-path convention) and the CUDA kernel
    `sampling_gpu.cu:86` / `util/pointconv_util.py:64-87` (start at index 0 —
    the model-path convention) when ``start_idx=0``.

    The loop carries only the ``[B, N]`` min-distance field; each step is one
    broadcast-subtract + reduce, which XLA keeps resident on-chip.

    Args:
      xyz: ``[B, N, 3]``.
      npoint: number of samples (static).
      key: optional PRNG key → random start index per batch element.
      start_idx: fixed start index when ``key`` is None.
    Returns:
      ``[B, npoint]`` int32 indices.
    """
    _check_cloud(xyz, "farthest_point_sample:xyz")
    # The Pallas kernel's in-kernel argmax fails Mosaic lowering when
    # the lane-padded width is a single 128-lane tile (probed on TPU:
    # every N <= 128 fails with an unrealized f32->i32 vector cast,
    # N >= 129 compiles) — fall back to the XLA loop for small clouds,
    # where the kernel has no advantage anyway.
    if _pallas_active() and xyz.shape[-1] == 3 and xyz.shape[1] > 128:
        return _fps_pallas_nondiff(xyz, npoint, key, start_idx or 0)
    B, N, _ = xyz.shape
    if key is not None:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        farthest0 = jnp.full((B,), start_idx or 0, dtype=jnp.int32)

    def body(i, carry):
        distance, farthest, centroids = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1)             # [B, 1, 3]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)        # [B, N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, centroids

    init = (jnp.full((B, N), 1e10, dtype=xyz.dtype),
            farthest0,
            jnp.zeros((B, npoint), dtype=jnp.int32))
    _, _, centroids = lax.fori_loop(0, npoint, body, init)
    return centroids


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 3))
def _fps_pallas_nondiff(xyz, npoint, key, start_idx):
    """Pallas FPS with a zero-tangent JVP: index selection is
    non-differentiable (the XLA fori_loop path gets this for free;
    pallas_call needs the rule spelled out because FPS runs inside
    differentiated model forwards, e.g. PointNet++ under attack)."""
    from hitadv_tpu.ops import pallas_kernels as PK

    return PK.fps_pallas(xyz, npoint, key=key, start_idx=start_idx)


@_fps_pallas_nondiff.defjvp
def _fps_pallas_jvp(npoint, start_idx, primals, tangents):
    out = _fps_pallas_nondiff(primals[0], npoint, primals[1], start_idx)
    return out, jnp.zeros(out.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# Ball query
# ---------------------------------------------------------------------------

def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Indices of up to ``nsample`` points within ``radius`` of each center.

    Bit-exact with the reference pad-with-first semantics
    (`model/pointnet2_utils.py:87-107`): out-of-ball slots are filled with
    the first in-ball index (ascending index order, the sort-and-fill trick).

    Args:
      radius: ball radius.
      nsample: group size (static).
      xyz: ``[B, N, 3]`` all points.
      new_xyz: ``[B, S, 3]`` query centers.
    Returns:
      ``[B, S, nsample]`` int32 indices.
    """
    _check_cloud(xyz, "query_ball_point:xyz")
    _check_cloud(new_xyz, "query_ball_point:new_xyz")
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if _pallas_active():
        # masked min-extraction kernel: same first-nsample-by-index
        # semantics, no [B, S, N] sort (the sort was 1.44 ms/iter of
        # PointNet++'s 7.4 under attack, plus ~0.5 ms of layout
        # copies and the materialized iota around it). Indices carry
        # no gradient — stop_gradient cuts the pallas_call out of the
        # autodiff graph (it has no JVP rule; same treatment as the
        # kNN index dispatch).
        from hitadv_tpu.ops import pallas_kernels as PK
        return PK.ball_query_pallas(radius, nsample,
                                    lax.stop_gradient(xyz),
                                    lax.stop_gradient(new_xyz))
    sqrdists = square_distance(new_xyz, xyz)                  # [B, S, N]
    arange = lax.broadcasted_iota(jnp.int32, (B, S, N), 2)
    group_idx = jnp.where(sqrdists > radius ** 2, N, arange)
    # ascending sort puts in-ball (small) indices first, sentinel N last
    group_idx = jnp.sort(group_idx, axis=-1)[:, :, :nsample]
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # Empty ball (first itself is the sentinel) is out-of-contract — the
    # reference would index OOB. Clamp so TPU gathers stay defined.
    return jnp.minimum(group_idx, N - 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# sample_and_group (PointNet++ / PCT front-ends)
# ---------------------------------------------------------------------------

def sample_and_group(npoint: int, radius: float, nsample: int,
                     xyz: jnp.ndarray, points: Optional[jnp.ndarray],
                     key: Optional[jax.Array] = None,
                     return_fps: bool = False, concat: bool = True):
    """FPS → ball query → gather → center-subtract → concat features.

    Matches reference `model/pointnet2_utils.py:110-138`.

    Args:
      xyz: ``[B, N, 3]``.
      points: optional ``[B, N, D]`` features.
      concat: with ``False`` the feature concat is left to the consumer
        — returns ``(grouped_xyz_norm, grouped_points)`` as a tuple for
        `F.linear_parts`, skipping the [B, S, ns, 3+D] materialization
        (and its TPU layout copies / ragged channel tiling).
    Returns:
      (new_xyz ``[B, npoint, 3]``, new_points ``[B, npoint, nsample, 3+D]``)
      plus (grouped_xyz, fps_idx) when ``return_fps``.
    """
    B, N, C = xyz.shape
    with jax.named_scope("sag_fps"):
        fps_idx = farthest_point_sample(xyz, npoint, key=key)
        new_xyz = index_points(xyz, fps_idx)                  # [B, S, 3]
    with jax.named_scope("sag_ballq"):
        idx = query_ball_point(radius, nsample, xyz, new_xyz)
    with jax.named_scope("sag_gather_xyz"):
        grouped_xyz = index_points(xyz, idx)                  # [B, S, ns, 3]
        grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        with jax.named_scope("sag_gather_feat"):
            grouped_points = index_points(points, idx)
            if concat:
                new_points = jnp.concatenate([grouped_xyz_norm,
                                              grouped_points], axis=-1)
            else:
                new_points = (grouped_xyz_norm, grouped_points)
    else:
        new_points = grouped_xyz_norm
    if return_fps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(xyz: jnp.ndarray,
                         points: Optional[jnp.ndarray],
                         concat: bool = True):
    """Single global group. Matches `model/pointnet2_utils.py:142-159`.

    ``concat=False`` returns the (xyz, points) parts as a tuple for
    `F.linear_parts` instead of materializing the channel concat.
    """
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]                          # [B, 1, N, 3]
    if points is not None:
        if concat:
            new_points = jnp.concatenate(
                [grouped_xyz, points[:, None, :, :]], axis=-1)
        else:
            new_points = (grouped_xyz, points[:, None, :, :])
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def knn_point(nsample: int, xyz: jnp.ndarray,
              new_xyz: jnp.ndarray) -> jnp.ndarray:
    """kNN group indices (PCT variant). Matches `model/pct_utils.py:98-109`.

    Indices only — stop_gradient cuts the kNN out of the autodiff
    graph (torch.topk idx has no gradient either). Without it, the
    dists output's zero cotangent still executes the kNN custom VJP:
    measured 25 ms/iter of pure waste in the DGCNN backward before the
    same fix there. Dispatches to the packed index-only kernel on TPU
    (see knn_idx).
    """
    return knn_idx(new_xyz, xyz, nsample)


def sample_and_group_knn(npoint: int, nsample: int, xyz: jnp.ndarray,
                         points: jnp.ndarray,
                         key: Optional[jax.Array] = None,
                         concat: bool = True):
    """PCT's sample_and_group: kNN groups + feature-delta concat.

    Matches reference `model/pct_utils.py:111-141`: new features are
    ``concat([grouped_points - center_points, center_points (tiled)])``.

    ``concat=False`` returns ``(grouped_norm, center [B, S, 1, D])``
    for `F.linear_parts` — the center part stays singleton (it
    broadcasts in the matmul sum), so the tile materialization AND its
    ns× redundant matmul rows both disappear.
    """
    B, N, C = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, key=key)
    new_xyz = index_points(xyz, fps_idx)                      # [B, S, 3]
    new_points = index_points(points, fps_idx)                # [B, S, D]
    idx = knn_point(nsample, xyz, new_xyz)                    # [B, S, ns]
    grouped_points = index_points(points, idx)                # [B, S, ns, D]
    grouped_norm = grouped_points - new_points[:, :, None, :]
    if not concat:
        return new_xyz, (grouped_norm, new_points[:, :, None, :])
    tiled = jnp.broadcast_to(new_points[:, :, None, :],
                             grouped_norm.shape)
    return new_xyz, jnp.concatenate([grouped_norm, tiled], axis=-1)


# ---------------------------------------------------------------------------
# three_nn / three_interpolate (PointNet++ feature propagation)
# ---------------------------------------------------------------------------

def three_nn(unknown: jnp.ndarray,
             known: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest known points for each unknown point.

    Matches CUDA `interpolate_gpu.cu:10-42`; returns *euclidean* (not
    squared) distances like the CUDA kernel does.

    Args:
      unknown: ``[B, N, 3]``.
      known: ``[B, M, 3]``.
    Returns:
      (dists ``[B, N, 3]``, idx ``[B, N, 3]``).
    """
    res = knn_points(unknown, known, 3)
    return jnp.sqrt(jnp.maximum(res.dists, 0.0)), res.idx


def three_interpolate(points: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-neighbor feature interpolation.

    Matches CUDA `interpolate_gpu.cu:44-154`; gradient via autodiff (the
    transpose is exactly `three_interpolate_grad`'s scatter-add).

    Args:
      points: ``[B, M, C]`` known features.
      idx: ``[B, N, 3]``.
      weight: ``[B, N, 3]``.
    Returns:
      ``[B, N, C]``.
    """
    gathered = index_points(points, idx)                      # [B, N, 3, C]
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolate_weights(dists: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights used by FeaturePropagation.

    Matches `model/pointnet2_utils.py:296-299` (reciprocal of *squared*
    distance there; pass squared dists for exact parity).
    """
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Grouping (pointnet2_ops `group_points` parity)
# ---------------------------------------------------------------------------

def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Channels-last grouping: ``[B, N, C], [B, S, ns] -> [B, S, ns, C]``.

    The channels-first CUDA `group_points` (`group_points_gpu.cu`) composed
    with its grad is exactly this gather + scatter-add transpose.
    """
    return index_points(points, idx)


# ---------------------------------------------------------------------------
# Gaussian-kernel blend (HiT-ADV deformation field)
# ---------------------------------------------------------------------------

def neg_gaussian_field(central: jnp.ndarray, ori: jnp.ndarray
                       ) -> jnp.ndarray:
    """``-|ori_n - central_j|`` → [B, Cn, N]: the *cloud-only* part of
    `gaussian_blend`'s kernel argument.

    In HiT-ADV both clouds are fixed for the whole attack (only
    ``delta``/``pert`` are optimized, `ShapeAttack/HiT_ADV.py:130-137`),
    so this field is loop-invariant across the inner Adam scan. XLA's
    LICM does not hoist it out of the scanned while-loop (profiled on
    v5e: the [B,Cn,N,3] diff/square/reduce/sqrt ran every iteration);
    callers precompute it here and pass it via ``gaussian_blend``'s
    ``negd=`` argument. Bitwise-identical: the blend computes
    ``exp(-d / (2 delta^2))`` and IEEE negation is exact, so
    ``exp(negd / (2 delta^2))`` produces the same bits.
    """
    diff = ori[:, None, :, :] - central[:, :, None, :]        # [B,Cn,N,3]
    return -jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-24)   # [B, Cn, N]


def gaussian_blend(central: jnp.ndarray, ori: jnp.ndarray,
                   delta: jnp.ndarray, pert: jnp.ndarray,
                   negd: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian-kernel deformation blend (HiT-ADV deformation field).

    ``num[b,n,:] = sum_j pert[b,j,:] * ker[b,j,n]``,
    ``deno[b,n] = sum_j ker[b,j,n]`` with
    ``ker = exp(-|ori_n - central_j| / (2 delta_j^2))`` — the
    kernel_density (`ShapeAttack/HiT_ADV.py:298-304`, euclidean norm
    NOT squared in the exponent) + blend loop (`:168-175`) pair. The
    deformed cloud is ``ori + num / deno[..., None]``.

    The distance uses the direct broadcast-subtract form, NOT the
    matmul square_distance: central points coincide with cloud points,
    and the |a|^2+|b|^2-2ab form loses ~5e-5 absolute near d=0 to
    cancellation, which exp(-d/2d^2) amplifies ~50x at delta=0.1
    (measured 2.6e-3 kernel error vs torch).

    This is deliberately the plain XLA program (autodiff saves
    ker/d as residuals). Measured at the flagship shape (B=64, Cn=192,
    N=1024, v5e): XLA fwd+bwd(pert, delta) 0.62 ms — the same as the
    forward alone, because the [B, Cn, N] residual traffic is only
    ~0.12 ms while recomputing the exp field costs ~0.6 ms. A fused
    recompute-backward Pallas pair (`gaussian_blend_fused`) measured
    1.25-1.9 ms: flash-style recompute LOSES when the field is
    exp-compute-bound rather than memory-bound. Use the fused variant
    only when B*Cn*N is too large to materialize in HBM.

    ``negd``: optional precomputed `neg_gaussian_field(central, ori)`.
    Pass it when the clouds are loop-invariant (the HiT-ADV scan) so the
    distance field is built once instead of per iteration.
    """
    if negd is None:
        negd = neg_gaussian_field(central, ori)               # [B, Cn, N]
    return _blend_from_negd(negd, delta, pert)


def _blend_from_negd(negd: jnp.ndarray, delta: jnp.ndarray,
                     pert: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The exp + einsum tail of `gaussian_blend` (negd is [B, Cn, N])."""
    ker = jnp.exp(negd / (2.0 * delta * delta)[..., None])
    # HIGHEST, not DEFAULT: on TPU the MXU's DEFAULT rounds the f32
    # pert/ker operands to bf16 (~2^-9 relative) while deno stays an
    # exact f32 sum, so num/deno would stop being a consistent convex
    # blend — the same ~2e-3 error class the broadcast-subtract
    # distance above was chosen to avoid. The contraction is tiny
    # (B*N*3*Cn ~ 75 MFLOP at the flagship shape) next to the 0.6 ms
    # exp field, so the 6-pass cost is noise.
    # deno rides the SAME contraction as num via a ones column (r5,
    # .r5/profile_flagship_r5.log: the separate jnp.sum pass over the
    # [B, Cn, N] ker field was 19.6% of the flagship iteration with
    # its fwd+bwd re-reads; one einsum = one pass over ker each way).
    # deno's accumulation order changes from a plain f32 sum to the
    # HIGHEST dot's plane-decomposed sum — reassociation-level drift,
    # same class as linear_bn's fold.
    pert1 = jnp.concatenate(
        [pert, jnp.ones_like(pert[..., :1])], axis=-1)        # [B,Cn,4]
    nd = jnp.einsum("bjc,bjn->bnc", pert1, ker,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)       # [B, N, 4]
    return nd[..., :3], nd[..., 3]


_gaussian_blend_xla = gaussian_blend                          # oracle alias


# -- blend-from-hoisted-field kernel policy ---------------------------------
#
# The HiT-ADV scan precomputes the loop-invariant distance field once
# (attacks/hit_adv.py:186) and only pays exp + two small contractions
# per iteration. The Pallas pair below was built to pin that region's
# schedule against the B=256 program-level fusion regression (RESULTS.md
# "Batch scaling") — and REJECTED with numbers on v5e; see
# `blend_negdt_active` for the measurement. It stays available behind
# ``set_blend_impl("pallas")`` / env HITADV_BLEND_IMPL.

_BLEND_IMPL = "auto"


def set_blend_impl(mode: str) -> None:
    """Select the HiT-ADV blend lowering for the hoisted-field path:
    ``"xla"`` (stock program), ``"pallas"`` (the kernel pair),
    ``"auto"`` (currently identical to ``"xla"`` — the kernel pair
    measured slower at every batch, see `blend_negdt_active`)."""
    global _BLEND_IMPL
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError(f"blend impl must be auto|xla|pallas, got {mode!r}")
    _BLEND_IMPL = mode


def blend_negdt_active(batch: int) -> bool:
    """True when the HiT-ADV scan should feed the hoisted field to the
    Pallas blend pair instead of the stock XLA program.

    REJECTED as a default on v5e (round 5, .r5/blend_negdt_probe.log):
    the schedule-pinning hypothesis for the B=256 in-program blend
    fusion regression did not survive hardware — the kernel pair's
    recompute-backward pays the exp field twice where XLA's autodiff
    reads the saved ker residual (standalone fwd+bwd(p,d) at B=256:
    4.72 ms vs XLA 1.37; full attack 23.6 vs 43.3 ex/s). ``auto``
    therefore never takes it; ``"pallas"`` remains for explicit use
    and as the hardware-verified oracle of the variant.
    """
    del batch
    if _BLEND_IMPL != "pallas":
        return False
    return _BACKEND != "xla"


# typo'd HITADV_BLEND_IMPL must fail loudly, not silently measure the
# default (same contract as HITADV_EXTRACT_LAYOUT).
set_blend_impl(os.environ.get("HITADV_BLEND_IMPL", "auto"))


def _gaussian_blend_negdt_xla(negdt, delta, pert):
    """Oracle for `gaussian_blend_negdt`: bitwise the stock
    `gaussian_blend(negd=...)` program (IEEE-identical exp input per
    element; same einsum contraction)."""
    return _blend_from_negd(jnp.swapaxes(negdt, 1, 2), delta, pert)


@jax.custom_vjp
def gaussian_blend_negdt(negdt: jnp.ndarray, delta: jnp.ndarray,
                         pert: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`gaussian_blend` from the PRE-TRANSPOSED hoisted field
    ``negdt = swapaxes(neg_gaussian_field(central, ori), 1, 2)``
    ([B, N, Cn] — cloud points ride sublanes in the kernel, the same
    orientation `_gblend_fwd_kernel` uses).

    On TPU this runs as a Pallas pair whose fusion/layout schedule is
    independent of the surrounding program — built against the B=256
    blend-region fusion regression (RESULTS.md "Batch scaling") and
    REJECTED as a default on hardware (see `blend_negdt_active`): the
    recompute-backward pays the exp field twice where XLA reads the
    saved ker residual. Kept behind ``set_blend_impl("pallas")``.
    Backward recomputes ker from negdt (one exp) and pushes cotangents
    to (delta, pert); the negdt cotangent is a plain XLA expression
    that DCEs away inside the attack (negdt is loop-invariant there).
    Off-TPU: the stock XLA program.
    """
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.gaussian_blend_negdt_pallas(negdt, delta, pert)
    return _gaussian_blend_negdt_xla(negdt, delta, pert)


def _gaussian_blend_negdt_fwd(negdt, delta, pert):
    return (gaussian_blend_negdt(negdt, delta, pert),
            (negdt, delta, pert))


def _gaussian_blend_negdt_bwd(res, g):
    negdt, delta, pert = res
    g_num, g_deno = g
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        g_delta, g_pert = PK.gaussian_blend_negdt_bwd_pallas(
            negdt, delta, pert, g_num, g_deno)
        # General-case negdt cotangent (NOT taken inside the attack,
        # where negdt is a scan invariant — jaxpr/XLA DCE drops it).
        inv2d2 = (1.0 / (2.0 * delta * delta))[:, None, :]    # [B,1,Cn]
        ker = jnp.exp(negdt * inv2d2)
        gker = jnp.einsum("bnc,bjc->bnj", g_num, pert,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32) \
            + g_deno[..., None]
        g_negdt = gker * ker * inv2d2
        return g_negdt, g_delta, g_pert
    _, vjp = jax.vjp(_gaussian_blend_negdt_xla, negdt, delta, pert)
    return vjp((g_num, g_deno))


gaussian_blend_negdt.defvjp(_gaussian_blend_negdt_fwd,
                            _gaussian_blend_negdt_bwd)


@jax.custom_vjp
def gaussian_blend_fused(central: jnp.ndarray, ori: jnp.ndarray,
                         delta: jnp.ndarray, pert: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-lean `gaussian_blend`: Pallas kernels compute ker
    tile-by-tile in VMEM and never materialize the [B, Cn, N] kernel
    matrix in HBM (the backward recomputes tiles, flash-style).

    ~2x slower than `gaussian_blend` at the flagship shape (the exp
    field is compute-bound, see there) — reach for this only when the
    [B, Cn, N] residuals do not fit in HBM (large-N/batch sweeps).
    Off-TPU it falls back to the XLA program with recompute-backward.
    """
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.gaussian_blend_pallas(central, ori, delta, pert)
    return gaussian_blend(central, ori, delta, pert)


def _gaussian_blend_fused_fwd(central, ori, delta, pert):
    return (gaussian_blend_fused(central, ori, delta, pert),
            (central, ori, delta, pert))


def _gaussian_blend_fused_bwd(res, g):
    central, ori, delta, pert = res
    g_num, g_deno = g
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.gaussian_blend_bwd_pallas(central, ori, delta, pert,
                                            g_num, g_deno)
    _, vjp = jax.vjp(gaussian_blend, central, ori, delta, pert)
    return vjp((g_num, g_deno))


gaussian_blend_fused.defvjp(_gaussian_blend_fused_fwd,
                            _gaussian_blend_fused_bwd)


# ---------------------------------------------------------------------------
# KDE density (PointConv)
# ---------------------------------------------------------------------------

def _kde_density_xla(xyz, bandwidth):
    sq = pairwise_distance(xyz)                               # [B, N, N]
    gauss = (jnp.exp(-sq / (2.0 * bandwidth * bandwidth))
             / (2.5 * bandwidth))
    return jnp.mean(gauss, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def kde_density(xyz: jnp.ndarray, bandwidth: float) -> jnp.ndarray:
    """Gaussian KDE density, PointConv parity
    (`util/pointconv_util.py:209-219`): ``mean_j exp(-|x_i - x_j|^2 /
    (2 bw^2)) / (2.5 bw)`` over the full cloud.

    PointConv recomputes this every attack iteration (the cloud moves),
    making it the hottest op of that victim. On TPU both directions run
    as Pallas kernels that never materialize the [B, N, N] Gaussian in
    HBM (the backward recomputes tiles and uses W's symmetry); off-TPU
    it is the plain XLA program with autodiff-equivalent gradients.
    """
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        return PK.kde_density_pallas(xyz, bandwidth)
    return _kde_density_xla(xyz, bandwidth)


def _kde_density_fwd(xyz, bandwidth):
    return kde_density(xyz, bandwidth), xyz


def _kde_density_bwd(bandwidth, xyz, g):
    if _pallas_active():
        from hitadv_tpu.ops import pallas_kernels as PK

        return (PK.kde_density_bwd_pallas(xyz, bandwidth, g),)
    _, vjp = jax.vjp(lambda x: _kde_density_xla(x, bandwidth), xyz)
    return vjp(g)


kde_density.defvjp(_kde_density_fwd, _kde_density_bwd)


# ---------------------------------------------------------------------------
# Misc small helpers shared across attack math
# ---------------------------------------------------------------------------

def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """Torch `F.normalize` parity: x / max(|x|_2, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def median_points(pc: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Per-cloud coordinate-wise median (torch.median parity: lower median).

    torch.median returns the lower of the two middle elements for even N,
    while jnp.median averages them — we reproduce torch here because the
    HiT-ADV saliency center depends on it (`ShapeAttack/HiT_ADV.py:64`).
    """
    n = pc.shape[axis]
    sorted_pc = jnp.sort(pc, axis=axis)
    return jnp.take(sorted_pc, (n - 1) // 2, axis=axis)
