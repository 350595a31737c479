"""Distance / imperceptibility losses between point clouds.

Parity surface: reference `util/set_distance.py` (chamfer/hausdorff on the
full pairwise matrix) and `util/dist_utils.py` (the 12 distance modules).

Conventions: clouds are ``[B, N, 3]`` channels-last; all losses return
per-example ``[B]`` vectors (callers apply CW weights and/or mean —
mirroring the reference's ``weights``/``batch_avg`` arguments). Everything
is pure and jit-safe: the reference's ``.detach()`` thresholds become
``lax.stop_gradient``.

At the reference size (N=1024) the full ``[B, N, N]`` pairwise matrix is
materialized — one MXU matmul — which is both parity-exact and fast. The
tiled Pallas variants for larger N live in `ops/pallas_kernels.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.ops import geometry as G


# ---------------------------------------------------------------------------
# Simple norms
# ---------------------------------------------------------------------------

def l2_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray) -> jnp.ndarray:
    """Global L2 between clouds. Parity: `util/dist_utils.py:15-41`."""
    return jnp.sqrt(jnp.sum((adv_pc - ori_pc) ** 2, axis=(1, 2)) + 1e-7)


# ---------------------------------------------------------------------------
# Set distances (Chamfer / Hausdorff)
# ---------------------------------------------------------------------------

def _directed_mins(adv_pc: jnp.ndarray,
                   ori_pc: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min squared distance each direction.

    Parity: `util/set_distance.py:15-50` (batch_pairwise_dist + two
    mins). Implemented as two 1-NN queries so the TPU path uses the
    fused Pallas kernel — the ``[B, N, N]`` matrix never touches HBM
    (4.3 GB per call at B=256/N=1024 otherwise); the XLA fallback
    computes the same dense-matrix mins. Returns
    (adv→ori mins ``[B, Na]``, ori→adv mins ``[B, No]``).
    """
    a2o = G.knn_points(adv_pc, ori_pc, 1).dists[..., 0]       # [B, Na]
    o2a = G.knn_points(ori_pc, adv_pc, 1).dists[..., 0]       # [B, No]
    return a2o, o2a


def _set_reduce(adv_pc, ori_pc, method, reduce_fn):
    if method == "adv2ori":
        return reduce_fn(
            G.knn_points(adv_pc, ori_pc, 1).dists[..., 0], axis=1)
    if method == "ori2adv":
        return reduce_fn(
            G.knn_points(ori_pc, adv_pc, 1).dists[..., 0], axis=1)
    if method == "both":
        a2o, o2a = _directed_mins(adv_pc, ori_pc)
        return (reduce_fn(a2o, axis=1) + reduce_fn(o2a, axis=1)) / 2.0
    raise ValueError(method)


def chamfer_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                 method: str = "adv2ori") -> jnp.ndarray:
    """Chamfer distance. Parity: `util/dist_utils.py:44-80`."""
    return _set_reduce(adv_pc, ori_pc, method, jnp.mean)


def hausdorff_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                   method: str = "adv2ori") -> jnp.ndarray:
    """Hausdorff distance. Parity: `util/dist_utils.py:83-119`."""
    return _set_reduce(adv_pc, ori_pc, method, jnp.max)


# ---------------------------------------------------------------------------
# kNN outlier penalty (AAAI'20)
# ---------------------------------------------------------------------------

def knn_dist(pc: jnp.ndarray, k: int = 5,
             alpha: float = 1.05) -> jnp.ndarray:
    """Mean-kNN distance penalty on outlier points.

    Parity: `util/dist_utils.py:122-175`, including the squared-distance
    convention, the k+1-then-drop-self trick, the unbiased std, and the
    stop-gradient threshold mask.
    """
    dists, _ = G.knn_indices(pc, k)                           # [B, N, k] sq
    value = jnp.mean(dists, axis=-1)                          # [B, N]
    mean = jnp.mean(value, axis=-1, keepdims=True)
    std = jnp.std(value, axis=-1, keepdims=True, ddof=1)
    threshold = mean + alpha * std
    mask = lax.stop_gradient((value > threshold).astype(pc.dtype))
    return jnp.mean(value * mask, axis=1)


def chamfer_knn_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                     chamfer_method: str = "adv2ori",
                     knn_k: int = 5, knn_alpha: float = 1.05,
                     chamfer_weight: float = 5.0,
                     knn_weight: float = 3.0) -> jnp.ndarray:
    """Geometry-aware AAAI'20 combo. Parity: `util/dist_utils.py:258-294`."""
    cd = chamfer_dist(adv_pc, ori_pc, method=chamfer_method)
    kd = knn_dist(adv_pc, k=knn_k, alpha=knn_alpha)
    return cd * chamfer_weight + kd * knn_weight


# ---------------------------------------------------------------------------
# Laplacian smoothness
# ---------------------------------------------------------------------------

def laplacian_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                   nearest_indices: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared perturbation norms over each point's kNN ring.

    Parity: `util/dist_utils.py:178-229` (note the reference sums the
    *neighbors'* perturbation norms without subtracting the center — we
    reproduce the code, not its comment).

    Args:
      nearest_indices: ``[B, N, k]`` (from `knn_indices` on the clean pc).
    """
    delta = adv_pc - ori_pc                                   # [B, N, 3]
    neigh = G.index_points(delta, nearest_indices)            # [B, N, k, 3]
    return jnp.sum(neigh ** 2, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# Add-attack distances
# ---------------------------------------------------------------------------

def farthest_dist(adv_clusters: jnp.ndarray) -> jnp.ndarray:
    """Max intra-cluster pairwise distance, summed over clusters.

    Parity: `util/dist_utils.py:297-325`. ``adv_clusters`` is
    ``[B, num_add, cl_num_p, 3]``.
    """
    delta = (adv_clusters[:, :, None, :, :]
             - adv_clusters[:, :, :, None, :] + 1e-7)
    norm = jnp.linalg.norm(delta, axis=-1)                    # [B,na,np,np]
    far = jnp.max(jnp.max(norm, axis=2), axis=2)              # [B, na]
    return jnp.sum(far, axis=1)


def far_chamfer_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                     num_add: int,
                     chamfer_method: str = "adv2ori",
                     chamfer_weight: float = 0.1) -> jnp.ndarray:
    """Cluster compactness + proximity. Parity: `util/dist_utils.py:328-365`.

    ``adv_pc`` is the added points only, ``[B, num_add*cl_num_p, 3]``.
    """
    B = adv_pc.shape[0]
    cd = chamfer_dist(adv_pc, ori_pc, method=chamfer_method)
    clusters = adv_pc.reshape(B, num_add, -1, 3)
    return farthest_dist(clusters) + cd * chamfer_weight


def l2_chamfer_dist(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                    adv_obj: jnp.ndarray, ori_obj: jnp.ndarray,
                    chamfer_method: str = "adv2ori",
                    chamfer_weight: float = 0.2) -> jnp.ndarray:
    """Object-attack distance. Parity: `util/dist_utils.py:368-409`."""
    B = adv_pc.shape[0]
    cd = chamfer_dist(adv_pc, ori_pc, method=chamfer_method)
    l2 = l2_dist(adv_obj.reshape(B, -1, 3), ori_obj.reshape(B, -1, 3))
    return l2 + chamfer_weight * cd


# ---------------------------------------------------------------------------
# Curvature family
# ---------------------------------------------------------------------------

def get_kappa(pc: jnp.ndarray, normal: jnp.ndarray,
              k: int = 2) -> jnp.ndarray:
    """Per-point curvature proxy: mean |<unit(q-p), n_p>| over kNN.

    Parity: `FGM/GeoA3_args.py:145-158` / `ShapeAttack/HiT_ADV.py:318-325`
    (eq. 5 of the GeoA3 paper). ``pc``/``normal`` are ``[B, N, 3]``.
    """
    _, idx = G.knn_indices(pc, k)                             # [B, N, k]
    nn_pts = G.index_points(pc, idx)                          # [B, N, k, 3]
    vectors = G.l2_normalize(nn_pts - pc[:, :, None, :], axis=-1)
    dots = jnp.sum(vectors * normal[:, :, None, :], axis=-1)  # [B, N, k]
    return jnp.mean(jnp.abs(dots), axis=-1)                   # [B, N]


def get_kappa_std(pc: jnp.ndarray, normal: jnp.ndarray,
                  k: int = 10) -> jnp.ndarray:
    """Std of kappa over each point's kNN ring.

    Parity: `ShapeAttack/HiT_ADV.py:327-339` — the kNN ring excludes self,
    the std is torch-unbiased.
    """
    _, idx = G.knn_indices(pc, k)
    nn_pts = G.index_points(pc, idx)
    vectors = G.l2_normalize(nn_pts - pc[:, :, None, :], axis=-1)
    dots = jnp.sum(vectors * normal[:, :, None, :], axis=-1)
    kappa = jnp.mean(jnp.abs(dots), axis=-1)                  # [B, N]
    nn_kappa = jnp.take_along_axis(kappa[:, None, :],
                                   idx.reshape(kappa.shape[0], 1, -1),
                                   axis=2).reshape(idx.shape)  # [B, N, k]
    return jnp.std(nn_kappa, axis=-1, ddof=1)


def get_kappa_adv(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                  ori_normal: jnp.ndarray,
                  k: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kappa of the adv cloud using nearest-clean-point normals.

    Parity: `FGM/GeoA3_args.py:161-182`. Returns (kappa ``[B,N]``,
    normals ``[B,N,3]``).
    """
    nn1 = G.knn_points(adv_pc, ori_pc, 1)
    normal = G.index_points(ori_normal, nn1.idx[..., 0])      # [B, N, 3]
    kappa = get_kappa(adv_pc, normal, k)
    return kappa, normal


def curv_dist(ori_pc: jnp.ndarray, adv_pc: jnp.ndarray,
              ori_normal: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """GeoA3 curvature consistency loss. Parity: `util/dist_utils.py:498-561`."""
    ori_kappa = get_kappa(ori_pc, ori_normal, k)
    adv_kappa, _ = get_kappa_adv(adv_pc, ori_pc, ori_normal, k)
    nn1 = G.knn_points(adv_pc, ori_pc, 1)
    onenn_kappa = jnp.take_along_axis(ori_kappa, nn1.idx[..., 0], axis=1)
    return jnp.mean((adv_kappa - onenn_kappa) ** 2, axis=-1)


def curv_std_dist(ori_pc: jnp.ndarray, adv_pc: jnp.ndarray,
                  ori_normal: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """L2 between clean/adv kappa-std fields (imperceptibility metric).

    Parity: `util/dist_utils.py:464-495` (CurvStdDist); note both fields
    use the *clean* normals, matching the reference's fixme.
    """
    ori_std = get_kappa_std(ori_pc, ori_normal, k)
    adv_std = get_kappa_std(adv_pc, ori_normal, k)
    return jnp.linalg.norm(ori_std - adv_std, axis=-1)        # [B]


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def normalize_flatten_features(features: Sequence[jnp.ndarray],
                               eps: float = 1e-10) -> jnp.ndarray:
    """Channel-normalize, scale by 1/sqrt(N), flatten, concat.

    Parity: `util/dist_utils.py:564-592`. Features are ``[B, N, C]``
    channels-last (the reference uses ``[B, C, N]``; math is identical).
    """
    out = []
    for f in features:
        norm = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True)) + eps
        n_points = f.shape[1]
        out.append((f / (norm * jnp.sqrt(n_points))).reshape(f.shape[0], -1))
    return jnp.concatenate(out, axis=1)


def lpips_distance(features1: Sequence[jnp.ndarray],
                   features2: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """LPIPS between two activation stacks. Parity: `util/dist_utils.py:412-461`."""
    return jnp.linalg.norm(
        normalize_flatten_features(features1)
        - normalize_flatten_features(features2), axis=1)
