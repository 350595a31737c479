"""GeoA3 loss zoo and normal-estimation utilities.

Parity surface: reference `FGM/GeoA3_args.py:113-425` — the loss functions
GeoA3 composes, the disk-uniformity metric used by `eval_ASR`
(`util/other_utils.py:38,74`), and the PCA normal estimators.

The reference's `uniform_loss` is the only Python code path that calls the
CUDA `pointnet2_ops` (FPS + ball_query + grouping,
`FGM/GeoA3_args.py:277-284`); here those are the `ops/` layer, so the whole
metric is one jittable program. Per-point losses return ``[B, N]``,
per-cloud ``[B]``; `uniform_loss` returns a scalar like the reference.

Clouds are ``[B, N, 3]`` channels-last.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.ops import geometry as G
from hitadv_tpu.losses.distance import (  # noqa: F401 (re-export parity names)
    get_kappa as _get_kappa,
    get_kappa_adv as _get_kappa_adv,
)


# ---------------------------------------------------------------------------
# Simple set losses (kNN-based, GeoA3 variants)
# ---------------------------------------------------------------------------

def norm_l2_loss(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray) -> jnp.ndarray:
    """Parity: `FGM/GeoA3_args.py:113-114`."""
    return jnp.sum((adv_pc - ori_pc) ** 2, axis=(1, 2))


def chamfer_loss(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray) -> jnp.ndarray:
    """Two-sided Chamfer (sum of sides). Parity: `FGM/GeoA3_args.py:117-124`."""
    a2o = G.knn_points(adv_pc, ori_pc, 1).dists[..., 0]       # [B, N]
    o2a = G.knn_points(ori_pc, adv_pc, 1).dists[..., 0]
    return jnp.mean(a2o, axis=-1) + jnp.mean(o2a, axis=-1)


def pseudo_chamfer_loss(adv_pc: jnp.ndarray,
                        ori_pc: jnp.ndarray) -> jnp.ndarray:
    """One-sided Chamfer. Parity: `FGM/GeoA3_args.py:127-133`."""
    a2o = G.knn_points(adv_pc, ori_pc, 1).dists[..., 0]
    return jnp.mean(a2o, axis=-1)


def hausdorff_loss(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray) -> jnp.ndarray:
    """One-sided Hausdorff. Parity: `FGM/GeoA3_args.py:136-141`."""
    a2o = G.knn_points(adv_pc, ori_pc, 1).dists[..., 0]
    return jnp.max(a2o, axis=-1)


def curvature_loss(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                   adv_kappa: jnp.ndarray,
                   ori_kappa: jnp.ndarray) -> jnp.ndarray:
    """Kappa consistency vs nearest clean point. Parity: `FGM/GeoA3_args.py:184-197`."""
    nn1 = G.knn_points(adv_pc, ori_pc, 1)
    onenn = jnp.take_along_axis(ori_kappa, nn1.idx[..., 0], axis=1)
    return jnp.mean((adv_kappa - onenn) ** 2, axis=-1)


def displacement_loss(adv_pc: jnp.ndarray, ori_pc: jnp.ndarray,
                      k: int = 16) -> jnp.ndarray:
    """Perturbation-field smoothness over the clean kNN graph.

    Parity: `FGM/GeoA3_args.py:200-208`. Returns ``[B, N]``.
    """
    _, idx = G.knn_indices(lax.stop_gradient(ori_pc), k)
    theta = jnp.sum((adv_pc - ori_pc) ** 2, axis=-1)          # [B, N]
    B, N = theta.shape
    nn_theta = jnp.take_along_axis(theta, idx.reshape(B, -1),
                                   axis=1).reshape(B, N, k)
    return jnp.mean((nn_theta - theta[:, :, None]) ** 2, axis=2)


def corresponding_normal_loss(adv_pc: jnp.ndarray, normal: jnp.ndarray,
                              k: int = 2) -> jnp.ndarray:
    """Parity: `FGM/GeoA3_args.py:211-219`. Returns ``[B, N]``."""
    _, idx = G.knn_indices(adv_pc, k)
    nn_pts = G.index_points(adv_pc, idx)
    vectors = G.l2_normalize(nn_pts - adv_pc[:, :, None, :], axis=-1)
    dots = jnp.sum(vectors * normal[:, :, None, :], axis=-1)
    return jnp.mean(jnp.abs(dots), axis=-1)


def repulsion_loss(pc: jnp.ndarray, k: int = 4,
                   h: float = 0.03) -> jnp.ndarray:
    """Push points apart. Parity: `FGM/GeoA3_args.py:222-226`. ``[B, N]``."""
    dists, _ = G.knn_indices(pc, k)                           # squared
    return -jnp.mean(dists * jnp.exp(-(dists ** 2) / (h ** 2)), axis=2)


def distance_kmean_loss(pc: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean-kNN-distance consistency. Parity: `FGM/GeoA3_args.py:229-237`."""
    d = jnp.sqrt(G.pairwise_distance(pc) + 1e-12)
    neg, idx = lax.top_k(-d, k + 1)
    dis = -neg[..., 1:]
    idx = idx[..., 1:]
    dis_mean = jnp.mean(dis, axis=-1)                         # [B, N]
    B, N = dis_mean.shape
    dis_mean_k = jnp.take_along_axis(dis_mean, idx.reshape(B, -1),
                                     axis=1).reshape(B, N, k)
    return jnp.mean(jnp.abs(dis_mean[:, :, None] - dis_mean_k), axis=-1)


def knn_smoothing_loss(adv_pc: jnp.ndarray, k: int,
                       threshold_coef: float = 1.05) -> jnp.ndarray:
    """Outlier penalty on mean-kNN distance. Parity: `FGM/GeoA3_args.py:240-255`."""
    dists, _ = G.knn_indices(adv_pc, k)                       # squared
    knn_dis = jnp.mean(dists, axis=-1)                        # [B, N]
    mean = jnp.mean(knn_dis, axis=-1, keepdims=True)
    std = jnp.std(knn_dis, axis=-1, keepdims=True, ddof=1)
    threshold = mean + threshold_coef * std
    cond = (knn_dis > threshold).astype(adv_pc.dtype)
    return jnp.mean(knn_dis * cond, axis=1)                   # [B]


# ---------------------------------------------------------------------------
# Disk-uniformity metric (the eval_ASR "Uniform dist")
# ---------------------------------------------------------------------------

def uniform_loss(adv_pc: jnp.ndarray,
                 percentages: Tuple[float, ...] = (0.004, 0.006, 0.008,
                                                  0.010, 0.012),
                 radius: float = 1.0, k: int = 2) -> jnp.ndarray:
    """GeoA3 disk-uniformity loss (PU-GAN style), scalar.

    Parity: `FGM/GeoA3_args.py:258-303` — FPS (fixed start 0 like the CUDA
    kernel `sampling_gpu.cu:86`) → ball query → per-disk kNN → deviation of
    mean neighbor spacing from the expected uniform spacing.
    """
    B, n, _ = adv_pc.shape
    npoint = int(n * 0.05)
    fps_idx = G.farthest_point_sample(adv_pc, npoint, start_idx=0)
    new_xyz = G.index_points(adv_pc, fps_idx)                 # [B, S, 3]

    loss = jnp.asarray(0.0, dtype=adv_pc.dtype)
    n_terms = 0
    for p in percentages:
        p = p * 4
        nsample = int(n * p)
        if nsample < 2:
            # disk has no neighbor ring at this N (reference NaNs here;
            # only reachable below N~128)
            continue
        r = math.sqrt(p * radius)
        disk_area = math.pi * (radius ** 2) * p / nsample
        expect_len = math.sqrt(disk_area)

        idx = G.query_ball_point(r, nsample, adv_pc, new_xyz)
        grouped = G.index_points(adv_pc, idx)                 # [B,S,ns,3]
        flat = grouped.reshape(B * npoint, nsample, 3)
        # clamp k at the group size (small-N guard; the reference
        # crashes below N~400 where nsample < k+1)
        kk = min(k + 1, nsample)
        knn = G.knn_points(flat, flat, kk)
        d = jnp.sqrt(jnp.abs(knn.dists[..., 1:]) + 1e-12)
        ud = jnp.mean(d, axis=-1)                             # [B*S, ns]
        ud = ((ud - expect_len) ** 2) / (expect_len + 1e-12)
        mean = jnp.mean(ud) * (p * 100.0) ** 2
        loss = loss + mean
        n_terms += 1
    return loss / max(n_terms, 1)


# ---------------------------------------------------------------------------
# Jitter / normal estimation
# ---------------------------------------------------------------------------

def jitter_input(key: jax.Array, shape, sigma: float = 0.01,
                 clip: float = 0.05) -> jnp.ndarray:
    """Clamped gaussian jitter. Parity: `FGM/GeoA3_args.py:308-313`."""
    return jnp.clip(sigma * jax.random.normal(key, shape), -clip, clip)


def _knn_ring_covariance(pc: jnp.ndarray, k: int):
    """Centered covariance of each point's kNN ring: ``[B, N, 3, 3]``."""
    _, idx = G.knn_indices(pc, k)
    nn_pts = G.index_points(pc, idx)                          # [B, N, k, 3]
    centered = nn_pts - jnp.mean(nn_pts, axis=2, keepdims=True)
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / (k - 1)
    return cov, centered


def estimate_normal(pc: jnp.ndarray, k: int) -> jnp.ndarray:
    """PCA surface normals: smallest-eigenvector of the kNN covariance.

    Parity: `FGM/GeoA3_args.py:315-363` (torch>=0.4 branch) for the PCA
    part, via batched `jnp.linalg.eigh` instead of the reference's
    per-cloud python loop. Deliberate fix: the reference's sign correction
    dots the normal against the *centered* neighbor sum — identically ~0,
    so its signs are float-noise (`GeoA3_args.py:341-343`). We orient
    against the true point→local-centroid direction instead; downstream
    kappa losses take |dot| so this only affects sign-sensitive users.
    Returns ``[B, N, 3]``.
    """
    _, idx = G.knn_indices(pc, k)
    nn_pts = G.index_points(pc, idx)                          # [B, N, k, 3]
    centered = nn_pts - jnp.mean(nn_pts, axis=2, keepdims=True)
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / (k - 1)
    eigval, eigvec = jnp.linalg.eigh(cov)                     # ascending
    normal = eigvec[..., 0]                                   # [B, N, 3]
    to_centroid = jnp.mean(nn_pts, axis=2) - pc               # [B, N, 3]
    dot = jnp.sum(normal * to_centroid, axis=-1, keepdims=True)
    sign = jnp.where(dot > 0, -1.0, 1.0)
    return lax.stop_gradient(sign * normal)


def estimate_perpendicular(pc: jnp.ndarray, k: int, key: jax.Array,
                           sigma: float = 0.01,
                           clip: float = 0.05) -> jnp.ndarray:
    """Random jitter in the local tangent plane (two largest eigvecs).

    Parity: `FGM/GeoA3_args.py:391-425`.
    """
    B, N, _ = pc.shape
    cov, _ = _knn_ring_covariance(pc, k)
    _, eigvec = jnp.linalg.eigh(cov)                          # ascending
    v1 = eigvec[..., 2]                                       # largest
    v2 = eigvec[..., 1]                                       # second
    k1, k2 = jax.random.split(key)
    a1 = sigma * jax.random.normal(k1, (B, N, 1))
    a2 = sigma * jax.random.normal(k2, (B, N, 1))
    return (jnp.clip(v1 * a1, -clip, clip)
            + jnp.clip(v2 * a2, -clip, clip))


def estimate_normal_via_ori_normal(pc_adv: jnp.ndarray, pc_ori: jnp.ndarray,
                                   normal_ori: jnp.ndarray,
                                   k: int) -> jnp.ndarray:
    """Transfer clean normals to adv points via kNN averaging.

    Parity: `FGM/GeoA3_args.py:366-382` (with the normalization done with
    keepdims — the reference's broadcast there is shape-inconsistent).
    Unmoved points (nearest dist < 1e-6) copy their nearest clean normal.
    """
    knn = G.knn_points(pc_adv, pc_ori, k)
    normal_pts = G.index_points(normal_ori, knn.idx)          # [B, N, k, 3]
    avg = jnp.mean(normal_pts, axis=2)
    avg = avg / (jnp.linalg.norm(avg, axis=-1, keepdims=True) + 1e-12)
    nearest = normal_pts[:, :, 0, :]
    cond = (knn.dists[..., 0] < 1e-6)[..., None]
    return jnp.where(cond, nearest, avg)
