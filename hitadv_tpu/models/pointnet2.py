"""PointNet++ SSG classifier — functional JAX.

Parity surface: reference `model/pointnet2_cls_ssg.py` +
`model/pointnet2_utils.py:162-203` (PointNetSetAbstraction): three SA
stages (512/0.2/32 → 128/0.4/64 → group_all) of shared-MLP + max-pool over
ball-query groups, then a 512/256/num_classes head. Returns logits (the
reference returns ``(logits, l3_points)``; use `apply_full` for both).

FPS start convention: the reference model path uses a *random* first
point (`model/pointnet2_utils.py:76`). Pass ``key`` for that behavior;
default is the deterministic index-0 start (the CUDA-kernel convention),
which keeps eval runs reproducible.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F
from hitadv_tpu.ops import geometry as G


class SAConfig(NamedTuple):
    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Tuple[int, ...]
    group_all: bool


SSG_STAGES = (
    SAConfig(512, 0.2, 32, (64, 64, 128), False),
    SAConfig(128, 0.4, 64, (128, 128, 256), False),
    SAConfig(None, None, None, (256, 512, 1024), True),
)


def _sa_init(key: jax.Array, in_channel: int, mlp: Sequence[int]) -> Dict:
    return F.mlp_init(key, [in_channel] + list(mlp))


def _sa_apply(params: Dict, cfg: SAConfig, xyz: jnp.ndarray,
              points: Optional[jnp.ndarray],
              key: Optional[jax.Array]):
    """One set-abstraction stage. xyz [B,N,3], points [B,N,D] or None.

    Eval mode runs the first MLP layer PROJECT-THEN-GATHER: the layer
    is affine (BN folded), and an affine map commutes with a row
    gather, so ``conv0(concat(gather(xyz) - center, gather(feats)))``
    ==  ``gather(xyz·Wx + feats·Wf, idx) - center·Wx + b`` — both
    parts share idx, so ONE gather of the [B, N, C1] projected field
    replaces the xyz gather + feats gather + channel concat. On TPU
    that removes the [B, S, ns, 3(+D)] tensor, its layout copies
    (profiled ~0.5 ms/iter of the B=16 attack program), one of the two
    backward scatter-adds, and the K=3 contraction XLA lays out badly.
    Reassociation-level drift only. Train-mode BN needs batch stats of
    the pre-activation over the group grid, so it keeps the reference
    formulation (tuple parts — the concat is still never built).
    """
    tag = "sa_all" if cfg.group_all else f"sa{cfg.npoint}"
    if cfg.group_all or F.bn_is_training():
        with jax.named_scope(f"{tag}_group"):
            if cfg.group_all:
                new_xyz, new_points = G.sample_and_group_all(
                    xyz, points, concat=False)
            else:
                new_xyz, new_points = G.sample_and_group(
                    cfg.npoint, cfg.radius, cfg.nsample, xyz, points,
                    key=key, concat=False)
        with jax.named_scope(f"{tag}_mlp"):
            h = F.mlp_apply(params, new_points)
        with jax.named_scope(f"{tag}_max"):
            pooled = F.max_mid(h)                             # [B, S, C']
    else:
        with jax.named_scope(f"{tag}_group"):
            fps_idx = G.farthest_point_sample(xyz, cfg.npoint, key=key)
            new_xyz = G.index_points(xyz, fps_idx)            # [B, S, 3]
            idx = G.query_ball_point(cfg.radius, cfg.nsample, xyz,
                                     new_xyz)                 # [B, S, ns]
        with jax.named_scope(f"{tag}_proj"):
            W, b = F.fold_bn(params["conv0"], params["bn0"])  # [3+D, C1]
            q = F.linear({"w": W[:3]}, xyz)                   # [B, N, C1]
            if points is not None:
                q = q + F.linear({"w": W[3:]}, points)
            pc = F.linear({"w": W[:3]}, new_xyz)              # [B, S, C1]
        with jax.named_scope(f"{tag}_gather"):
            # neighbors-major grouped gather (gather_group_nm): idx
            # stays [B, S, ns] in HBM (the flat [B, M, 1] operand
            # tile-pads 128x) and the output needs no re-tile
            h = F.relu(G.gather_group_nm(q, idx)
                       - pc[:, None, :, :]
                       + b.astype(q.dtype))                  # [B,ns,S,C1]
        with jax.named_scope(f"{tag}_mlp"):
            h = F.mlp_apply(params, h, start=1)
        with jax.named_scope(f"{tag}_max"):
            pooled = F.max_axis(h, 1)                         # [B, S, C']
    return new_xyz, pooled


def init(key: jax.Array, num_classes: int = 40,
         normal_channel: bool = False) -> Dict:
    in_channel = 6 if normal_channel else 3
    keys = jax.random.split(key, 6)
    p = {
        "sa1": _sa_init(keys[0], in_channel, SSG_STAGES[0].mlp),
        "sa2": _sa_init(keys[1], 128 + 3, SSG_STAGES[1].mlp),
        "sa3": _sa_init(keys[2], 256 + 3, SSG_STAGES[2].mlp),
        "fc1": F.linear_init(keys[3], 1024, 512),
        "bn1": F.batchnorm_init(512),
        "fc2": F.linear_init(keys[4], 512, 256),
        "bn2": F.batchnorm_init(256),
        "fc3": F.linear_init(keys[5], 256, num_classes),
    }
    return p


def apply_full(params: Dict, x: jnp.ndarray,
               key: Optional[jax.Array] = None):
    """x: [B, N, C] (C=3, or 6 with normals as extra features)."""
    xyz = x[..., :3]
    feats = x[..., 3:] if x.shape[-1] > 3 else None
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)
    l1_xyz, l1_points = _sa_apply(params["sa1"], SSG_STAGES[0], xyz,
                                  feats, k1)
    l2_xyz, l2_points = _sa_apply(params["sa2"], SSG_STAGES[1], l1_xyz,
                                  l1_points, k2)
    _, l3_points = _sa_apply(params["sa3"], SSG_STAGES[2], l2_xyz,
                             l2_points, None)
    g = l3_points[:, 0, :]                                    # [B, 1024]
    g = F.relu(F.linear_bn(params["fc1"], params["bn1"], g))
    g = F.relu(F.linear_bn(params["fc2"], params["bn2"], g))
    logits = F.linear(params["fc3"], g)
    return logits, l3_points


def apply(params: Dict, x: jnp.ndarray,
          key: Optional[jax.Array] = None) -> jnp.ndarray:
    return apply_full(params, x, key)[0]


# ---------------------------------------------------------------------------
# MSG set abstraction + feature propagation (pointnet2_ops module parity)
# ---------------------------------------------------------------------------

def msg_init(key: jax.Array, in_channel: int,
             mlp_list: Sequence[Sequence[int]]) -> Dict:
    """Multi-scale-grouping SA stage.

    Parity: `model/pointnet2_utils.py:206-263` (PointNetSetAbstractionMsg)
    / `pointnet2_ops/pointnet2_modules.py` (PointnetSAModuleMSG).
    """
    keys = jax.random.split(key, len(mlp_list))
    return {f"branch{i}": F.mlp_init(keys[i],
                                     [in_channel + 3] + list(mlp))
            for i, mlp in enumerate(mlp_list)}


def msg_apply(params: Dict, npoint: int,
              radius_list: Sequence[float],
              nsample_list: Sequence[int],
              xyz: jnp.ndarray, points: Optional[jnp.ndarray],
              key: Optional[jax.Array] = None):
    """xyz [B,N,3], points [B,N,D] -> (new_xyz [B,S,3], feats [B,S,ΣC'])."""
    fps_idx = G.farthest_point_sample(xyz, npoint, key=key)
    new_xyz = G.index_points(xyz, fps_idx)
    outs = []
    for i, (radius, nsample) in enumerate(zip(radius_list,
                                              nsample_list)):
        idx = G.query_ball_point(radius, nsample, xyz, new_xyz)
        grouped_xyz = G.index_points(xyz, idx) - new_xyz[:, :, None, :]
        if points is not None:
            # parts in the reference's concat order [points, xyz]
            # (:246-249); F.linear_parts consumes them un-concatenated
            grouped = (G.index_points(points, idx), grouped_xyz)
        else:
            grouped = grouped_xyz
        h = F.mlp_apply(params[f"branch{i}"], grouped)
        outs.append(F.max_mid(h))                             # [B, S, C']
    return new_xyz, jnp.concatenate(outs, axis=-1)


def fp_init(key: jax.Array, in_channel: int,
            mlp: Sequence[int]) -> Dict:
    """Feature propagation stage. Parity: `model/pointnet2_utils.py:266-316`."""
    return F.mlp_init(key, [in_channel] + list(mlp))


def fp_apply(params: Dict, xyz1: jnp.ndarray, xyz2: jnp.ndarray,
             points1: Optional[jnp.ndarray],
             points2: jnp.ndarray) -> jnp.ndarray:
    """Interpolate features from the sparse level (xyz2/points2) back to
    the dense level (xyz1), concat skip features, shared MLP.

    xyz1 [B,N,3], xyz2 [B,S,3], points1 [B,N,D1] or None,
    points2 [B,S,D2] -> [B, N, C'].
    """
    B, N, _ = xyz1.shape
    S = xyz2.shape[1]
    if S == 1:
        interpolated = jnp.broadcast_to(points2,
                                        (B, N, points2.shape[-1]))
    else:
        # 3-NN inverse-squared-distance weights (reference uses the
        # squared distances from square_distance directly, :296-299)
        sq = G.square_distance(xyz1, xyz2)
        neg, idx = jax.lax.top_k(-sq, 3)
        weights = G.interpolate_weights(-neg)
        interpolated = G.three_interpolate(points2, idx, weights)
    if points1 is not None:
        interpolated = (points1, interpolated)    # F.linear_parts order
    return F.mlp_apply(params, interpolated)


def _sa_spec(torch_prefix: str, tree_prefix: str, n_layers: int):
    spec = {}
    for i in range(n_layers):
        spec[f"{tree_prefix}/conv{i}"] = (
            f"{torch_prefix}.mlp_convs.{i}", "conv")
        spec[f"{tree_prefix}/bn{i}"] = (f"{torch_prefix}.mlp_bns.{i}", "bn")
    return spec


TORCH_SPEC = {
    **_sa_spec("sa1", "sa1", 3),
    **_sa_spec("sa2", "sa2", 3),
    **_sa_spec("sa3", "sa3", 3),
    "fc1": ("fc1", "linear"),
    "bn1": ("bn1", "bn"),
    "fc2": ("fc2", "linear"),
    "bn2": ("bn2", "bn"),
    "fc3": ("fc3", "linear"),
}
