"""PointConv (density-weighted SSG) classifier — functional JAX.

Parity surface: reference `model/pointconv.py` + `util/pointconv_util.py`
(PointConvDensitySetAbstraction): per-stage KDE density
(`compute_density`, :209-219), `DensityNet` scaling (:222-245 — note its
sigmoid branch is dead code, every layer is relu; reproduced),
`WeightNet` MLP kernel (:248-275), and the matmul-aggregated continuous
conv (:334-401). FPS uses the fixed index-0 start
(`util/pointconv_util.py:78`), grouping is kNN.

Reference signature is ``forward(xyz, feat)`` (the odd one out,
`model/pointconv.py:31`); here ``apply(params, x, feat=None)`` defaults
``feat`` to the coordinates.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F
from hitadv_tpu.ops import geometry as G


class PCStage(NamedTuple):
    npoint: int
    nsample: Optional[int]
    mlp: Tuple[int, ...]
    bandwidth: float
    group_all: bool


STAGES = (
    PCStage(512, 32, (64, 64, 128), 0.1, False),
    PCStage(128, 64, (128, 128, 256), 0.2, False),
    PCStage(1, None, (256, 512, 1024), 0.4, True),
)


def compute_density(xyz: jnp.ndarray, bandwidth: float) -> jnp.ndarray:
    """KDE density, parity: `util/pointconv_util.py:209-219`. [B, N].

    Dispatches to the fused Pallas kernel on TPU (no [B, N, N] Gaussian
    in HBM in either direction — the hottest op of this victim under
    attack since the cloud moves every iteration)."""
    return G.kde_density(xyz, bandwidth)


@jax.custom_vjp
def _max_lastdim(x):
    """``jnp.max(x, -1, keepdims=True)`` with an elementwise VJP.

    XLA lowers reduce-max's autodiff transpose to a select-and-scatter
    fusion (profiled 1.3 ms/iter across PointConv's two densitynet
    maxes); the mask/count formulation below computes the identical
    tie-splitting gradient with plain elementwise ops.
    """
    return jnp.max(x, axis=-1, keepdims=True)


def _max_lastdim_fwd(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m, (x, m)


def _max_lastdim_bwd(res, g):
    x, m = res
    mask = (x == m).astype(g.dtype)
    cnt = jnp.sum(mask, axis=-1, keepdims=True)
    return (mask * (g / cnt),)


_max_lastdim.defvjp(_max_lastdim_fwd, _max_lastdim_bwd)


def _densitynet_init(key, hidden=(16, 8)):
    return F.mlp_init(key, [1, *hidden, 1])


def _densitynet_apply(p, x):
    # reference's sigmoid branch is unreachable: relu everywhere
    return F.mlp_apply(p, x, act=F.relu, last_act=True)


def _weightnet_init(key, in_c=3, out_c=16, hidden=(8, 8)):
    return F.mlp_init(key, [in_c, *hidden, out_c])


def _weightnet_apply(p, x):
    return F.mlp_apply(p, x, act=F.relu, last_act=True)


def _stage_init(key, in_channel, stage: PCStage):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "mlp": F.mlp_init(k1, [in_channel] + list(stage.mlp)),
        "weightnet": _weightnet_init(k2),
        "densitynet": _densitynet_init(k3),
        "linear": F.linear_init(k4, 16 * stage.mlp[-1], stage.mlp[-1]),
        "bn_linear": F.batchnorm_init(stage.mlp[-1]),
    }


def _stage_apply(p, stage: PCStage, xyz, points):
    """xyz [B,N,3], points [B,N,D] -> (new_xyz [B,S,3], feats [B,S,C'])."""
    B, N, _ = xyz.shape
    with jax.named_scope("pc_density"):
        density = compute_density(xyz, stage.bandwidth)       # [B, N]
        inv_density = 1.0 / density

    fused = not (stage.group_all or F.bn_is_training())
    if stage.group_all:
        new_xyz = jnp.mean(xyz, axis=1, keepdims=True)        # [B, 1, 3]
        grouped_xyz = xyz[:, None] - new_xyz[:, :, None]      # [B,1,N,3]
        # tuple parts: F.linear_parts consumes them un-concatenated
        new_points = (grouped_xyz, points[:, None])
        grouped_density = inv_density.reshape(B, 1, N)
        S = 1
    elif fused:
        # Eval-mode project-then-gather (see pointnet2._sa_apply for
        # the algebra): the BN-folded first layers of the stage MLP
        # AND of WeightNet are affine, so they commute with the row
        # gather — project both on the UNGATHERED [B, N, *] field,
        # gather [mlp0 | weightnet0 | inv_density] in ONE sweep, and
        # correct the per-group center image after. This removes the
        # [B, S, ns, 3] grouped-xyz tensor entirely and with it the
        # packed-gather channel slices the r4 HLO showed as ~1 ms/iter
        # of misaligned lane-slice copies (grouped_aug[..., 4:] at
        # offset 4 of a (2,1)-packed bf16 lane dim relayouts the whole
        # tensor). Reassociation-level drift only (pinned at 5e-6 in
        # tests/test_project_then_gather.py). Train-mode BN needs
        # batch stats of the pre-activation over the group grid, so
        # training keeps the reference formulation below.
        with jax.named_scope("pc_fps"):
            fps_idx = G.farthest_point_sample(xyz, stage.npoint,
                                              start_idx=0)
            new_xyz = G.index_points(xyz, fps_idx)
        with jax.named_scope("pc_knn"):
            idx = G.knn_point(stage.nsample, xyz, new_xyz)
        with jax.named_scope("pc_proj"):
            W0, b0 = F.fold_bn(p["mlp"]["conv0"], p["mlp"]["bn0"])
            V0, c0 = F.fold_bn(p["weightnet"]["conv0"],
                               p["weightnet"]["bn0"])
            C1 = W0.shape[1]
            q = F.linear({"w": W0[:3]}, xyz) \
                + F.linear({"w": W0[3:]}, points)             # [B, N, C1]
            qw = F.linear({"w": V0}, xyz)                     # [B, N, 8]
            pc = F.linear({"w": W0[:3]}, new_xyz)             # [B, S, C1]
            pw = F.linear({"w": V0}, new_xyz)                 # [B, S, 8]
            # in bf16 attack mode the density rides the same bf16
            # sweep (it is normalized per group and consumed by a
            # bf16-compute MLP anyway); f32 parity mode keeps it f32
            field = jnp.concatenate(
                [q, qw, inv_density[..., None].astype(q.dtype)], -1)
        with jax.named_scope("pc_group"):
            # S-major gather: the neighbors-major variant (which wins
            # on PN++/PCT) was measured 17% SLOWER end-to-end here —
            # the bsnc,bsnw->bscw WeightNet contraction batches over
            # (b, s), so an ns-major layout forces XLA to transpose
            # both einsum operands back (r4: 9.08 -> 10.63 ms/iter)
            g = G.index_points(field, idx)            # [B,S,ns,C1+8+1]
        with jax.named_scope("pc_mlp"):
            h = F.relu(g[..., :C1] - pc[:, :, None, :]
                       + b0.astype(q.dtype))
            h = F.mlp_apply(p["mlp"], h, start=1)            # [B,S,ns,C']
        wn_h = F.relu(g[..., C1:C1 + 8] - pw[:, :, None, :]
                      + c0.astype(q.dtype))
        grouped_density = g[..., C1 + 8]                      # [B,S,ns]
        S = stage.npoint
    else:
        with jax.named_scope("pc_fps"):
            fps_idx = G.farthest_point_sample(xyz, stage.npoint,
                                              start_idx=0)
            new_xyz = G.index_points(xyz, fps_idx)
        with jax.named_scope("pc_knn"):
            idx = G.knn_point(stage.nsample, xyz, new_xyz)
        with jax.named_scope("pc_group"):
            # xyz, inv_density and (dtype permitting) the stage
            # features all share idx: ONE gather (and one scatter in
            # the VJP) for the whole concat — each separate one-hot
            # sweep carries a fixed one-hot-build + scatter-pass cost
            # (profiled 0.5 ms fwd + 0.77 ms bwd per gather). In bf16
            # mode the features stay a separate bf16 sweep: the f32
            # gather rides an exact 3-plane bf16 split (3x the lane
            # width), so promoting D wide channels to f32 would cost
            # more than the fixed sweep it saves.
            cols = [xyz, inv_density[..., None]]
            merge_points = points.dtype == xyz.dtype
            if merge_points:
                cols.append(points)
            aug = jnp.concatenate(cols, axis=-1)              # [B,N,4(+D)]
            grouped_aug = G.index_points(aug, idx)          # [B,S,ns,4(+D)]
            grouped_xyz = (grouped_aug[..., :3]
                           - new_xyz[:, :, None, :])          # [B,S,ns,3]
            grouped_density = grouped_aug[..., 3]             # [B,S,ns]
            grouped_points = (grouped_aug[..., 4:] if merge_points
                              else G.index_points(points, idx))
            # tuple parts: the first MLP layer consumes (xyz_norm,
            # feats) via F.linear_parts — no [B, S, ns, 3+D] concat
            new_points = (grouped_xyz, grouped_points)
        S = stage.npoint

    if not fused:
        with jax.named_scope("pc_mlp"):
            h = F.mlp_apply(p["mlp"], new_points)             # [B,S,ns,C']

    with jax.named_scope("pc_densitynet"):
        inv_max = _max_lastdim(grouped_density)               # [B, S, 1]
        density_scale = _densitynet_apply(
            p["densitynet"], (grouped_density / inv_max)[..., None])
        h = h * density_scale                                 # [B,S,ns,C']

    with jax.named_scope("pc_weightnet"):
        weights = (F.mlp_apply(p["weightnet"], wn_h, start=1) if fused
                   else _weightnet_apply(p["weightnet"],
                                         grouped_xyz))        # [B,S,ns,16]
    with jax.named_scope("pc_agg"):
        agg = jnp.einsum("bsnc,bsnw->bscw", h, weights,
                         preferred_element_type=jnp.float32)
        agg = agg.reshape(B, S, -1)                           # [B,S,16*C']
        out = F.relu(F.linear_bn(p["linear"], p["bn_linear"], agg))
    return new_xyz, out


def init(key: jax.Array, num_classes: int = 40) -> Dict:
    keys = jax.random.split(key, 6)
    return {
        "sa1": _stage_init(keys[0], 3 + 3, STAGES[0]),
        "sa2": _stage_init(keys[1], 128 + 3, STAGES[1]),
        "sa3": _stage_init(keys[2], 256 + 3, STAGES[2]),
        "fc1": F.linear_init(keys[3], 1024, 512),
        "bn1": F.batchnorm_init(512),
        "fc2": F.linear_init(keys[4], 512, 256),
        "bn2": F.batchnorm_init(256),
        "fc3": F.linear_init(keys[5], 256, num_classes),
    }


def apply(params: Dict, x: jnp.ndarray,
          feat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [B, N, 3]; feat defaults to the coordinates."""
    xyz = x[..., :3]
    if feat is None:
        feat = xyz
    h_xyz, h = _stage_apply(params["sa1"], STAGES[0], xyz, feat)
    h_xyz, h = _stage_apply(params["sa2"], STAGES[1], h_xyz, h)
    _, h = _stage_apply(params["sa3"], STAGES[2], h_xyz, h)
    g = h[:, 0, :]                                            # [B, 1024]
    g = F.relu(F.linear_bn(params["fc1"], params["bn1"], g))
    g = F.relu(F.linear_bn(params["fc2"], params["bn2"], g))
    return F.linear(params["fc3"], g)


def _stage_spec(tp, tr, n_mlp):
    spec = {}
    for i in range(n_mlp):
        spec[f"{tr}/mlp/conv{i}"] = (f"{tp}.mlp_convs.{i}", "conv")
        spec[f"{tr}/mlp/bn{i}"] = (f"{tp}.mlp_bns.{i}", "bn")
    for i in range(3):  # weightnet 3->8->8->16
        spec[f"{tr}/weightnet/conv{i}"] = (
            f"{tp}.weightnet.mlp_convs.{i}", "conv")
        spec[f"{tr}/weightnet/bn{i}"] = (
            f"{tp}.weightnet.mlp_bns.{i}", "bn")
    for i in range(3):  # densitynet 1->16->8->1
        spec[f"{tr}/densitynet/conv{i}"] = (
            f"{tp}.densitynet.mlp_convs.{i}", "conv")
        spec[f"{tr}/densitynet/bn{i}"] = (
            f"{tp}.densitynet.mlp_bns.{i}", "bn")
    spec[f"{tr}/linear"] = (f"{tp}.linear", "linear")
    spec[f"{tr}/bn_linear"] = (f"{tp}.bn_linear", "bn")
    return spec


TORCH_SPEC = {
    **_stage_spec("sa1", "sa1", 3),
    **_stage_spec("sa2", "sa2", 3),
    **_stage_spec("sa3", "sa3", 3),
    "fc1": ("fc1", "linear"),
    "bn1": ("bn1", "bn"),
    "fc2": ("fc2", "linear"),
    "bn2": ("bn2", "bn"),
    "fc3": ("fc3", "linear"),
}
