"""PCT (Point Cloud Transformer) classifier — functional JAX.

Parity surface: reference `model/pct_cls.py` + `model/pct_utils.py`:
conv 3→64→64, two kNN-32 sample_and_group stages (npoint 512→256) with
`Local_op` pooling, four offset-attention `SA_Layer`s with *shared* q/k
weights (`model/pct_cls.py:116-117`) and the column-renormalized softmax
(`:134-135`), conv_fuse to 1024, global max pool, 512/256/num_classes
head.

FPS: the reference uses the random-start `fps` from `util/other_utils.py`
(`model/pct_utils.py:127`); pass ``key`` to reproduce, default index-0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F
from hitadv_tpu.ops import geometry as G


@dataclass(frozen=True)
class PCTConfig:
    dropout: float = 0.2        # identity in eval


def _local_op_init(key, in_c, out_c):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": F.conv1x1_init(k1, in_c, out_c, bias=False),
        "bn1": F.batchnorm_init(out_c),
        "conv2": F.conv1x1_init(k2, out_c, out_c, bias=False),
        "bn2": F.batchnorm_init(out_c),
    }


def _local_op_apply(p, x):
    """x: [B, S, ns, D] -> [B, S, out] (mlp over D, max over ns).

    Parity: `model/pct_cls.py:6-23`.
    """
    h = F.relu(F.linear_bn(p["conv1"], p["bn1"], x))
    h = F.relu(F.linear_bn(p["conv2"], p["bn2"], h))
    return F.max_mid(h)


def _local_op_fused(p, points, fps_idx, idx):
    """Eval-mode Local_op with conv1 run PROJECT-THEN-GATHER.

    The reference's grouped input is ``concat(g_j - c_i, c_i)``
    (`model/pct_utils.py:135-139`); conv1+BN is affine in eval mode, so
    ``conv1(concat) = g_j·W1 + c_i·(W2 - W1) + b`` and the gather
    commutes with the projection: ONE gather of the [B, N, C]
    projected features replaces the [B, S, ns, 2D] concat, the tiled
    center broadcast, and the grouped-space matmul (the center term
    runs on S rows instead of S·ns). Reassociation-level drift only.
    """
    W, b = F.fold_bn(p["conv1"], p["bn1"])                    # [2D, C]
    D = points.shape[-1]
    q = F.linear({"w": W[:D]}, points)                        # [B, N, C]
    center = G.index_points(points, fps_idx)                  # [B, S, D]
    cterm = F.linear({"w": W[D:] - W[:D], "b": b}, center)    # [B, S, C]
    # neighbors-major grouped gather: idx stays [B, S, ns] in HBM (the
    # flat [B, M, 1] operand tile-pads 128x) and the output needs no
    # re-tile; the neighbor max moves to axis 1
    h = F.relu(G.gather_group_nm(q, idx)
               + cterm[:, None, :, :])                       # [B,ns,S,C]
    h = F.relu(F.linear_bn(p["conv2"], p["bn2"], h))
    return F.max_axis(h, 1)


def _sa_layer_init(key, channels):
    kq, kv, kt = jax.random.split(key, 3)
    # q and k share the SAME weight tensor (reference ties them); we store
    # it once and use it for both projections.
    return {
        "qk_conv": F.conv1x1_init(kq, channels, channels // 4, bias=False),
        "v_conv": F.conv1x1_init(kv, channels, channels),
        "trans_conv": F.conv1x1_init(kt, channels, channels),
        "after_norm": F.batchnorm_init(channels),
    }


def _sa_layer_apply(p, x):
    """Offset attention. x: [B, N, C]. Parity: `model/pct_cls.py:111-140`."""
    q = F.linear(p["qk_conv"], x)                             # [B, N, C/4]
    k = F.linear(p["qk_conv"], x)
    v = F.linear(p["v_conv"], x)                              # [B, N, C]
    energy = jnp.matmul(q, jnp.swapaxes(k, 1, 2),
                        preferred_element_type=jnp.float32)   # [B, N, N]
    attention = jax.nn.softmax(energy, axis=-1)
    # renormalize each column (reference: sum over dim 1)
    attention = attention / (1e-9 + jnp.sum(attention, axis=1,
                                            keepdims=True))
    # torch: x_r = bmm(x_v [B,C,N], attention [B,N,N]) -> channels-last:
    x_r = jnp.matmul(jnp.swapaxes(attention, 1, 2), v,
                     preferred_element_type=jnp.float32)      # [B, N, C]
    x_r = F.relu(F.linear_bn(p["trans_conv"], p["after_norm"], x - x_r))
    return x + x_r


def init(key: jax.Array, num_classes: int = 40,
         cfg: PCTConfig = PCTConfig()) -> Dict:
    keys = jax.random.split(key, 12)
    p = {
        "conv1": F.conv1x1_init(keys[0], 3, 64, bias=False),
        "bn1": F.batchnorm_init(64),
        "conv2": F.conv1x1_init(keys[1], 64, 64, bias=False),
        "bn2": F.batchnorm_init(64),
        "gather0": _local_op_init(keys[2], 128, 128),
        "gather1": _local_op_init(keys[3], 256, 256),
        "pt_conv1": F.conv1x1_init(keys[4], 256, 256, bias=False),
        "pt_bn1": F.batchnorm_init(256),
        "pt_conv2": F.conv1x1_init(keys[5], 256, 256, bias=False),
        "pt_bn2": F.batchnorm_init(256),
        "sa1": _sa_layer_init(keys[6], 256),
        "sa2": _sa_layer_init(keys[7], 256),
        "sa3": _sa_layer_init(keys[8], 256),
        "sa4": _sa_layer_init(keys[9], 256),
        "conv_fuse": F.conv1x1_init(keys[10], 1280, 1024, bias=False),
        "bn_fuse": F.batchnorm_init(1024),
    }
    hk = jax.random.split(keys[11], 3)
    p["linear1"] = F.linear_init(hk[0], 1024, 512, bias=False)
    p["bn6"] = F.batchnorm_init(512)
    p["linear2"] = F.linear_init(hk[1], 512, 256)
    p["bn7"] = F.batchnorm_init(256)
    p["linear3"] = F.linear_init(hk[2], 256, num_classes)
    return p


def apply(params: Dict, x: jnp.ndarray,
          key: Optional[jax.Array] = None) -> jnp.ndarray:
    """x: [B, N, 3] -> logits."""
    xyz = x
    k1 = k2 = None
    if key is not None:
        k1, k2 = jax.random.split(key)

    with jax.named_scope("pct_embed"):
        h = F.relu(F.linear_bn(params["conv1"], params["bn1"], x))
        h = F.relu(F.linear_bn(params["conv2"], params["bn2"], h))

    if F.bn_is_training():
        # train-mode BN needs batch stats of conv1's pre-activation
        # over the group grid — keep the reference formulation (tuple
        # parts; the [B, S, ns, 2D] concat is still never built)
        with jax.named_scope("pct_group0"):
            new_xyz, grouped = G.sample_and_group_knn(
                512, 32, xyz, h, key=k1, concat=False)
            feat0 = _local_op_apply(params["gather0"], grouped)
        with jax.named_scope("pct_group1"):
            new_xyz, grouped = G.sample_and_group_knn(
                256, 32, new_xyz, feat0, key=k2, concat=False)
            feat1 = _local_op_apply(params["gather1"], grouped)
    else:
        with jax.named_scope("pct_group0"):
            fps_idx = G.farthest_point_sample(xyz, 512, key=k1)
            new_xyz = G.index_points(xyz, fps_idx)
            idx = G.knn_point(32, xyz, new_xyz)
            feat0 = _local_op_fused(params["gather0"], h,
                                    fps_idx, idx)             # [B,512,128]
        with jax.named_scope("pct_group1"):
            fps_idx = G.farthest_point_sample(new_xyz, 256, key=k2)
            xyz2 = G.index_points(new_xyz, fps_idx)
            idx = G.knn_point(32, new_xyz, xyz2)
            feat1 = _local_op_fused(params["gather1"], feat0,
                                    fps_idx, idx)             # [B,256,256]
            new_xyz = xyz2

    with jax.named_scope("pct_pt"):
        h = F.relu(F.linear_bn(params["pt_conv1"], params["pt_bn1"],
                               feat1))
        h = F.relu(F.linear_bn(params["pt_conv2"], params["pt_bn2"], h))
    with jax.named_scope("pct_sa"):
        x1 = _sa_layer_apply(params["sa1"], h)
        x2 = _sa_layer_apply(params["sa2"], x1)
        x3 = _sa_layer_apply(params["sa3"], x2)
        x4 = _sa_layer_apply(params["sa4"], x3)
    with jax.named_scope("pct_fuse"):
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)        # [B,256,1024]
        h = jnp.concatenate([h, feat1], axis=-1)              # [B,256,1280]
        # max(leaky(linear_bn)) == leaky(max(linear_bn)) (monotone): ride
        # the fused VMEM-resident max_linear kernel (see F.linear_bn_max)
        g = F.leaky_relu(F.linear_bn_max(params["conv_fuse"],
                                         params["bn_fuse"], h))  # [B,1024]

    g = F.leaky_relu(F.linear_bn(params["linear1"], params["bn6"], g))
    g = F.leaky_relu(F.linear_bn(params["linear2"], params["bn7"], g))
    return F.linear(params["linear3"], g)


def _local_spec(tp, tr):
    return {
        f"{tr}/conv1": (f"{tp}.conv1", "conv"),
        f"{tr}/bn1": (f"{tp}.bn1", "bn"),
        f"{tr}/conv2": (f"{tp}.conv2", "conv"),
        f"{tr}/bn2": (f"{tp}.bn2", "bn"),
    }


def _sa_spec(tp, tr):
    # q_conv and k_conv are tied in torch; q_conv's tensor is canonical.
    return {
        f"{tr}/qk_conv": (f"{tp}.q_conv", "conv"),
        f"{tr}/v_conv": (f"{tp}.v_conv", "conv"),
        f"{tr}/trans_conv": (f"{tp}.trans_conv", "conv"),
        f"{tr}/after_norm": (f"{tp}.after_norm", "bn"),
    }


TORCH_SPEC = {
    "conv1": ("conv1", "conv"),
    "bn1": ("bn1", "bn"),
    "conv2": ("conv2", "conv"),
    "bn2": ("bn2", "bn"),
    **_local_spec("gather_local_0", "gather0"),
    **_local_spec("gather_local_1", "gather1"),
    "pt_conv1": ("pt_last.conv1", "conv"),
    "pt_bn1": ("pt_last.bn1", "bn"),
    "pt_conv2": ("pt_last.conv2", "conv"),
    "pt_bn2": ("pt_last.bn2", "bn"),
    **_sa_spec("pt_last.sa1", "sa1"),
    **_sa_spec("pt_last.sa2", "sa2"),
    **_sa_spec("pt_last.sa3", "sa3"),
    **_sa_spec("pt_last.sa4", "sa4"),
    "conv_fuse": ("conv_fuse.0", "conv"),
    "bn_fuse": ("conv_fuse.1", "bn"),
    "linear1": ("linear1", "linear"),
    "bn6": ("bn6", "bn"),
    "linear2": ("linear2", "linear"),
    "bn7": ("bn7", "bn"),
    "linear3": ("linear3", "linear"),
}
