"""PointNet classifier (with spatial/feature transforms) — functional JAX.

Parity surface: reference `model/pointnet_cls.py` + `model/pointnet_utils.py`
(STN3d, STNkd, PointNetEncoder, 512/256/40 head) and the feature-exposing
variant `model/feature_models.py:71-248` used as the default eval victim
(`eval.py:106-109`). Eval-mode only: BN running stats, dropout identity.

Input convention: ``[B, N, C]`` channels-last (C=3, or 6 with normals —
the reference's ``[B, C, N]`` transposed). `apply` returns logits ``[B,
num_classes]``; `apply_full` additionally returns ``trans_feat`` (the 64x64
feature transform, reference tuple convention) and the 8-layer activation
tuple consumed by the LPIPS distance (`model/feature_models.py:131-142`:
stn feats x3, fstn feats x3, conv1 out, conv2 out).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F


class PointNetOutput(NamedTuple):
    logits: jnp.ndarray
    trans_feat: jnp.ndarray
    features: Tuple[jnp.ndarray, ...]


def _stn_init(key: jax.Array, channel: int, k: int) -> Dict:
    """Shared STN3d/STNkd structure: conv 64/128/1024 + fc 512/256/k*k."""
    keys = jax.random.split(key, 6)
    return {
        "conv": F.mlp_init(keys[0], [channel, 64, 128, 1024]),
        "fc1": F.linear_init(keys[1], 1024, 512),
        "bn4": F.batchnorm_init(512),
        "fc2": F.linear_init(keys[2], 512, 256),
        "bn5": F.batchnorm_init(256),
        "fc3": F.linear_init(keys[3], 256, k * k),
    }


def _stn_apply(p: Dict, x: jnp.ndarray, k: int, want_feats: bool = True):
    """x: [B, N, C] -> ([B, k, k] transform, conv feature tuple).

    ``want_feats=False`` (the logits-only attack path) fuses the last
    conv+max via ``F.linear_bn_max`` — valid because relu is monotone:
    ``max_n relu(z) == relu(max_n z)`` — so the [B, N, 1024] STN
    activation never exists. The LPIPS feature path keeps it (tap 3).
    """
    feats = []
    h = x
    last = 3 if want_feats else 2
    for i in range(last):
        h = F.relu(F.linear_bn(p["conv"][f"conv{i}"], p["conv"][f"bn{i}"], h))
        feats.append(h)
    if want_feats:
        g = jnp.max(h, axis=1)                                # [B, 1024]
    else:
        g = F.relu(F.linear_bn_max(p["conv"]["conv2"],
                                   p["conv"]["bn2"], h))      # [B, 1024]
    g = F.relu(F.linear_bn(p["fc1"], p["bn4"], g))
    g = F.relu(F.linear_bn(p["fc2"], p["bn5"], g))
    g = F.linear(p["fc3"], g)                                 # [B, k*k]
    iden = jnp.eye(k, dtype=g.dtype).reshape(1, k * k)
    trans = (g + iden).reshape(-1, k, k)
    return trans, tuple(feats)


def _stn_spec(torch_prefix: str, tree_prefix: str):
    """Torch key map for one STN block (pointnet_utils.STN3d/STNkd)."""
    return {
        f"{tree_prefix}/conv/conv0": (f"{torch_prefix}.conv1", "conv"),
        f"{tree_prefix}/conv/bn0": (f"{torch_prefix}.bn1", "bn"),
        f"{tree_prefix}/conv/conv1": (f"{torch_prefix}.conv2", "conv"),
        f"{tree_prefix}/conv/bn1": (f"{torch_prefix}.bn2", "bn"),
        f"{tree_prefix}/conv/conv2": (f"{torch_prefix}.conv3", "conv"),
        f"{tree_prefix}/conv/bn2": (f"{torch_prefix}.bn3", "bn"),
        f"{tree_prefix}/fc1": (f"{torch_prefix}.fc1", "linear"),
        f"{tree_prefix}/bn4": (f"{torch_prefix}.bn4", "bn"),
        f"{tree_prefix}/fc2": (f"{torch_prefix}.fc2", "linear"),
        f"{tree_prefix}/bn5": (f"{torch_prefix}.bn5", "bn"),
        f"{tree_prefix}/fc3": (f"{torch_prefix}.fc3", "linear"),
    }


# Torch state_dict layout of model/pointnet_cls.get_model and
# model/feature_models.PointNetFeatureModel (identical keys).
TORCH_SPEC = {
    **_stn_spec("feat.stn", "stn"),
    **_stn_spec("feat.fstn", "fstn"),
    "conv1": ("feat.conv1", "conv"),
    "bn1": ("feat.bn1", "bn"),
    "conv2": ("feat.conv2", "conv"),
    "bn2": ("feat.bn2", "bn"),
    "conv3": ("feat.conv3", "conv"),
    "bn3": ("feat.bn3", "bn"),
    "head_fc1": ("fc1", "linear"),
    "head_bn1": ("bn1", "bn"),
    "head_fc2": ("fc2", "linear"),
    "head_bn2": ("bn2", "bn"),
    "head_fc3": ("fc3", "linear"),
}


def init(key: jax.Array, num_classes: int = 40,
         normal_channel: bool = False) -> Dict:
    channel = 6 if normal_channel else 3
    keys = jax.random.split(key, 8)
    return {
        "stn": _stn_init(keys[0], channel, 3),
        "conv1": F.conv1x1_init(keys[1], channel, 64),
        "bn1": F.batchnorm_init(64),
        "fstn": _stn_init(keys[2], 64, 64),
        "conv2": F.conv1x1_init(keys[3], 64, 128),
        "bn2": F.batchnorm_init(128),
        "conv3": F.conv1x1_init(keys[4], 128, 1024),
        "bn3": F.batchnorm_init(1024),
        "head_fc1": F.linear_init(keys[5], 1024, 512),
        "head_bn1": F.batchnorm_init(512),
        "head_fc2": F.linear_init(keys[6], 512, 256),
        "head_bn2": F.batchnorm_init(256),
        "head_fc3": F.linear_init(keys[7], 256, num_classes),
    }


def apply_full(params: Dict, x: jnp.ndarray,
               want_feats: bool = True) -> PointNetOutput:
    """Forward pass. x: [B, N, C] (C=3 or 6)."""
    D = x.shape[-1]
    trans, stn_feats = _stn_apply(params["stn"], x, 3, want_feats)

    if D > 3:
        xyz, extra = x[..., :3], x[..., 3:]
        xyz = jnp.matmul(xyz, trans, preferred_element_type=jnp.float32)
        h = jnp.concatenate([xyz, extra], axis=-1)
        h = F.relu(F.linear_bn(params["conv1"], params["bn1"], h))
    else:
        # STN transform folded into conv1's weight (F.linear_bn_pre):
        # the tile-padded [B, N, 3] transformed cloud never exists.
        h = F.relu(F.linear_bn_pre(params["conv1"], params["bn1"],
                                   trans, x))
    conv1_out = h
    trans_feat, fstn_feats = _stn_apply(params["fstn"], h, 64, want_feats)
    h = F.relu(F.linear_bn_pre(params["conv2"], params["bn2"],
                               trans_feat, h))
    conv2_out = h
    # conv3 + global max-pool, fused on TPU so the [B, N, 1024]
    # activation never exists (see F.linear_bn_max)
    g = F.linear_bn_max(params["conv3"], params["bn3"], h)    # [B, 1024]

    g = F.relu(F.linear_bn(params["head_fc1"], params["head_bn1"], g))
    # reference order: fc2 -> dropout(identity in eval) -> bn -> relu
    g = F.relu(F.linear_bn(params["head_fc2"], params["head_bn2"], g))
    logits = F.linear(params["head_fc3"], g)

    # feature tuple order matches model/feature_models.py:131-142
    features = stn_feats + fstn_feats + (conv1_out, conv2_out)
    return PointNetOutput(logits=logits, trans_feat=trans_feat,
                          features=features)


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Logits-only forward (the attack-facing signature). Skips the
    LPIPS feature taps so the conv+maxpool bottlenecks fuse."""
    return apply_full(params, x, want_feats=False).logits


def features(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """LPIPS activation stack (FeatureModel.features parity)."""
    return apply_full(params, x).features
