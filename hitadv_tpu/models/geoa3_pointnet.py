"""GeoA3's PointNet variant (torch-0.3-era) — functional JAX.

Parity surface: `model/GeoA3_PN.py:61-189`: two K=3/K=64 transform nets
(BN eps 1e-3, fc3 initialized to the identity transform), conv stack
64/64/64/128 with a final *kernel-3* conv to 1024 (`GeoA3_PN.py:120`),
max pool, 512/256/classes head (BN eps default there). Eval-mode
(dropout off); returns logits, or ``(logits, argmax idx)`` via
`apply_full` (the reference's ``return_idx``).

Consumed by the GeoA3 .mat pipeline (`Dataset/GeoA3_ModelNet.py`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F

_EPS = 1e-3


def _transform_init(key: jax.Array, K: int) -> Dict:
    keys = jax.random.split(key, 6)
    p = {
        "conv1": F.conv1x1_init(keys[0], K, 64),
        "bn1": F.batchnorm_init(64),
        "conv2": F.conv1x1_init(keys[1], 64, 128),
        "bn2": F.batchnorm_init(128),
        "conv3": F.conv1x1_init(keys[2], 128, 1024),
        "bn3": F.batchnorm_init(1024),
        "fc1": F.linear_init(keys[3], 1024, 512),
        "bn4": F.batchnorm_init(512),
        "fc2": F.linear_init(keys[4], 512, 256),
        "bn5": F.batchnorm_init(256),
        "fc3": F.linear_init(keys[5], 256, K * K),
    }
    # reference init: fc3 weight zero, bias = identity (GeoA3_PN.py:98-100)
    p["fc3"]["w"] = jnp.zeros_like(p["fc3"]["w"])
    p["fc3"]["b"] = jnp.eye(K).reshape(-1)
    return p


def _transform_apply(p: Dict, x: jnp.ndarray, K: int) -> jnp.ndarray:
    h = F.relu(F.linear_bn(p["conv1"], p["bn1"], x, eps=_EPS))
    h = F.relu(F.linear_bn(p["conv2"], p["bn2"], h, eps=_EPS))
    h = F.relu(F.linear_bn(p["conv3"], p["bn3"], h, eps=_EPS))
    g = jnp.max(h, axis=1)
    g = F.relu(F.linear_bn(p["fc1"], p["bn4"], g, eps=_EPS))
    g = F.relu(F.linear_bn(p["fc2"], p["bn5"], g, eps=_EPS))
    return F.linear(p["fc3"], g).reshape(-1, K, K)


def init(key: jax.Array, num_classes: int = 40) -> Dict:
    keys = jax.random.split(key, 10)
    return {
        "input_transform": _transform_init(keys[0], 3),
        "feature_transform": _transform_init(keys[1], 64),
        "conv1": F.conv1x1_init(keys[2], 3, 64),
        "bn1": F.batchnorm_init(64),
        "conv2": F.conv1x1_init(keys[3], 64, 64),
        "bn2": F.batchnorm_init(64),
        "conv3": F.conv1x1_init(keys[4], 64, 64),
        "bn3": F.batchnorm_init(64),
        "conv4": F.conv1x1_init(keys[5], 64, 128),
        "bn4": F.batchnorm_init(128),
        "conv5": F.conv1d_init(keys[6], 128, 1024, kernel_size=3),
        "bn5": F.batchnorm_init(1024),
        "fc1": F.linear_init(keys[7], 1024, 512),
        "bn6": F.batchnorm_init(512),
        "fc2": F.linear_init(keys[8], 512, 256),
        "bn7": F.batchnorm_init(256),
        "fc3": F.linear_init(keys[9], 256, num_classes),
    }


def apply_full(params: Dict, x: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, N, 3] -> (logits, per-channel argmax point idx)."""
    trans = _transform_apply(params["input_transform"], x, 3)
    # transform folded into the following conv weight (F.linear_bn_pre):
    # the tile-padded [B, N, 3] transformed cloud never exists.
    h = F.relu(F.linear_bn_pre(params["conv1"], params["bn1"],
                               trans, x, eps=_EPS))
    h = F.relu(F.linear_bn(params["conv2"], params["bn2"], h, eps=_EPS))
    ftrans = _transform_apply(params["feature_transform"], h, 64)
    h = F.relu(F.linear_bn_pre(params["conv3"], params["bn3"],
                               ftrans, h, eps=_EPS))
    h = F.relu(F.linear_bn(params["conv4"], params["bn4"], h, eps=_EPS))
    h = F.relu(F.batchnorm(params["bn5"], F.conv1d(params["conv5"], h),
                           eps=_EPS))
    g = jnp.max(h, axis=1)                                    # [B, 1024]
    idx = jnp.argmax(h, axis=1)                               # [B, 1024]
    g = F.relu(F.linear_bn(params["fc1"], params["bn6"], g))
    g = F.relu(F.linear_bn(params["fc2"], params["bn7"], g))
    return F.linear(params["fc3"], g), idx


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return apply_full(params, x)[0]


def _transform_spec(tp, tr):
    return {
        **{f"{tr}/conv{i}": (f"{tp}.conv{i}", "conv") for i in (1, 2, 3)},
        **{f"{tr}/bn{i}": (f"{tp}.bn{i}", "bn") for i in (1, 2, 3, 4, 5)},
        **{f"{tr}/fc{i}": (f"{tp}.fc{i}", "linear") for i in (1, 2, 3)},
    }


TORCH_SPEC = {
    **_transform_spec("input_transform", "input_transform"),
    **_transform_spec("feature_transform", "feature_transform"),
    **{f"conv{i}": (f"conv{i}", "conv") for i in (1, 2, 3, 4)},
    "conv5": ("conv5", "conv1d"),
    **{f"bn{i}": (f"bn{i}", "bn") for i in (1, 2, 3, 4, 5, 6, 7)},
    **{f"fc{i}": (f"fc{i}", "linear") for i in (1, 2, 3)},
}
