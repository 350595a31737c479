"""Victim model zoo (L2): functional JAX classifiers, eval-mode only.

Registry mirrors the reference's model choices (`eval.py:44,105-120`):
pointnet | pointnet++ | dgcnn | pct | pointconv (+ the feature-exposing
PointNet used for LPIPS). Each module exposes ``init(key, ...) -> params``
and ``apply(params, x) -> logits`` with ``x: [B, N, C]`` channels-last.
"""

from typing import Any, Callable, Dict, Tuple

from hitadv_tpu.models import (  # noqa: F401
    autoencoder,
    dgcnn,
    geoa3_pointnet,
    pct,
    pointconv,
    pointnet,
    pointnet2,
)

# name -> (init, apply); extended as model families land.
_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    "pointnet": (pointnet.init, pointnet.apply),
    "pointnet++": (pointnet2.init, pointnet2.apply),
    "dgcnn": (dgcnn.init, dgcnn.apply),
    "pct": (pct.init, pct.apply),
    "pointconv": (pointconv.init, pointconv.apply),
    "geoa3_pointnet": (geoa3_pointnet.init, geoa3_pointnet.apply),
}


def register(name: str, init_fn: Callable, apply_fn: Callable) -> None:
    _REGISTRY[name] = (init_fn, apply_fn)


def get_model(name: str) -> Tuple[Callable, Callable]:
    """Return (init, apply) for a registered victim family."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available() -> list:
    return sorted(_REGISTRY)
