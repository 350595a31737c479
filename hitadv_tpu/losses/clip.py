"""Perturbation clipping / projection ops.

Parity surface: reference `util/clip_utils.py` (ClipPointsL2,
ClipPointsLinf, ProjectInnerPoints, ProjectInnerClipLinf). Clouds are
``[B, N, 3]``; all functions are pure — the reference's ``torch.no_grad``
blocks become ``lax.stop_gradient`` at the call sites that need it (the
attacks apply clips to optimizer state, outside the differentiated graph).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def clip_points_l2(pc: jnp.ndarray, ori_pc: jnp.ndarray,
                   budget: float) -> jnp.ndarray:
    """Rescale the whole perturbation into a global L2 ball.

    Parity: `util/clip_utils.py:5-31`.
    """
    diff = pc - ori_pc
    norm = jnp.sqrt(jnp.sum(diff ** 2, axis=(1, 2)))          # [B]
    scale = jnp.minimum(budget / (norm + 1e-9), 1.0)
    return ori_pc + diff * scale[:, None, None]


def clip_points_linf(pc: jnp.ndarray, ori_pc: jnp.ndarray,
                     budget: float) -> jnp.ndarray:
    """Per-coordinate clamp of the perturbation.

    Parity: `util/clip_utils.py:63-86` (the active Linf variant).
    """
    pert = jnp.clip(pc - ori_pc, -budget, budget)
    return ori_pc + pert


def project_inner_points(pc: jnp.ndarray, ori_pc: jnp.ndarray,
                         normal: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Project points pushed inside the surface back onto it.

    AAAI'20 projection; parity: `util/clip_utils.py:90-140`. A point is
    "inner" when its perturbation opposes the surface normal; its
    perturbation is replaced by the tangential component via two cross
    products. Perturbations exactly anti-parallel to the normal are zeroed.
    """
    if normal is None:
        return pc
    diff = pc - ori_pc                                        # [B, N, 3]
    inner_dot = jnp.sum(diff * normal, axis=-1)               # [B, N]
    inner_mask = inner_dot < 0.0

    vng = jnp.cross(normal, diff)                             # [B, N, 3]
    vng_norm = jnp.linalg.norm(vng, axis=-1)                  # [B, N]
    vref = jnp.cross(vng, normal)                             # [B, N, 3]
    vref_norm = jnp.linalg.norm(vref, axis=-1)

    # NOTE: parity with the reference's elementwise `diff * vref / |vref|`
    # (`util/clip_utils.py:122-124`) — a Hadamard product, not the scalar
    # projection its comment describes. ASR parity requires the code.
    diff_proj = diff * vref / (vref_norm[..., None] + 1e-9)

    opposite = inner_mask & (vng_norm < 1e-6)
    diff_proj = jnp.where(opposite[..., None], 0.0, diff_proj)
    new_diff = jnp.where(inner_mask[..., None], diff_proj, diff)
    return ori_pc + new_diff


def project_inner_clip_linf(pc: jnp.ndarray, ori_pc: jnp.ndarray,
                            budget: float,
                            normal: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Project inner points, then Linf-clip. Parity: `util/clip_utils.py:143-170`."""
    pc = project_inner_points(pc, ori_pc, normal)
    return clip_points_linf(pc, ori_pc, budget)
