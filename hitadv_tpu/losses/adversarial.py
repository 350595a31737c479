"""Adversarial objective functions.

Parity surface: reference `util/adv_utils.py:6-85` (LogitsAdvLoss,
UntargetedLogitsAdvLoss, CrossEntropyAdvLoss). Unlike the reference's
nn.Modules these return per-example ``[B]`` losses; callers decide how to
reduce (the reference always `.mean()`s immediately after — e.g.
`CW/Perturb.py:147`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _margin_parts(logits: jnp.ndarray, targets: jnp.ndarray):
    """CW-margin ingredients: target logit and max-other logit.

    Reproduces the one-hot ``±10000`` masking trick of
    `util/adv_utils.py:29-33` (the -10000 ensures the target class never
    wins the "other" max).
    """
    logits = logits.astype(jnp.float32)  # robust under bf16 victims
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=logits.dtype)
    real = jnp.sum(one_hot * logits, axis=-1)                 # [B]
    other = jnp.max((1.0 - one_hot) * logits - one_hot * 10000.0, axis=-1)
    return real, other


def logits_adv_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                    kappa: float = 0.0) -> jnp.ndarray:
    """Targeted CW margin: ``max(other - target + kappa, 0)``.

    Parity: `util/adv_utils.py:6-35`.
    """
    real, other = _margin_parts(logits, targets)
    return jnp.maximum(other - real + kappa, 0.0)


def untargeted_logits_adv_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                               kappa: float = 0.0) -> jnp.ndarray:
    """Untargeted CW margin: ``max(true - other + kappa, 0)``.

    Parity: `util/adv_utils.py:38-67`.
    """
    real, other = _margin_parts(logits, targets)
    return jnp.maximum(real - other + kappa, 0.0)


def cross_entropy_loss(logits: jnp.ndarray,
                       targets: jnp.ndarray) -> jnp.ndarray:
    """Per-example cross-entropy. Parity: `util/adv_utils.py:70-85`."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


def smoothed_cross_entropy_loss(logits: jnp.ndarray,
                                targets: jnp.ndarray,
                                eps: float = 0.2) -> jnp.ndarray:
    """Label-smoothed CE (the DGCNN/PCT training loss).

    Parity: `model/pct_utils.py:6-24` (cal_loss, smoothing=True):
    one-hot*(1-eps) + eps/(K-1) on the off-classes.
    """
    logits = logits.astype(jnp.float32)
    K = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, K)
    soft = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (K - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(soft * logp, axis=-1)
