"""Shared attack infrastructure: result type, loss selection, Adam.

The hand-rolled Adam here matches torch.optim.Adam's update rule
(lr/betas/eps defaults, no weight decay — the reference always passes
``weight_decay=0.``, e.g. `CW/Perturb.py:84`) and lives inside scan
carries so whole attacks stay on-device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hitadv_tpu.losses import (
    cross_entropy_loss,
    logits_adv_loss,
    untargeted_logits_adv_loss,
)


class AttackResult(NamedTuple):
    """What every attack returns (device arrays; no host sync inside)."""
    adv_points: jnp.ndarray   # [B, N, 3]
    success: jnp.ndarray      # [B] bool — attack-specific success sense
    pred: jnp.ndarray         # [B] final adversarial prediction

    @property
    def success_num(self) -> jnp.ndarray:
        return jnp.sum(self.success)


def make_adv_fn(name: str, kappa: float = 0.0,
                targeted: bool = False) -> Callable:
    """Select the adversarial objective by name.

    Mirrors `eval.py:83-84` ('cross_entropy' | 'logits'); returns a
    per-example ``[B]`` loss.
    """
    if name == "cross_entropy":
        return cross_entropy_loss
    if name == "logits":
        if targeted:
            return lambda lg, t: logits_adv_loss(lg, t, kappa)
        return lambda lg, t: untargeted_logits_adv_loss(lg, t, kappa)
    raise ValueError(f"unknown adv_func {name!r}")


# ---------------------------------------------------------------------------
# Shared CW-engine pieces: best-result bookkeeping + binary search
# ---------------------------------------------------------------------------

class BestState(NamedTuple):
    """Per-example best-so-far record, carried on-device.

    Replaces the reference's host-side python zip loops
    (`CW/Perturb.py:129-141`, `ShapeAttack/HiT_ADV.py:204-217`).
    ``adv`` may be any per-example array (``[B, ...]``).
    """
    dist: jnp.ndarray    # [B]
    score: jnp.ndarray   # [B] int32 (pred at best, -1 = none)
    adv: jnp.ndarray     # [B, ...]

    @classmethod
    def init(cls, template: jnp.ndarray) -> "BestState":
        B = template.shape[0]
        return cls(dist=jnp.full((B,), 1e10),
                   score=jnp.full((B,), -1, jnp.int32),
                   adv=jnp.zeros_like(template))


def update_best(best: BestState, ok: jnp.ndarray, dist: jnp.ndarray,
                pred: jnp.ndarray, adv: jnp.ndarray) -> BestState:
    """Masked `dist < best ∧ ok` update with first/argmin semantics."""
    better = ok & (dist < best.dist)
    expand = better.reshape((-1,) + (1,) * (adv.ndim - 1))
    return BestState(dist=jnp.where(better, dist, best.dist),
                     score=jnp.where(better, pred, best.score),
                     adv=jnp.where(expand, adv, best.adv))


def binary_search_update(found: jnp.ndarray, lower: jnp.ndarray,
                         upper: jnp.ndarray, weight: jnp.ndarray):
    """Per-example weight bisection (`CW/Perturb.py:176-186`)."""
    lower = jnp.where(found, jnp.maximum(lower, weight), lower)
    upper = jnp.where(found, upper, jnp.minimum(upper, weight))
    return lower, upper, (lower + upper) / 2.0


# ---------------------------------------------------------------------------
# Functional Adam (torch.optim.Adam parity)
# ---------------------------------------------------------------------------

class AdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    mu: jnp.ndarray    # first moment (pytree leaf or stacked)
    nu: jnp.ndarray    # second moment


def adam_init(param: jnp.ndarray) -> AdamState:
    return AdamState(step=jnp.zeros((), jnp.int32),
                     mu=jnp.zeros_like(param),
                     nu=jnp.zeros_like(param))


def adam_update(grad: jnp.ndarray, state: AdamState, param: jnp.ndarray,
                lr: float, beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-8) -> Tuple[jnp.ndarray, AdamState]:
    """One torch-style Adam step (bias-corrected)."""
    step = state.step + 1
    mu = beta1 * state.mu + (1.0 - beta1) * grad
    nu = beta2 * state.nu + (1.0 - beta2) * (grad * grad)
    t = step.astype(param.dtype)
    mu_hat = mu / (1.0 - beta1 ** t)
    nu_hat = nu / (1.0 - beta2 ** t)
    new_param = param - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return new_param, AdamState(step=step, mu=mu, nu=nu)
