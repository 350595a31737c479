"""AdvPC attacks: autoencoder-regularized CW perturbation.

Parity surface: `CW/AdvPC.py:10-180` (targeted) and `CW/UAdvPC.py:10-167`
(untargeted): per iteration two margin losses — on the adversarial cloud
and on its AE reconstruction — GAMMA-mixed; clip each step; best-result
bookkeeping with the AdvPC success senses:
  * targeted (`CW/AdvPC.py:142`): pred == target ∧ ae_pred != y_truth;
  * untargeted (`CW/UAdvPC.py:111,129`): pred != label ∧ ae_pred != label.
The binary_step loop is restarts (no weight schedule), like AOF.

Bookkeeping quirk: the targeted loop recomputes predictions on the
POST-step clipped cloud under no_grad (`CW/AdvPC.py:111-124`), but the
untargeted loop reuses the PRE-step forward logits and pairs them with
the post-step clipped coordinates (`CW/UAdvPC.py:103-132`) — and adds a
``GAMMA < 0.001`` escape that drops the AE condition entirely.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.attacks.base import (
    AttackResult,
    BestState,
    adam_init,
    adam_update,
    update_best,
)


@dataclass(frozen=True)
class AdvPCConfig:
    """Defaults of `CW/AdvPC.py:15-16`."""
    attack_lr: float = 1e-2
    binary_step: int = 2
    num_iter: int = 200
    gamma: float = 0.5
    targeted: bool = False


def make_advpc(logits_fn: Callable, ae_fn: Callable, adv_fn: Callable,
               clip_fn: Callable,
               cfg: AdvPCConfig = AdvPCConfig(),
               *, init_overrides=None):
    """Build the jitted AdvPC attack.

    Args:
      logits_fn: victim ``[B, N, 3] -> [B, C]``.
      ae_fn: autoencoder ``[B, N, 3] -> [B, N, 3]``.
      adv_fn: per-example margin loss (matching cfg.targeted).
      clip_fn: ``(adv, ori) -> adv``.
      init_overrides: optional ``{"noise": [S, B, N, 3]}`` pinning the
        per-restart 1e-7 init noise (`CW/AdvPC.py:63-64`) for
        trajectory-parity testing.
    The targeted variant takes true labels via ``y_truth``.
    """
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v)
                          for k, v in init_overrides.items()}

    @jax.jit
    def attack(points, labels, key,
               y_truth: Optional[jnp.ndarray] = None) -> AttackResult:
        ori = points[..., :3]
        B = ori.shape[0]
        truth = labels if y_truth is None else y_truth

        def restart(carry, step_in):
            step_key, step_idx = step_in
            o_best, _ = carry
            if init_overrides is not None:
                adv0 = ori + init_overrides["noise"][step_idx]
            else:
                adv0 = ori + jax.random.normal(step_key,
                                               ori.shape) * 1e-7

            def inner(carry, _):
                adv, opt, o_best = carry

                def loss_fn(adv):
                    logits = logits_fn(adv)
                    ae_logits = logits_fn(ae_fn(adv))
                    l = (1.0 - cfg.gamma) * jnp.mean(
                        adv_fn(logits, labels))
                    l = l + cfg.gamma * jnp.mean(
                        adv_fn(ae_logits, labels))
                    return l, (logits, ae_logits)

                grad, stale = jax.grad(loss_fn, has_aux=True)(adv)
                adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
                adv = clip_fn(adv, ori)

                dist = jnp.sqrt(jnp.sum((adv - ori) ** 2, axis=(1, 2)))
                if cfg.targeted:
                    # fresh post-step recompute (`CW/AdvPC.py:111-124`)
                    pred = jnp.argmax(logits_fn(adv), axis=-1)
                    ae_pred = jnp.argmax(logits_fn(ae_fn(adv)), axis=-1)
                    ok = (pred == labels) & (ae_pred != truth)
                else:
                    # stale PRE-step logits paired with post-step coords
                    # (`CW/UAdvPC.py:109-132`)
                    pred = jnp.argmax(stale[0], axis=-1)
                    ae_pred = jnp.argmax(stale[1], axis=-1)
                    ok = pred != labels
                    if cfg.gamma >= 0.001:   # GAMMA escape (:129)
                        ok = ok & (ae_pred != labels)
                o_best = update_best(o_best, ok, dist, pred, adv)
                return (adv, opt, o_best), ()

            (adv, _, o_best), _ = lax.scan(
                inner, (adv0, adam_init(adv0), o_best), None,
                length=cfg.num_iter)
            return (o_best, adv), ()

        step_keys = (jax.random.split(key, cfg.binary_step),
                     jnp.arange(cfg.binary_step))
        init = (BestState.init(ori), jnp.zeros_like(ori))
        (o_best, last_adv), _ = lax.scan(restart, init, step_keys)

        found = o_best.score >= 0
        adv_final = jnp.where(found[:, None, None], o_best.adv,
                              last_adv)
        adv_final = clip_fn(adv_final, ori)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        success = ((pred == labels) if cfg.targeted
                   else (pred != labels))
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack
