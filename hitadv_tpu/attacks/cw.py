"""CW optimization attacks: binary-search perturbation + kNN variants.

Parity surface:
  * `CW/Perturb.py:13-202` (CWPerturb, targeted) and `CW/PerturbT.py`
    (same skeleton) — outer binary search over per-example weights,
    inner Adam loop, per-iteration best-result bookkeeping, fallback to
    the last iterate for failures.
  * `CW/kNN.py:14-151` (CWKNN, targeted) / `CW/UKNN.py:14-159` (CWUKNN,
    untargeted with normals-aware clip) — no binary search, 2500 Adam
    iters, dist loss scaled by K, clip+project every iteration.

TPU design (SURVEY.md §7 principle 1): the whole attack is ONE XLA
program — ``lax.scan`` over binary steps, nested ``lax.scan`` over Adam
iterations, bookkeeping as masked ``where`` updates carried on-device.
The reference's per-iteration ``.cpu().numpy()`` sync (`CW/Perturb.py:
122-126`) disappears entirely.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.attacks.base import (
    AdamState,
    AttackResult,
    BestState,
    adam_init,
    adam_update,
    binary_search_update,
    update_best,
)
from hitadv_tpu.losses import l2_dist


@dataclass(frozen=True)
class CWConfig:
    """Hyperparameters of record (`FGM/CWPert_args.py:34-44`)."""
    attack_lr: float = 1e-2
    init_weight: float = 10.0
    max_weight: float = 80.0
    binary_step: int = 10
    num_iter: int = 100
    targeted: bool = True        # CWPerturb bookkeeping: pred == target


def make_cw_perturb(logits_fn: Callable, adv_fn: Callable,
                    dist_fn: Optional[Callable] = None,
                    cfg: CWConfig = CWConfig(),
                    clip_fn: Optional[Callable] = None,
                    *, init_overrides=None):
    """CW perturbation attack with binary search.

    Args:
      logits_fn: victim ``[B, N, 3] -> [B, C]``.
      adv_fn: per-example adversarial loss ``(logits, target) -> [B]``.
      dist_fn: ``(adv, ori) -> [B]`` distance (default global L2,
        matching `eval.py`'s L2Dist choice for CWPerturb).
      clip_fn: optional ``(adv, ori) -> adv`` applied after each step.
      init_overrides: optional ``{"noise": [S, B, N, 3]}`` pinning the
        per-binary-step 1e-7 init noise (`CW/Perturb.py:79-80`) for
        trajectory-parity testing — the noise *direction* sets the
        iteration-0 L2-dist gradient, so cross-framework comparison
        needs identical draws.
    """
    if dist_fn is None:
        dist_fn = l2_dist
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v)
                          for k, v in init_overrides.items()}

    def success_of(pred, target):
        return (pred == target) if cfg.targeted else (pred != target)

    @jax.jit
    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        B, N = ori.shape[0], ori.shape[1]

        def inner_iter(carry, _):
            adv, opt, weight, best, o_best = carry

            def loss_fn(adv):
                logits = logits_fn(adv)
                al = jnp.mean(adv_fn(logits, labels))
                dl = jnp.mean(dist_fn(adv, ori) * weight)
                return al + dl, logits

            (_, logits), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(adv)
            pred = jnp.argmax(logits, axis=-1)

            # bookkeeping BEFORE the step, reference order
            # (`CW/Perturb.py:122-141`): dist/pred of the current iterate.
            dist_val = jnp.sqrt(jnp.sum((adv - ori) ** 2, axis=(1, 2)))
            ok = success_of(pred, labels)
            best = update_best(best, ok, dist_val, pred, adv)
            o_best = update_best(o_best, ok, dist_val, pred, adv)

            adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
            if clip_fn is not None:
                adv = clip_fn(adv, ori)
            return (adv, opt, weight, best, o_best), ()

        def binary_step(carry, step_in):
            step_key, step_idx = step_in
            lower, upper, weight, o_best, _ = carry
            if init_overrides is not None:
                adv0 = ori + init_overrides["noise"][step_idx]
            else:
                adv0 = ori + jax.random.normal(step_key, ori.shape) * 1e-7
            inner0 = (adv0, adam_init(adv0), weight,
                      BestState.init(ori), o_best)
            (adv, _, _, best, o_best), _ = lax.scan(
                inner_iter, inner0, None, length=cfg.num_iter)

            # binary search weight update (`CW/Perturb.py:176-186`)
            found = success_of(best.score, labels) & (best.score != -1) \
                & (best.dist <= o_best.dist)
            lower, upper, weight = binary_search_update(found, lower,
                                                        upper, weight)
            return (lower, upper, weight, o_best, adv), ()

        step_keys = jax.random.split(key, cfg.binary_step)
        init = (jnp.zeros((B,)), jnp.full((B,), cfg.max_weight),
                jnp.full((B,), cfg.init_weight),
                BestState.init(ori), jnp.zeros_like(ori))
        (lower, _, _, o_best, last_adv), _ = lax.scan(
            binary_step, init,
            (step_keys, jnp.arange(cfg.binary_step)))

        # failures fall back to the last iterate (`CW/Perturb.py:191-196`)
        success = lower > 0.0
        adv_final = jnp.where(success[:, None, None], o_best.adv,
                              last_adv)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack


@dataclass(frozen=True)
class CWKNNConfig:
    """Defaults of `CW/kNN.py:19-20`."""
    attack_lr: float = 1e-3
    num_iter: int = 2500
    targeted: bool = True       # CWKNN: pred == target; CWUKNN: !=


def make_cw_knn(logits_fn: Callable, adv_fn: Callable,
                dist_fn: Callable,
                clip_fn: Optional[Callable] = None,
                cfg: CWKNNConfig = CWKNNConfig()):
    """CWKNN / CWUKNN: plain Adam descent with per-iter clip+project.

    ``dist_fn(adv, ori) -> [B]`` is typically `chamfer_knn_dist`
    (ChamferkNNDist of `util/dist_utils.py:258-294`); the mean dist loss
    is scaled by K, matching the reference's sum-convention note
    (`CW/kNN.py:103-107`). ``clip_fn(adv, ori, normal)`` receives the
    normals (may ignore them) — the CWUKNN convention (`CW/UKNN.py:121`).
    """
    @jax.jit
    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        normal = points[..., 3:6] if points.shape[-1] >= 6 else None
        B, N = ori.shape[0], ori.shape[1]

        adv0 = ori + jax.random.normal(key, ori.shape) * 1e-7

        def body(carry, _):
            adv, opt = carry

            def loss_fn(adv):
                logits = logits_fn(adv)
                al = jnp.mean(adv_fn(logits, labels))
                dl = jnp.mean(dist_fn(adv, ori)) * N
                return al + dl

            grad = jax.grad(loss_fn)(adv)
            adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
            if clip_fn is not None:
                adv = clip_fn(adv, ori, normal)
            return (adv, opt), ()

        (adv, _), _ = lax.scan(body, (adv0, adam_init(adv0)), None,
                               length=cfg.num_iter)
        pred = jnp.argmax(logits_fn(adv), axis=-1)
        success = (pred == labels) if cfg.targeted else (pred != labels)
        return AttackResult(adv_points=adv, success=success, pred=pred)

    return attack
