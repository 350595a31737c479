"""GeoA3 attack: geometry-aware adversarial objective (CVPR'20 GeoA³).

The reference repo ships GeoA3's full supporting cast — the argument set
(`FGM/GeoA3_args.py:35-110`), the loss zoo (:113-425), the victim
(`model/GeoA3_PN.py`) and the dataset (`Dataset/GeoA3_ModelNet.py`) —
but not the attack loop itself. This engine completes it, composing
those pieces exactly as the args describe:

    loss = cls_loss(logits, target)
         + scale_const * ( dis_loss_weight  * Chamfer        (CD default)
                         + hd_loss_weight   * Hausdorff (0.1)
                         + curv_loss_weight * curvature (1.0, kappa via
                                              nearest-clean normals) )

with the CW-style outer binary search (`binary_max_steps=10`,
`initial_const=10`), Adam (`lr=0.01`), `iter_max_steps=500`, optional
Linf projection (`cc_linf`) and pre-iteration jitter
(`is_pre_jitter_input`). Fully scanned: one XLA program.
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
    binary_search_update,
    make_adv_fn,
    update_best,
)
from hitadv_tpu.losses import clip_points_linf
from hitadv_tpu.losses.distance import get_kappa, get_kappa_adv
from hitadv_tpu.losses.geoa3 import (
    chamfer_loss,
    curvature_loss,
    hausdorff_loss,
    jitter_input,
)


@dataclass(frozen=True)
class GeoA3Config:
    """Defaults of `FGM/GeoA3_args.py:50-95`."""
    attack_lr: float = 0.01
    binary_max_steps: int = 10
    initial_const: float = 10.0
    max_const: float = 80.0          # binary-search ceiling (CW convention)
    iter_max_steps: int = 500
    cls_loss_type: str = "cross_entropy"   # CE | logits (Margin)
    confidence: float = 0.0
    dis_loss_weight: float = 1.0
    is_cd_single_side: bool = False
    hd_loss_weight: float = 0.1
    curv_loss_weight: float = 1.0
    curv_loss_knn: int = 16
    cc_linf: float = 0.0             # 0 = no Linf projection
    is_pre_jitter_input: bool = False
    jitter_k: int = 16
    jitter_sigma: float = 0.01
    jitter_clip: float = 0.05
    targeted: bool = True            # attack_label All/<class> modes


def make_geoa3(logits_fn: Callable,
               cfg: GeoA3Config = GeoA3Config()):
    """Build the jitted GeoA3 attack.

    ``attack(points [B, N, 6], labels, key)`` — normals required for the
    curvature term; ``labels`` are target classes when cfg.targeted.
    """
    adv_fn = make_adv_fn(
        "logits" if cfg.cls_loss_type.lower() in ("margin", "logits")
        else "cross_entropy",
        kappa=cfg.confidence, targeted=cfg.targeted)

    def dist_terms(adv, ori, ori_normal, ori_kappa):
        d = jnp.zeros((adv.shape[0],), adv.dtype)
        if cfg.dis_loss_weight != 0:
            cd = chamfer_loss(adv, ori)
            if cfg.is_cd_single_side:
                from hitadv_tpu.losses.geoa3 import pseudo_chamfer_loss

                cd = pseudo_chamfer_loss(adv, ori)
            d = d + cfg.dis_loss_weight * cd
        if cfg.hd_loss_weight != 0:
            d = d + cfg.hd_loss_weight * hausdorff_loss(adv, ori)
        if cfg.curv_loss_weight != 0:
            adv_kappa, _ = get_kappa_adv(adv, ori, ori_normal,
                                         cfg.curv_loss_knn)
            d = d + cfg.curv_loss_weight * curvature_loss(
                adv, ori, adv_kappa, ori_kappa)
        return d

    @jax.jit
    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        normal = points[..., 3:6]
        B = ori.shape[0]
        ori_kappa = get_kappa(ori, normal, cfg.curv_loss_knn)

        def success_of(pred):
            return (pred == labels) if cfg.targeted else (pred != labels)

        def inner_iter(carry, it_key):
            adv, opt, weight, best, o_best = carry

            run_adv = adv
            if cfg.is_pre_jitter_input:
                run_adv = adv + jitter_input(it_key, adv.shape,
                                             cfg.jitter_sigma,
                                             cfg.jitter_clip)

            def loss_fn(adv_in):
                logits = logits_fn(adv_in)
                cls = adv_fn(logits, labels)                  # [B]
                dist = dist_terms(adv_in, ori, normal, ori_kappa)
                return jnp.mean(cls + weight * dist), (logits, dist)

            (_, (logits, dist_val)), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(run_adv)
            pred = jnp.argmax(logits, axis=-1)

            ok = success_of(pred)
            best = update_best(best, ok, dist_val, pred, adv)
            o_best = update_best(o_best, ok, dist_val, pred, adv)

            adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
            if cfg.cc_linf > 0:
                adv = clip_points_linf(adv, ori, cfg.cc_linf)
            return (adv, opt, weight, best, o_best), ()

        def binary_step(carry, step_key):
            lower, upper, weight, o_best, _ = carry
            k0, k1 = jax.random.split(step_key)
            adv0 = ori + jax.random.normal(k0, ori.shape) * 1e-7
            it_keys = jax.random.split(k1, cfg.iter_max_steps)
            inner0 = (adv0, adam_init(adv0), weight,
                      BestState.init(ori), o_best)
            (adv, _, _, best, o_best), _ = lax.scan(inner_iter, inner0,
                                                    it_keys)

            found = success_of(best.score) & (best.score != -1) \
                & (best.dist <= o_best.dist)
            lower, upper, weight = binary_search_update(found, lower,
                                                        upper, weight)
            return (lower, upper, weight, o_best, adv), ()

        step_keys = jax.random.split(key, cfg.binary_max_steps)
        init = (jnp.zeros((B,)), jnp.full((B,), cfg.max_const),
                jnp.full((B,), cfg.initial_const),
                BestState.init(ori), jnp.zeros_like(ori))
        (lower, _, _, o_best, last_adv), _ = \
            lax.scan(binary_step, init, step_keys)

        success = lower > 0.0
        adv_final = jnp.where(success[:, None, None], o_best.adv,
                              last_adv)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack
