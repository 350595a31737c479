"""AOF spectral attacks: AOF (untargeted), TAOF (targeted), UAEAOF (+AE).

Parity surface: `CW/AOF.py:12-241`, `CW/TAOF.py`, `CW/UAEAOF.py`:
  * graph construction: kNN-30 mask (self included), symmetrized,
    Gaussian edge weights exp(-|p_i - p_j|²), combinatorial Laplacian
    L = D - A, dense eigendecomposition (`CW/AOF.py:30-51`);
  * cloud split into low/high frequency by projecting coordinates onto
    the first ``low_pass`` eigenvectors (ascending eigenvalues);
  * only the low-frequency component is optimized; the loss mixes the
    full-cloud and lfc-only margins with weight GAMMA (:137-154);
  * after each step: clip(lfc+hfc) then re-project both components onto
    the (fixed) eigenbasis (:158-165) — the hfc drifts via clipping;
  * the "binary_step" loop carries no weight — it is restarts (:103).

TPU notes: ``torch.symeig`` → ``jnp.linalg.eigh`` (both ascending;
eigenvector signs cancel because only projector products V·Vᵀ are used).
The eigh of ``[B, N, N]`` runs once per restart, outside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

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
from hitadv_tpu.ops import geometry as G


@dataclass(frozen=True)
class AOFConfig:
    """Defaults of `CW/AOF.py:57-58`."""
    attack_lr: float = 1e-2
    binary_step: int = 2         # restarts, no weight schedule
    num_iter: int = 200
    gamma: float = 0.5
    low_pass: int = 100
    knn: int = 30
    mode: str = "untargeted"     # untargeted | targeted | ae_untargeted


def graph_laplacian(pc: jnp.ndarray,
                    k: int = 30) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of the kNN-masked Gaussian graph Laplacian.

    pc: ``[B, N, 3]``. Returns (eigvals ``[B, N]`` ascending,
    eigvecs ``[B, N, N]``). Parity: `CW/AOF.py:30-51`.
    """
    B, N, _ = pc.shape
    sq = G.pairwise_distance(pc)                              # [B, N, N]
    idx = G.knn_points(pc, pc, k).idx                         # self incl.
    mask = jnp.zeros((B, N, N), pc.dtype)
    mask = jax.vmap(
        lambda m, i: m.at[
            jnp.repeat(jnp.arange(N), k), i.reshape(-1)].set(1.0)
    )(mask, idx)
    mask = jnp.minimum(mask + jnp.swapaxes(mask, 1, 2), 1.0)
    A = jnp.exp(-sq) * mask
    D = jnp.sum(A, axis=2)
    L = jnp.zeros_like(A).at[
        :, jnp.arange(N), jnp.arange(N)].set(D) - A
    e, v = jnp.linalg.eigh(L)
    return e, v


def make_aof(logits_fn: Callable, adv_fn: Callable,
             clip_fn: Callable,
             cfg: AOFConfig = AOFConfig(),
             ae_fn: Optional[Callable] = None):
    """Build the jitted AOF attack.

    Args:
      logits_fn: victim ``[B, N, 3] -> [B, C]``.
      adv_fn: per-example margin loss (targeted sense for TAOF).
      clip_fn: ``(adv, ori) -> adv`` (the reference uses ClipPointsLinf).
      ae_fn: reconstruction model for UAEAOF (mode="ae_untargeted").
      labels semantics: mode="targeted" expects ``attack(points, target,
      key, y_truth=...)`` with true labels for the lfc bookkeeping
      (`CW/TAOF.py:203`).
    """
    if cfg.mode == "ae_untargeted" and ae_fn is None:
        raise ValueError("ae_untargeted mode requires ae_fn")
    lp = cfg.low_pass

    def spectral_split(adv, V):
        """coords → (lfc, hfc) through the fixed eigenbasis V [B,N,N]."""
        projs = jnp.einsum("bnc,bnm->bmc", adv, V,
                           preferred_element_type=jnp.float32)  # [B,N(m),3]
        lfc = jnp.einsum("bmc,bnm->bnc", projs[:, :lp], V[:, :, :lp],
                         preferred_element_type=jnp.float32)
        hfc = jnp.einsum("bmc,bnm->bnc", projs[:, lp:], V[:, :, lp:],
                         preferred_element_type=jnp.float32)
        return lfc, hfc

    @jax.jit
    def attack(points, labels, key,
               y_truth: Optional[jnp.ndarray] = None) -> AttackResult:
        ori = points[..., :3]
        B, N = ori.shape[0], ori.shape[1]
        truth = labels if y_truth is None else y_truth

        def success_mask(pred, lfc_pred, ae_pred):
            if cfg.mode == "targeted":
                ok = (pred == labels) & (lfc_pred != truth)
            elif cfg.mode == "ae_untargeted":
                ok = ((pred != labels) & (lfc_pred != labels)
                      & (ae_pred != labels))
            else:
                ok = pred != labels
                if cfg.gamma >= 0.001:
                    ok = ok & (lfc_pred != labels)
            return ok

        def restart(carry, step_key):
            o_best, _ = carry
            adv0 = ori + jax.random.normal(step_key, ori.shape) * 1e-7
            _, V = graph_laplacian(adv0, cfg.knn)
            lfc0, hfc0 = spectral_split(adv0, V)

            def inner(carry, _):
                lfc, hfc, opt, o_best = carry

                def loss_fn(lfc):
                    full_logits = logits_fn(lfc + hfc)
                    l = (1.0 - cfg.gamma) * jnp.mean(
                        adv_fn(full_logits, labels))
                    lfc_logits = logits_fn(lfc)
                    l = l + cfg.gamma * jnp.mean(adv_fn(lfc_logits,
                                                        labels))
                    return l

                grad = jax.grad(loss_fn)(lfc)
                lfc, opt = adam_update(grad, opt, lfc, cfg.attack_lr)

                # clip in coordinate space, re-project (:158-165)
                adv = clip_fn(lfc + hfc, ori)
                lfc, hfc = spectral_split(adv, V)
                adv = lfc + hfc

                pred = jnp.argmax(logits_fn(adv), axis=-1)
                lfc_pred = jnp.argmax(logits_fn(lfc), axis=-1)
                if cfg.mode == "ae_untargeted":
                    ae_pred = jnp.argmax(logits_fn(ae_fn(adv)), axis=-1)
                else:
                    ae_pred = pred
                dist = jnp.sqrt(jnp.sum((adv - ori) ** 2, axis=(1, 2)))
                ok = success_mask(pred, lfc_pred, ae_pred)
                o_best = update_best(o_best, ok, dist, pred, adv)
                return (lfc, hfc, opt, o_best), adv

            (lfc, hfc, _, o_best), advs = lax.scan(
                inner, (lfc0, hfc0, adam_init(lfc0), o_best), None,
                length=cfg.num_iter)
            return (o_best, advs[-1]), ()

        step_keys = jax.random.split(key, cfg.binary_step)
        init = (BestState.init(ori), jnp.zeros_like(ori))
        (o_best, last_adv), _ = lax.scan(restart, init, step_keys)

        # failures fall back to the last iterate, then a final clip (:224-231)
        found = o_best.score >= 0
        adv_final = jnp.where(found[:, None, None], o_best.adv,
                              last_adv)
        adv_final = clip_fn(adv_final, ori)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        success = ((pred == labels) if cfg.mode == "targeted"
                   else (pred != labels))
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack
