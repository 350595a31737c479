"""SaliencyDrop: iteratively delete the highest-saliency points.

Parity surface: `Saliency/Drop.py:12-166` (ICCV'19 saliency maps):
per round compute the CE gradient, score each point by
``-r^alpha · <p - center, grad>`` with the coordinate-wise median as
center, and remove the top-k; repeat until ``num_drop`` points are gone.
Also provides ``sat_forward`` (drop + FGM hybrid, :115-165).

TPU design (SURVEY.md §7 principle 3): the reference physically shrinks
the cloud each round (dynamic shapes). Here shapes stay static: dropped
points are *collapsed onto a surviving point* — for max-pool victims
(the entire zoo) a duplicated point is semantically identical to a
removed one — and their saliency is masked to -inf so they are never
re-selected. The final result gathers the ``N - num_drop`` survivors
into a compact static-shape cloud.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.attacks.base import AttackResult
from hitadv_tpu.losses import cross_entropy_loss
from hitadv_tpu.ops import geometry as G


@dataclass(frozen=True)
class DropConfig:
    num_drop: int = 200
    alpha: float = 1.0
    k: int = 5                    # points dropped per round


def _saliency(logits_fn, pc, labels, alpha):
    """[B, N] saliency scores. Parity: `Saliency/Drop.py:82-92`."""
    grad = jax.grad(
        lambda x: jnp.mean(cross_entropy_loss(logits_fn(x), labels)))(pc)
    center = G.median_points(pc, axis=1)                      # [B, 3]
    offset = pc - center[:, None, :]
    r = jnp.sqrt(jnp.sum(offset ** 2, axis=-1))               # [B, N]
    return -(r ** alpha) * jnp.sum(offset * grad, axis=-1)


def make_saliency_drop(logits_fn: Callable,
                       cfg: DropConfig = DropConfig()):
    """Build the jitted dropping attack.

    Returns ``attack(points, labels, key=None) -> AttackResult`` whose
    ``adv_points`` is the compact ``[B, N - num_drop, 3]`` cloud.
    """
    num_rounds = -(-cfg.num_drop // cfg.k)                    # ceil

    @jax.jit
    def attack(points, labels, key=None) -> AttackResult:
        ori = points[..., :3]
        B, N, _ = ori.shape
        b_iota = jnp.arange(B)

        def round_body(i, alive):
            k = jnp.minimum(cfg.k, cfg.num_drop - i * cfg.k)
            n_alive = N - jnp.minimum(i * cfg.k, cfg.num_drop)

            # collapse every dead point onto the first survivor so the
            # max-pool victim sees exactly the survivor SET (duplicate
            # == deleted for max pooling)
            first_alive = jnp.argmax(alive, axis=1)           # [B]
            anchor = jnp.take_along_axis(
                ori, first_alive[:, None, None], axis=1)      # [B, 1, 3]
            pc = jnp.where(alive[..., None], ori, anchor)

            grad = jax.grad(lambda x: jnp.mean(
                cross_entropy_loss(logits_fn(x), labels)))(pc)
            # the anchor's true gradient is the TOTAL over all of its
            # coincident copies (max-tie conventions conserve the sum);
            # redirect the dead copies' shares back onto the anchor so
            # its saliency matches the reference's shrunk-cloud run
            dead_g = jnp.sum(jnp.where(alive[..., None], 0.0, grad),
                             axis=1)                          # [B, 3]
            grad = grad.at[b_iota, first_alive].add(dead_g)

            # reference medians the SHRUNK cloud (`Drop.py:83-84`):
            # masked median = (n_alive-1)//2-th order statistic of the
            # survivors (torch lower-middle convention)
            med_idx = (n_alive - 1) // 2
            sorted_alive = jnp.sort(
                jnp.where(alive[..., None], ori, jnp.inf), axis=1)
            center = jnp.take_along_axis(
                sorted_alive,
                jnp.broadcast_to(med_idx, (B, 1, 1)).astype(jnp.int32),
                axis=1)[:, 0, :]                              # [B, 3]

            offset = pc - center[:, None, :]
            r = jnp.sqrt(jnp.sum(offset ** 2, axis=-1))       # [B, N]
            sal = -(r ** cfg.alpha) * jnp.sum(offset * grad, axis=-1)
            sal = jnp.where(alive, sal, -jnp.inf)             # never re-drop

            # drop the top-k' alive points: mark the k highest, but only
            # the first k' of them when the last round is partial
            _, order = lax.top_k(sal, cfg.k)                  # [B, k]
            rank = lax.broadcasted_iota(jnp.int32, order.shape, 1)
            drop_mask = jnp.zeros((B, N), bool)
            drop_mask = jax.vmap(
                lambda m, idx, valid: m.at[idx].set(valid))(
                    drop_mask, order, rank < k)
            return alive & ~drop_mask

        alive = lax.fori_loop(0, num_rounds, round_body,
                              jnp.ones((B, N), bool))
        first_alive = jnp.argmax(alive, axis=1)
        anchor = jnp.take_along_axis(ori, first_alive[:, None, None],
                                     axis=1)
        pc = jnp.where(alive[..., None], ori, anchor)

        # compact: gather survivors into a static [B, N - num_drop, 3]
        keep = N - cfg.num_drop
        order = jnp.argsort(~alive, axis=1, stable=True)      # alive first
        survivors = G.index_points(pc, order[:, :keep])

        pred = jnp.argmax(logits_fn(survivors), axis=-1)
        return AttackResult(adv_points=survivors,
                            success=pred != labels, pred=pred)

    return attack


def make_sat_forward(logits_fn: Callable, budget: float,
                     cfg: DropConfig = DropConfig()):
    """Drop+FGM hybrid. Parity: `Saliency/Drop.py:115-165`.

    Returns ``(adv_pc [B, N, 3], del_pc [B, N - num_drop, 3])``: the
    cloud with its ``num_drop`` most salient points FGM-perturbed and
    moved to the front, and the cloud with them deleted.
    """
    @jax.jit
    def sat_forward(points, labels):
        ori = points[..., :3]
        B, N, _ = ori.shape
        grad = jax.grad(lambda x: jnp.mean(
            cross_entropy_loss(logits_fn(x), labels)))(ori)
        sal = _saliency(logits_fn, ori, labels, cfg.alpha)
        _, keep_idx = lax.top_k(-sal, N - cfg.num_drop)
        _, pert_idx = lax.top_k(sal, cfg.num_drop)
        del_pc = G.index_points(ori, keep_idx)
        pert_pc = ori + jnp.sign(grad) * budget
        adv_pert = G.index_points(pert_pc, pert_idx)
        adv_pc = jnp.concatenate([adv_pert, del_pc], axis=1)
        return adv_pc, del_pc

    return sat_forward
