"""Fast-gradient family: FGSM, IFGSM, MIFGSM, PGD, FGSM_RS, FGM_l2, IFGM_l2.

Parity surface: reference `FGM/FGSM.py:8-341` and `FGM/FGM_l2.py:8-189`.
All variants are untargeted (`FGM/FGSM.py:99` success sense: pred !=
label). The iterative variants compile their full loop into one XLA
program via ``lax.fori_loop`` — no per-iteration host syncs.

Clouds are ``[B, N, 3]``; the ``[-1, 1]`` clamp matches the reference's
unit-sphere-normalized data assumption (`FGM/FGSM.py:92`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.attacks.base import AttackResult
from hitadv_tpu.losses import clip_points_l2, clip_points_linf


@dataclass(frozen=True)
class FGMConfig:
    """Hyperparameters of record (`eval.py:32,37` + step rule `eval.py:78`)."""
    budget: float = 0.55
    num_iter: int = 100
    step_size: Optional[float] = None   # default: budget * 2 / num_iter
    mu: float = 1.0                     # MIFGSM momentum (`eval.py:36`)
    clip: str = "linf"                  # linf | l2 ball for iterative clips

    @property
    def step(self) -> float:
        return (self.step_size if self.step_size is not None
                else self.budget * 2.0 / self.num_iter)


def _clip_fn(cfg: FGMConfig):
    if cfg.clip == "linf":
        return lambda pc, ori: clip_points_linf(pc, ori, cfg.budget)
    if cfg.clip == "l2":
        return lambda pc, ori: clip_points_l2(pc, ori, cfg.budget)
    raise ValueError(cfg.clip)


def _grad_and_pred(logits_fn, adv_fn, pc, labels):
    """One fwd+bwd: (gradient wrt pc, predictions)."""
    def loss(p):
        logits = logits_fn(p)
        return jnp.mean(adv_fn(logits, labels)), logits
    (_, logits), grad = jax.value_and_grad(loss, has_aux=True)(pc)
    return grad, jnp.argmax(logits, axis=-1)


def _finalize(logits_fn, pc, labels) -> AttackResult:
    pred = jnp.argmax(logits_fn(pc), axis=-1)
    return AttackResult(adv_points=pc, success=pred != labels, pred=pred)


def make_fgsm(logits_fn: Callable, adv_fn: Callable,
              cfg: FGMConfig = FGMConfig()):
    """One-step sign attack. Parity: `FGM/FGSM.py:71-103`."""
    @jax.jit
    def attack(points, labels, key=None):
        grad, _ = _grad_and_pred(logits_fn, adv_fn, points, labels)
        adv = jnp.clip(points + jnp.sign(grad) * cfg.budget, -1.0, 1.0)
        return _finalize(logits_fn, adv, labels)
    return attack


def make_fgm_l2(logits_fn: Callable, adv_fn: Callable,
                cfg: FGMConfig = FGMConfig()):
    """One-step global-L2-normalized gradient. Parity: `FGM/FGM_l2.py:71-107`."""
    @jax.jit
    def attack(points, labels, key=None):
        grad, _ = _grad_and_pred(logits_fn, adv_fn, points, labels)
        norm = jnp.sqrt(jnp.sum(grad ** 2, axis=(1, 2)))
        g = grad / (norm[:, None, None] + 1e-9)
        adv = jnp.clip(points + g * cfg.budget, -1.0, 1.0)
        return _finalize(logits_fn, adv, labels)
    return attack


def _iterative(logits_fn, adv_fn, cfg: FGMConfig, normalize_l2: bool):
    """Shared IFGSM / IFGM_l2 loop. Parity: `FGM/FGSM.py:106-177`."""
    clip = _clip_fn(cfg)

    def attack_from(pc0, ori_pc, labels):
        def body(_, pc):
            grad, _ = _grad_and_pred(logits_fn, adv_fn, pc, labels)
            if normalize_l2:
                norm = jnp.sqrt(jnp.sum(grad ** 2, axis=(1, 2)))
                step = cfg.step * grad / (norm[:, None, None] + 1e-9)
            else:
                step = cfg.step * jnp.sign(grad)
            pc = jnp.clip(clip(pc + step, ori_pc), -1.0, 1.0)
            return pc
        pc = lax.fori_loop(0, cfg.num_iter, body, pc0)
        return _finalize(logits_fn, pc, labels)
    return attack_from


def make_ifgsm(logits_fn: Callable, adv_fn: Callable,
               cfg: FGMConfig = FGMConfig()):
    """Iterative FGSM with 1e-7 gaussian init. Parity: `FGM/FGSM.py:106-177`."""
    step_fn = _iterative(logits_fn, adv_fn, cfg, normalize_l2=False)

    @jax.jit
    def attack(points, labels, key):
        pc0 = points + jax.random.normal(key, points.shape) * 1e-7
        return step_fn(pc0, pc0, labels)
    return attack


def make_ifgm_l2(logits_fn: Callable, adv_fn: Callable,
                 cfg: FGMConfig = FGMConfig()):
    """Iterative L2 FGM. Parity: `FGM/FGM_l2.py:110-189`."""
    step_fn = _iterative(logits_fn, adv_fn, cfg, normalize_l2=True)

    @jax.jit
    def attack(points, labels, key):
        pc0 = points + jax.random.normal(key, points.shape) * 1e-7
        return step_fn(pc0, pc0, labels)
    return attack


def make_pgd(logits_fn: Callable, adv_fn: Callable,
             cfg: FGMConfig = FGMConfig()):
    """IFGSM from a uniform(-eps, eps) random start. Parity: `FGM/FGSM.py:260-300`.

    Note the reference clips against the *jittered* start (it calls the
    parent with the perturbed data as origin) — reproduced here.
    """
    step_fn = _iterative(logits_fn, adv_fn, cfg, normalize_l2=False)

    @jax.jit
    def attack(points, labels, key):
        k1, k2 = jax.random.split(key)
        init = points + jax.random.uniform(
            k1, points.shape, minval=-cfg.budget, maxval=cfg.budget)
        pc0 = init + jax.random.normal(k2, points.shape) * 1e-7
        return step_fn(pc0, pc0, labels)
    return attack


def make_mifgsm(logits_fn: Callable, adv_fn: Callable,
                cfg: FGMConfig = FGMConfig()):
    """Momentum IFGSM: L1-normalized grads accumulated with mu.

    Parity: `FGM/FGSM.py:180-257` (incl. the sign of the l2-normalized
    momentum as the step direction).
    """
    clip = _clip_fn(cfg)

    @jax.jit
    def attack(points, labels, key):
        pc0 = points + jax.random.normal(key, points.shape) * 1e-7

        def body(_, carry):
            pc, m = carry
            grad, _ = _grad_and_pred(logits_fn, adv_fn, pc, labels)
            l1 = jnp.sum(jnp.abs(grad), axis=(1, 2))
            m = cfg.mu * m + grad / (l1[:, None, None] + 1e-9)
            l2 = jnp.sqrt(jnp.sum(m ** 2, axis=(1, 2)))
            direction = jnp.sign(m / (l2[:, None, None] + 1e-9))
            pc = jnp.clip(clip(pc + cfg.step * direction, pc0), -1.0, 1.0)
            return pc, m

        pc, _ = lax.fori_loop(0, cfg.num_iter, body,
                              (pc0, jnp.zeros_like(pc0)))
        return _finalize(logits_fn, pc, labels)
    return attack


def make_fgsm_rs(logits_fn: Callable, adv_fn: Callable,
                 cfg: FGMConfig = FGMConfig()):
    """FGSM from a random start + clip. Parity: `FGM/FGSM.py:303-341`."""
    clip = _clip_fn(cfg)

    @jax.jit
    def attack(points, labels, key):
        init = points + jax.random.uniform(
            key, points.shape, minval=-cfg.budget, maxval=cfg.budget)
        grad, _ = _grad_and_pred(logits_fn, adv_fn, init, labels)
        adv = init + jnp.sign(grad) * cfg.budget
        # reference clips against the clean points here (`FGM/FGSM.py:310`)
        adv = jnp.clip(clip(adv, points), -1.0, 1.0)
        return _finalize(logits_fn, adv, labels)
    return attack
