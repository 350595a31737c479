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
    # Eigensolver for the low-frequency subspace. "eigh" = full dense
    # decomposition (torch.symeig parity). "subspace" = partial solver
    # (Chebyshev-filtered subspace iteration + Rayleigh-Ritz): the
    # attack only consumes the PROJECTOR onto the lowest-low_pass
    # eigenspace, so only that subspace needs to converge — batched
    # [N, low_pass+guard] MXU matmuls instead of the O(N³) serial eigh,
    # the dominant setup cost at N=1024 (VERDICT.md Missing #7).
    # Defaults reach the f32 accuracy floor of eigh itself (subspace
    # distance ~1.5e-3, limited by eps·λmax/boundary-gap; 1.6e-6 in
    # f64 — see tests/test_spectral_ae_attacks.py).
    eigensolver: str = "eigh"    # eigh | subspace
    subspace_rounds: int = 8
    subspace_degree: int = 12
    subspace_guard: int = 32


def laplacian_matrix(pc: jnp.ndarray, k: int = 30) -> jnp.ndarray:
    """kNN-masked Gaussian graph Laplacian L = D - A ``[B, N, N]``.

    Parity: `CW/AOF.py:30-48` (kNN-k mask incl. self, symmetrized,
    exp(-|p_i-p_j|²) edge weights, combinatorial Laplacian).
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
    return jnp.zeros_like(A).at[
        :, jnp.arange(N), jnp.arange(N)].set(D) - A


def graph_laplacian(pc: jnp.ndarray,
                    k: int = 30) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full eigendecomposition of the graph Laplacian.

    pc: ``[B, N, 3]``. Returns (eigvals ``[B, N]`` ascending,
    eigvecs ``[B, N, N]``). Parity: `CW/AOF.py:30-51`.
    """
    return jnp.linalg.eigh(laplacian_matrix(pc, k))


def _cheb_filter(L, Q, a, b, degree: int):
    """Degree-``degree`` Chebyshev polynomial of L applied to Q,
    mapped so eigenvalues in [a, b] stay bounded by 1 while those
    below ``a`` are amplified by cosh(degree·acosh(·)) — a low-pass
    spectral filter built purely from batched matmuls."""
    c = ((a + b) / 2.0)[:, None, None]
    h = ((b - a) / 2.0)[:, None, None]
    X0 = Q
    X1 = (jnp.matmul(L, Q) - c * Q) / h
    for _ in range(degree - 1):
        X2 = 2.0 * (jnp.matmul(L, X1) - c * X1) / h - X0
        X0, X1 = X1, X2
    return X1


def graph_laplacian_partial(pc: jnp.ndarray, k: int = 30,
                            low_pass: int = 100, rounds: int = 8,
                            degree: int = 12, guard: int = 32,
                            key: Optional[jax.Array] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lowest-``low_pass`` eigenpairs via Chebyshev-filtered subspace
    iteration (ChebFD-style).

    TPU-native replacement for the full ``eigh`` when only the
    low-frequency subspace is consumed (the AOF lfc split uses the
    projector V·Vᵀ, which depends on the SPAN, not individual
    eigenvectors). A plain shifted power iteration cannot work here —
    the Gershgorin shift σ dwarfs the low-band gaps (rate 1 - gap/σ per
    step) — so each round applies a degree-``degree`` Chebyshev low-pass
    filter over [a, σ] to ``low_pass + guard`` vectors, orthonormalizes,
    and tightens ``a`` to the current largest Ritz value. Everything is
    batched [B, N, kg] matmul + QR (MXU work); the only eigh is the tiny
    [kg, kg] Rayleigh-Ritz problem.

    Returns (ritz values ``[B, low_pass]`` ascending, basis
    ``[B, N, low_pass]``).
    """
    L = laplacian_matrix(pc, k)
    B, N, _ = L.shape
    kg = min(low_pass + guard, N)
    # Gershgorin: λmax(L) <= max_i (L_ii + Σ_j |A_ij|) = 2 max_i D_ii
    sigma = 2.0 * jnp.max(jnp.diagonal(L, axis1=1, axis2=2),
                          axis=1)                             # [B]
    if key is None:
        key = jax.random.PRNGKey(0)
    Q = jax.random.normal(key, (B, N, kg), L.dtype)
    Q, _ = jnp.linalg.qr(Q)

    def ritz(Q):
        LQ = jnp.matmul(L, Q)
        T = jnp.matmul(jnp.swapaxes(Q, 1, 2), LQ)
        T = (T + jnp.swapaxes(T, 1, 2)) / 2.0
        return jnp.linalg.eigh(T)                             # ascending

    def body(_, Q):
        e, _ = ritz(Q)
        # filter window: suppress [current top Ritz value, σ]; keep it
        # strictly below σ so the map stays well-conditioned
        a = jnp.minimum(e[:, -1], 0.95 * sigma)
        Q, _ = jnp.linalg.qr(_cheb_filter(L, Q, a, sigma, degree))
        return Q

    Q = lax.fori_loop(0, rounds, body, Q)
    e, W = ritz(Q)
    V = jnp.matmul(Q, W[:, :, :low_pass])                     # [B, N, lp]
    return e[:, :low_pass], V


def make_aof(logits_fn: Callable, adv_fn: Callable,
             clip_fn: Callable,
             cfg: AOFConfig = AOFConfig(),
             ae_fn: Optional[Callable] = None,
             *, init_overrides=None):
    """Build the jitted AOF attack.

    Args:
      logits_fn: victim ``[B, N, 3] -> [B, C]``.
      adv_fn: per-example margin loss (targeted sense for TAOF).
      clip_fn: ``(adv, ori) -> adv`` (the reference uses ClipPointsLinf).
      ae_fn: reconstruction model for UAEAOF (mode="ae_untargeted").
      init_overrides: optional ``{"noise": [S, B, N, 3]}`` pinning the
        per-restart 1e-7 init noise (`CW/AOF.py:110-111`) for
        trajectory-parity testing — the eigenbasis V is computed from
        the noisy cloud, so cross-framework comparison needs identical
        draws.
      labels semantics: mode="targeted" expects ``attack(points, target,
      key, y_truth=...)`` with true labels for the lfc bookkeeping
      (`CW/TAOF.py:203`).
    """
    if cfg.mode == "ae_untargeted" and ae_fn is None:
        raise ValueError("ae_untargeted mode requires ae_fn")
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v)
                          for k, v in init_overrides.items()}
    lp = cfg.low_pass

    def spectral_split(adv, Vlp):
        """coords → (lfc, hfc) through the low-band basis Vlp [B,N,lp].

        lfc = Vlp·Vlpᵀ·adv; hfc = adv - lfc. Identical to projecting on
        the complementary eigenvectors (`CW/AOF.py:111-122`) because the
        full eigenbasis is orthonormal — and it only needs the lowest
        ``low_pass`` vectors, which lets the partial eigensolver drop
        the O(N³) eigh.
        """
        projs = jnp.einsum("bnc,bnm->bmc", adv, Vlp,
                           preferred_element_type=jnp.float32)  # [B,lp,3]
        lfc = jnp.einsum("bmc,bnm->bnc", projs, Vlp,
                         preferred_element_type=jnp.float32)
        return lfc, adv - lfc

    def low_band_basis(pc, key):
        if cfg.eigensolver == "subspace":
            _, V = graph_laplacian_partial(
                pc, cfg.knn, lp, rounds=cfg.subspace_rounds,
                degree=cfg.subspace_degree,
                guard=cfg.subspace_guard, key=key)
            return V
        _, V = graph_laplacian(pc, cfg.knn)
        return V[:, :, :lp]

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

        def restart(carry, step_in):
            step_key, step_idx = step_in
            o_best, _ = carry
            noise_key, eig_key = jax.random.split(step_key)
            if init_overrides is not None:
                adv0 = ori + init_overrides["noise"][step_idx]
            else:
                adv0 = ori + jax.random.normal(noise_key,
                                               ori.shape) * 1e-7
            V = low_band_basis(adv0, eig_key)
            lfc0, hfc0 = spectral_split(adv0, V)

            def inner(carry, _):
                lfc, hfc, opt, o_best = carry

                def loss_fn(lfc):
                    full_logits = logits_fn(lfc + hfc)
                    lfc_logits = logits_fn(lfc)
                    if cfg.mode == "ae_untargeted":
                        # UAEAOF mix (`CW/UAEAOF.py:143-162`):
                        # (1-2Γ)·full + Γ·ae + Γ·lfc
                        ae_logits = logits_fn(ae_fn(lfc + hfc))
                        l = (1.0 - 2.0 * cfg.gamma) * jnp.mean(
                            adv_fn(full_logits, labels))
                        l = l + cfg.gamma * jnp.mean(
                            adv_fn(ae_logits, labels))
                    else:
                        # AOF/TAOF mix (`CW/AOF.py:143-150`):
                        # (1-Γ)·full + Γ·lfc
                        ae_logits = full_logits
                        l = (1.0 - cfg.gamma) * jnp.mean(
                            adv_fn(full_logits, labels))
                    l = l + cfg.gamma * jnp.mean(adv_fn(lfc_logits,
                                                        labels))
                    return l, (full_logits, lfc_logits, ae_logits)

                grad, stale = jax.grad(loss_fn, has_aux=True)(lfc)
                lfc, opt = adam_update(grad, opt, lfc, cfg.attack_lr)

                # clip in coordinate space, re-project (:158-165)
                adv = clip_fn(lfc + hfc, ori)
                lfc, hfc = spectral_split(adv, V)
                adv = lfc + hfc

                if cfg.mode == "ae_untargeted":
                    # UAEAOF bookkeeping pairs the PRE-step predictions
                    # with the post-step clipped coordinates — it reuses
                    # the forward logits instead of recomputing them
                    # (`CW/UAEAOF.py:179-205`, vs AOF/TAOF's fresh
                    # no_grad recompute at `CW/AOF.py:171-183`)
                    pred = jnp.argmax(stale[0], axis=-1)
                    lfc_pred = jnp.argmax(stale[1], axis=-1)
                    ae_pred = jnp.argmax(stale[2], axis=-1)
                else:
                    pred = jnp.argmax(logits_fn(adv), axis=-1)
                    lfc_pred = jnp.argmax(logits_fn(lfc), axis=-1)
                    ae_pred = pred
                dist = jnp.sqrt(jnp.sum((adv - ori) ** 2, axis=(1, 2)))
                ok = success_mask(pred, lfc_pred, ae_pred)
                o_best = update_best(o_best, ok, dist, pred, adv)
                return (lfc, hfc, opt, o_best), adv

            (lfc, hfc, _, o_best), advs = lax.scan(
                inner, (lfc0, hfc0, adam_init(lfc0), o_best), None,
                length=cfg.num_iter)
            return (o_best, advs[-1]), ()

        step_keys = (jax.random.split(key, cfg.binary_step),
                     jnp.arange(cfg.binary_step))
        init = (BestState.init(ori), jnp.zeros_like(ori))
        (o_best, last_adv), _ = lax.scan(restart, init, step_keys)

        # failures fall back to the last iterate, then a final clip
        # (`CW/AOF.py:224-231`, `CW/UAEAOF.py:227-231`) — which TAOF
        # alone skips (`CW/TAOF.py:232`, the clip line is commented out)
        found = o_best.score >= 0
        adv_final = jnp.where(found[:, None, None], o_best.adv,
                              last_adv)
        if cfg.mode != "targeted":
            adv_final = clip_fn(adv_final, ori)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        success = ((pred == labels) if cfg.mode == "targeted"
                   else (pred != labels))
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack
