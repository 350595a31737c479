"""Input-transformation defenses (the reference's dangling flag, realized).

`eval.py:64-66` exposes ``--defense_method`` / ``--eval_defense_method``
but the reference never implements them; attacks merely accept an
optional ``pre_head`` transform (`CW/Perturb.py:99-101`,
`FGM/FGSM.py:50-54`). This module supplies the standard point-cloud
defenses those hooks exist for, as jit-safe static-shape transforms:

  * SRS — simple random subsampling (drop points at random);
  * SOR — statistical outlier removal (DUP-Net's front end): drop the
    points whose mean-kNN distance exceeds mean + alpha*std;
  * gaussian jitter.

Static shapes: "removed" points are replaced by resampling surviving
points (duplicates are max-pool-neutral for every victim here), keeping
the transforms inside the compiled attack graph.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hitadv_tpu.ops import geometry as G


def make_srs(drop_num: int, key: jax.Array) -> Callable:
    """Simple random sampling: drop ``drop_num`` random points."""

    def srs(pc: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = pc.shape
        # honor the drop_num contract exactly whenever it is satisfiable;
        # only the degenerate N <= drop_num case clamps (to one surviving
        # point), so smoke-size clouds survive instead of crashing the
        # permutation gather
        keep = max(N - drop_num, 1)
        keys = jax.random.split(jax.random.fold_in(key, N), B)
        idx = jax.vmap(
            lambda k: jax.random.permutation(k, N)[:keep])(keys)
        kept = G.index_points(pc, idx)                        # [B, keep, 3]
        # pad back to N with repeated survivors (static shape)
        pad_idx = jnp.arange(N - keep) % keep
        return jnp.concatenate([kept, kept[:, pad_idx]], axis=1)

    return srs


def make_sor(k: int = 2, alpha: float = 1.1) -> Callable:
    """Statistical outlier removal (DUP-Net front end).

    Points whose mean-kNN distance exceeds ``mean + alpha*std`` are
    snapped onto their nearest surviving neighbor (static-shape
    equivalent of removal for max-pool victims).
    """

    def sor(pc: jnp.ndarray) -> jnp.ndarray:
        dists, idx = G.knn_indices(pc, k)                     # sq dists
        value = jnp.mean(jnp.sqrt(jnp.maximum(dists, 0.0)), axis=-1)
        mean = jnp.mean(value, axis=-1, keepdims=True)
        std = jnp.std(value, axis=-1, keepdims=True, ddof=1)
        outlier = value > (mean + alpha * std)                # [B, N]
        # snap outliers onto their nearest inlier-ish neighbor
        nn = idx[..., 0]                                      # [B, N]
        nn_pts = G.index_points(pc, nn)
        return jnp.where(outlier[..., None], nn_pts, pc)

    return sor


def make_jitter(sigma: float = 0.01, clip: float = 0.05,
                key: Optional[jax.Array] = None) -> Callable:
    """Gaussian jitter defense (randomized smoothing style)."""
    base_key = key if key is not None else jax.random.PRNGKey(0)

    def jitter(pc: jnp.ndarray) -> jnp.ndarray:
        noise = jnp.clip(
            sigma * jax.random.normal(base_key, pc.shape), -clip, clip)
        return pc + noise

    return jitter


def get_defense(name: Optional[str],
                key: Optional[jax.Array] = None) -> Optional[Callable]:
    """Defense registry for ``--defense_method``."""
    if not name or name.lower() in ("none", "null"):
        return None
    name = name.lower()
    if key is None:
        key = jax.random.PRNGKey(0)
    if name == "srs":
        return make_srs(drop_num=500, key=key)
    if name == "sor":
        return make_sor()
    if name == "jitter":
        return make_jitter(key=key)
    raise ValueError(f"unknown defense {name!r}")


def defended_logits_fn(logits_fn: Callable,
                       defense: Optional[Callable]) -> Callable:
    """Compose a defense as the attack-facing pre_head
    (the reference's ``model(self.pre_head(adv_data))`` pattern)."""
    if defense is None:
        return logits_fn
    return lambda x: logits_fn(defense(x))
