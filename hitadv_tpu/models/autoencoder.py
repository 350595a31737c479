"""Point-cloud autoencoder (AdvPC's reconstruction network).

The reference loads a pretrained external AE (`CW/AdvPC.py:14-30`:
``ae_model(adv_data) -> reconstruction``) whose weights are distributed
out-of-band. We provide the standard AdvPC-style AE: PointNet-style
encoder (shared MLP 3→64→128→1024 + global max pool) and a
fully-connected decoder (1024→1024→N·3), the architecture used by the
AdvPC paper's autoencoder regularizer. I/O is ``[B, N, 3] -> [B, N, 3]``.

A `fit` helper (chamfer reconstruction objective) is included so the AE
can be trained on-device when no checkpoint exists — a capability the
reference lacks entirely (it has no training loop).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from hitadv_tpu.nn import functional as F
from hitadv_tpu.losses import chamfer_dist


def init(key: jax.Array, num_points: int = 1024,
         latent: int = 1024) -> Dict:
    keys = jax.random.split(key, 6)
    return {
        "enc": F.mlp_init(keys[0], [3, 64, 128, latent]),
        "dec_fc1": F.linear_init(keys[1], latent, 1024),
        "dec_fc2": F.linear_init(keys[2], 1024, 1024),
        "dec_fc3": F.linear_init(keys[3], 1024, num_points * 3),
    }


def encode(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = F.mlp_apply(params["enc"], x)                         # [B, N, L]
    return jnp.max(h, axis=1)                                 # [B, L]


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct: [B, N, 3] -> [B, N, 3]."""
    B, N, _ = x.shape
    z = encode(params, x)
    h = F.relu(F.linear(params["dec_fc1"], z))
    h = F.relu(F.linear(params["dec_fc2"], h))
    out = F.linear(params["dec_fc3"], h)
    return out.reshape(B, N, 3)


def reconstruction_loss(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Two-sided chamfer reconstruction objective (scalar)."""
    recon = apply(params, x)
    return jnp.mean(chamfer_dist(recon, x, method="both"))


def fit(params: Dict, clouds: jnp.ndarray, key: jax.Array,
        steps: int = 200, batch_size: int = 16,
        lr: float = 1e-3) -> Dict:
    """Minimal on-device Adam training loop for the AE."""
    from hitadv_tpu.attacks.base import adam_init, adam_update

    flat, tree = jax.tree_util.tree_flatten(params)

    @jax.jit
    def step(params, opt_states, batch):
        grads = jax.grad(reconstruction_loss)(params, batch)
        gflat, _ = jax.tree_util.tree_flatten(grads)
        pflat, _ = jax.tree_util.tree_flatten(params)
        new_p, new_s = [], []
        for g, s, p in zip(gflat, opt_states, pflat):
            np_, ns = adam_update(g, s, p, lr)
            new_p.append(np_)
            new_s.append(ns)
        return jax.tree_util.tree_unflatten(tree, new_p), new_s

    opt_states = [adam_init(p) for p in flat]
    n = clouds.shape[0]
    for i in range(steps):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch_size,), 0, n)
        params, opt_states = step(params, opt_states, clouds[idx])
    return params
