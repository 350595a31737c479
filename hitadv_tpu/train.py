"""Victim training utility: ``python -m hitadv_tpu.train``.

The reference has NO training loop (victim checkpoints arrive
out-of-band via a Baidu link, `README.md:24-26`). This module closes
that gap so the framework is self-sufficient: a jitted cross-entropy
Adam loop over any registered victim with real train-mode BatchNorm —
the forward normalizes with batch statistics and the running stats are
EMA-updated the torch way (momentum 0.1, unbiased variance), so trained
params drop straight into the eval-mode attack path.
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hitadv_tpu.losses import cross_entropy_loss
from hitadv_tpu.nn import functional as nnF


_BN_KEYS = frozenset(("scale", "bias", "mean", "var"))


def _bn_paths(tree, prefix=()):
    """Map id(bn-param-dict) -> pytree path for every BN dict."""
    out = {}
    if isinstance(tree, dict):
        if set(tree.keys()) == _BN_KEYS:
            out[id(tree)] = prefix
        for k, v in tree.items():
            out.update(_bn_paths(v, prefix + (k,)))
    return out


def _replace_at(tree, path, value):
    """Functional set: new nested dict with tree[path] = value."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _replace_at(tree[path[0]], path[1:], value)
    return new


def make_train_step(apply_fn: Callable, optimizer,
                    bn_momentum: float = 0.1,
                    frozen_bn: bool = False):
    """One SGD step with train-mode BN.

    The forward runs inside ``nnF.bn_training``: BatchNorm normalizes
    with batch statistics, and each BN call records its batch
    mean/unbiased-variance. Records are matched back to pytree paths by
    the identity of the param sub-dicts (tracing order is
    deterministic), then EMA-applied: ``new = (1-m)*old + m*batch``
    (torch BatchNorm momentum convention).

    ``frozen_bn=True`` restores the round-1 behavior (running stats
    used in the forward and never updated) for ablation.
    """

    @jax.jit
    def step(params, opt_state, x, y):
        path_box = []           # static (trace-time) bn pytree paths

        def loss_fn(params_in):
            if frozen_bn:
                logits = apply_fn(params_in, x)
                return (jnp.mean(cross_entropy_loss(logits, y)),
                        (logits, []))
            records = []
            with nnF.bn_training(records):
                logits = apply_fn(params_in, x)
            paths = _bn_paths(params_in)
            path_box[:] = [paths[rid] for rid, _, _ in records]
            stats = [(bm, bv) for _, bm, bv in records]
            return jnp.mean(cross_entropy_loss(logits, y)), (logits,
                                                             stats)

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if frozen_bn:
            # running stats feed the frozen forward, so they DO receive
            # gradients — mask them or the optimizer trains the stats
            # (round-1 bug: neither frozen nor torch semantics).
            def _zero_stats(path, g):
                if path and getattr(path[-1], "key", None) in ("mean",
                                                               "var"):
                    return jnp.zeros_like(g)
                return g
            grads = jax.tree_util.tree_map_with_path(_zero_stats, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        for path, (bm, bv) in zip(path_box, stats):
            bn = params
            for k in path:
                bn = bn[k]
            new_bn = dict(bn)
            new_bn["mean"] = (1 - bn_momentum) * bn["mean"] \
                + bn_momentum * bm
            new_bn["var"] = (1 - bn_momentum) * bn["var"] \
                + bn_momentum * bv
            params = _replace_at(params, path, new_bn)

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
