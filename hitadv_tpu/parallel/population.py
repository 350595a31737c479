"""Population parallelism: independent attack restarts across devices.

SURVEY.md §2.8 "TPU-native equivalents to build": the reference's
binary-search restarts are sequential; their math is independent given
different PRNG streams, so a mesh can run R restarts of the SAME batch
concurrently (one per device or device group) and keep, per example,
the best successful adversarial cloud. This raises ASR-per-wallclock
beyond anything the single-GPU reference can express.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hitadv_tpu.attacks.base import AttackResult


def population_attack(attack_fn: Callable, n_restarts: int,
                      mesh: Optional[Mesh] = None,
                      axis_name: str = "dp") -> Callable:
    """Wrap an attack to run ``n_restarts`` PRNG-independent instances.

    Selection per example: the first successful restart's cloud (order
    fixed by restart index, keeping determinism); examples no restart
    cracked return restart 0's output. With ``mesh``, the restart axis
    is sharded across devices — each device runs the full batch once,
    a pure-compute scale-out with a single gather at the end.
    """

    def vattack(points, labels, key):
        keys = jax.random.split(key, n_restarts)
        if mesh is not None and n_restarts % mesh.devices.size == 0:
            keys = jax.device_put(
                keys, NamedSharding(mesh, P(axis_name)))
        results = jax.vmap(lambda k: attack_fn(points, labels, k))(keys)
        # results.* have leading restart dim R
        success = results.success                              # [R, B]
        # first successful restart per example (R is small/static)
        first = jnp.argmax(success, axis=0)                    # [B]
        any_ok = jnp.any(success, axis=0)
        pick = jnp.where(any_ok, first, 0)                     # [B]
        B = labels.shape[0]
        batch_idx = jnp.arange(B)
        adv = results.adv_points[pick, batch_idx]              # [B, N, 3]
        pred = results.pred[pick, batch_idx]
        return AttackResult(adv_points=adv, success=any_ok, pred=pred)

    return vattack
