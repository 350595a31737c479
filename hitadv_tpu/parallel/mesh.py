"""Device mesh helpers for batch-data-parallel attack evaluation.

Design (SURVEY.md §2.8 "TPU-native equivalents"): every attack here is a
pure function of ``(points [B, ...], labels [B], key)`` whose internal
state is per-example, so sharding dim 0 over a 1-D mesh makes XLA run the
entire attack — model forwards/backwards, Adam, binary search — fully
data-parallel with zero communication until the final metric reduction
(which jit lowers to an ICI all-reduce automatically when the caller
aggregates sharded outputs).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """1-D device mesh over the first ``n_devices`` (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard dim 0 (batch) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(x, sharding: NamedSharding):
    """Place a host batch under ``sharding`` — single- or multi-host.

    Single-process: a plain ``device_put``. Under ``jax.distributed``
    (multi-host pods, DCN-spanning meshes): ``x`` is this process's
    HOST-LOCAL shard of the global batch (the per-host input-pipeline
    contract, SURVEY.md §2.8/§5) and the global array is assembled via
    ``make_array_from_process_local_data`` — each host feeds only its
    addressable devices; no cross-host data movement happens here.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_attack(attack_fn: Callable, mesh: Mesh,
                 axis_name: str = "dp") -> Callable:
    """Wrap an attack so inputs are batch-sharded over ``mesh``.

    The batch size must be divisible by the mesh size. Model params are
    closed over inside ``attack_fn`` and get replicated by jit; the
    returned AttackResult arrays stay batch-sharded (gather happens only
    if the caller pulls them to host).

    Works unchanged on a multi-host (DCN-spanning) mesh: pass each
    process its host-local batch shard (see `put_batch`); metric
    reductions over the sharded outputs lower to global collectives.
    """
    in_shard = batch_sharding(mesh, axis_name)
    repl = replicate(mesh)

    def wrapped(points, labels, key=None):
        n_dev = mesh.devices.size
        # under jax.distributed the caller passes the HOST-LOCAL shard
        b_global = (len(points) * jax.process_count()
                    if jax.process_count() > 1 else len(points))
        if b_global % n_dev:
            raise ValueError(
                f"shard_attack: global batch {b_global} is not divisible"
                f" by the {n_dev}-device mesh — pad the batch or shrink"
                " the mesh (parallel.make_mesh(n_devices=...))")
        points = put_batch(points, in_shard)
        labels = put_batch(labels, in_shard)
        if key is not None:
            # replicated: every host supplies the identical full value
            key = put_batch(key, repl)
        return attack_fn(points, labels, key)

    return wrapped
