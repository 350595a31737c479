"""Ring-pass blockwise set distances for large point counts.

SURVEY.md §5 "long-context" equivalent: at the reference's N=1024 the
full ``[B, N, N]`` pairwise matrix is one matmul and stays on one chip;
for N beyond per-chip memory, shard the points axis across the mesh and
ring-rotate the *other* cloud's blocks over ICI with ``ppermute`` while
keeping a running min — the set-distance analogue of ring attention.
Chamfer and Hausdorff never materialize more than ``[B, N/D, N/D]`` per
device.

Semantics match `losses.chamfer_dist` / `losses.hausdorff_dist` exactly
(same reductions, f32-exact distance matmul).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from hitadv_tpu.ops.geometry import square_distance


def _ring_mins(local_q: jnp.ndarray, local_p: jnp.ndarray,
               axis_name: str) -> jnp.ndarray:
    """Per-local-query min squared distance to the FULL p cloud.

    local_q: ``[B, n, 3]`` this device's query block;
    local_p: ``[B, n, 3]`` this device's block of the other cloud,
    rotated around the ring. Returns ``[B, n]``.
    """
    D = lax.axis_size(axis_name)
    perm = [(j, (j + 1) % D) for j in range(D)]

    def body(i, carry):
        mins, p_block = carry
        d = square_distance(local_q, p_block)                 # [B, n, n]
        mins = jnp.minimum(mins, jnp.min(d, axis=-1))
        p_block = lax.ppermute(p_block, axis_name, perm)
        return mins, p_block

    init = (jnp.full(local_q.shape[:2], jnp.inf, local_q.dtype), local_p)
    mins, _ = lax.fori_loop(0, D, body, init)
    return mins


def ring_chamfer(adv: jnp.ndarray, ori: jnp.ndarray, mesh: Mesh,
                 method: str = "adv2ori",
                 axis_name: str = None) -> jnp.ndarray:
    """Chamfer distance with the points axis sharded over ``mesh``.

    adv/ori: ``[B, N, 3]`` with N divisible by the mesh size. Returns
    the replicated per-example ``[B]`` result of
    `losses.chamfer_dist(adv, ori, method)`.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    N_adv, N_ori = adv.shape[1], ori.shape[1]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(), check_vma=False)
    def run(adv_l, ori_l):
        out = jnp.zeros((adv_l.shape[0],), adv_l.dtype)
        if method in ("adv2ori", "both"):
            mins = _ring_mins(adv_l, ori_l, axis_name)        # [B, n]
            a2o = lax.psum(jnp.sum(mins, axis=1), axis_name) / N_adv
            out = out + (a2o / 2.0 if method == "both" else a2o)
        if method in ("ori2adv", "both"):
            mins = _ring_mins(ori_l, adv_l, axis_name)
            o2a = lax.psum(jnp.sum(mins, axis=1), axis_name) / N_ori
            out = out + (o2a / 2.0 if method == "both" else o2a)
        return out

    return run(adv, ori)


def ring_hausdorff(adv: jnp.ndarray, ori: jnp.ndarray, mesh: Mesh,
                   method: str = "adv2ori",
                   axis_name: str = None) -> jnp.ndarray:
    """Hausdorff (max-of-min) with the points axis sharded over ``mesh``."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(), check_vma=False)
    def run(adv_l, ori_l):
        out = jnp.zeros((adv_l.shape[0],), adv_l.dtype)
        if method in ("adv2ori", "both"):
            mins = _ring_mins(adv_l, ori_l, axis_name)
            a2o = lax.pmax(jnp.max(mins, axis=1), axis_name)
            out = out + (a2o / 2.0 if method == "both" else a2o)
        if method in ("ori2adv", "both"):
            mins = _ring_mins(ori_l, adv_l, axis_name)
            o2a = lax.pmax(jnp.max(mins, axis=1), axis_name)
            out = out + (o2a / 2.0 if method == "both" else o2a)
        return out

    return run(adv, ori)
