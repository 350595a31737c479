"""Seeded cross-backend fuzz: random shapes through the geometry
dispatch layer, Pallas (interpret mode on CPU) vs the XLA backend.

The targeted kernel tests pin specific shapes and contracts
(tests/test_pallas_kernels.py); this sweep adds shape diversity on the
same oracles — odd N (not multiples of the 128-lane tile or the
8-sublane tile), tiny batches, k spanning the selection-loop range —
so a future tiling change that only breaks an unanticipated shape
class still trips CI. Continuous random data keeps distance ties
measure-zero, so index equality is the contract (the exact kNN path
reproduces the XLA backend's top_k selection bitwise; docstrings in
ops/geometry.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hitadv_tpu.ops import geometry as G

# (B, N, C, k) — N deliberately off-tile; C=3 is the xyz/rank-1 path,
# C=64 the MXU feature path.
CONFIGS = [
    (1, 137, 3, 1),
    (3, 222, 3, 5),
    (2, 301, 3, 20),
    (2, 190, 64, 7),
    (1, 257, 64, 17),
]


@pytest.mark.parametrize("B,N,C,k", CONFIGS)
def test_knn_backends_agree(B, N, C, k):
    rng = np.random.RandomState(hash((B, N, C, k)) % 2 ** 31)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    G.set_backend("xla")
    ref = np.asarray(G.knn_points(x, x, k).idx)
    G.set_backend("pallas")
    got = np.asarray(G.knn_points(x, x, k).idx)
    G.set_backend("auto")
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("B,N,S,ns", [(1, 137, 16, 8), (3, 222, 33, 5),
                                      (2, 301, 64, 32)])
def test_ball_query_backends_agree(B, N, S, ns):
    rng = np.random.RandomState(hash((B, N, S, ns)) % 2 ** 31)
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    new = pts[:, :S]
    G.set_backend("xla")
    ref = np.asarray(G.query_ball_point(0.4, ns, pts, new))
    G.set_backend("pallas")
    got = np.asarray(G.query_ball_point(0.4, ns, pts, new))
    G.set_backend("auto")
    # rim membership at |d^2 - r^2| ~ float rounding may flip
    # (ball_query_pallas docstring); everything else must be equal.
    mismatch = (got != ref).mean()
    assert mismatch < 2e-3, f"ball query disagreement {mismatch:.2e}"


@pytest.mark.parametrize("B,N,npoint", [(1, 137, 16), (3, 222, 64),
                                        (2, 301, 128)])
def test_fps_backends_agree(B, N, npoint):
    rng = np.random.RandomState(hash((B, N, npoint)) % 2 ** 31)
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    G.set_backend("xla")
    ref = np.asarray(G.farthest_point_sample(pts, npoint, start_idx=0))
    G.set_backend("pallas")
    got = np.asarray(G.farthest_point_sample(pts, npoint, start_idx=0))
    G.set_backend("auto")
    np.testing.assert_array_equal(got, ref)
