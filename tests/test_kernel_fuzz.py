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


@pytest.mark.parametrize("B,Cn,N", [(1, 7, 137), (3, 33, 222),
                                    (2, 100, 301), (1, 192, 100)])
def test_blend_negdt_backends_agree(B, Cn, N):
    """Hoisted-field blend kernel vs the stock XLA tail at off-tile
    shapes (Cn off the 8-sublane pad, N off the tile_n grid), values
    and the attack-realistic (delta, pert) grads."""
    import jax

    rng = np.random.RandomState(hash((B, Cn, N)) % 2 ** 31)
    ori = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    central = ori[:, :Cn] if Cn <= N else jnp.tile(ori, (1, 2, 1))[:, :Cn]
    delta = jnp.asarray(0.1 + rng.rand(B, Cn).astype(np.float32))
    pert = jnp.asarray(rng.randn(B, Cn, 3).astype(np.float32) * 0.1)
    negd = G.neg_gaussian_field(central, ori)
    negdt = jnp.swapaxes(negd, 1, 2)

    def loss(fn, field, d, p):
        num, deno = fn(field, d, p)
        return jnp.sum((num / deno[..., None]) ** 2)

    ref_v, ref_g = jax.value_and_grad(
        lambda d, p: loss(G._blend_from_negd, negd, d, p),
        argnums=(0, 1))(delta, pert)
    G.set_backend("pallas")
    try:
        got_v, got_g = jax.value_and_grad(
            lambda d, p: loss(G.gaussian_blend_negdt, negdt, d, p),
            argnums=(0, 1))(delta, pert)
    finally:
        G.set_backend("auto")
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    for r, g, name in zip(ref_g, got_g, ("delta", "pert")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("B,N,M,C", [(2, 131, 600, 3), (1, 257, 512, 19),
                                     (2, 999, 640, 64)])
def test_gather_scatter_backends_agree(B, N, M, C):
    """index_points dispatch (one-hot MXU gather + scatter-add VJP)
    vs the XLA path at off-tile shapes above the kernel gates
    (N >= 128, flat rows >= 512). Forward contract is bitwise; the
    hi|lo f32 scatter grad is gradient-grade (targeted tests pin the
    2.8e-5 class)."""
    import jax

    rng = np.random.RandomState(hash(("gs", B, N, M, C)) % 2 ** 31)
    y = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, M, C).astype(np.float32))

    def loss(y):
        return jnp.sum(G.index_points(y, idx) * w)

    res = {}
    for backend in ("xla", "pallas"):
        G.set_backend(backend)
        try:
            res[backend] = (np.asarray(G.index_points(y, idx)),
                            np.asarray(jax.grad(loss)(y)))
        finally:
            G.set_backend("auto")
    np.testing.assert_array_equal(res["pallas"][0], res["xla"][0])
    np.testing.assert_allclose(res["pallas"][1], res["xla"][1],
                               atol=1e-4)


@pytest.mark.parametrize("B,N,k,C", [(1, 131, 5, 6), (2, 222, 20, 64),
                                     (1, 301, 9, 3)])
def test_graph_max_pool_backends_agree(B, N, k, C):
    """EdgeConv neighbor-max dispatch at off-tile shapes, values and
    first-argmax-routed grads."""
    import jax

    rng = np.random.RandomState(hash(("gmp", B, N, k, C)) % 2 ** 31)
    y = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, N, k)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, N, C).astype(np.float32))

    def loss(y):
        return jnp.sum(G.graph_max_pool(y, idx) * w)

    res = {}
    for backend in ("xla", "pallas"):
        G.set_backend(backend)
        try:
            res[backend] = (np.asarray(G.graph_max_pool(y, idx)),
                            np.asarray(jax.grad(loss)(y)))
        finally:
            G.set_backend("auto")
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0],
                               atol=1e-6)
    np.testing.assert_allclose(res["pallas"][1], res["xla"][1],
                               atol=1e-5)


def test_blend_impl_knob_contract():
    """A typo'd HITADV_BLEND_IMPL value must fail loudly (same
    contract as HITADV_EXTRACT_LAYOUT), and the default auto mode
    must never route the attack through the rejected kernel pair."""
    assert G.blend_negdt_active(256) is False          # auto == xla
    with pytest.raises(ValueError):
        G.set_blend_impl("palas")                      # the typo class
    assert G._BLEND_IMPL == "auto"                     # unchanged
    G.set_blend_impl("pallas")
    try:
        assert G.blend_negdt_active(2) is True
    finally:
        G.set_blend_impl("auto")


@pytest.mark.parametrize("B,N,bw", [(1, 137, 0.12), (2, 301, 0.25),
                                    (3, 65, 0.4)])
def test_kde_density_backends_agree(B, N, bw):
    """PointConv KDE dispatch at off-tile N, values + grads (the XLA
    path's matmul-form distances carry ~1e-6 cancellation near d=0;
    targeted tests pin the tolerance class)."""
    import jax

    rng = np.random.RandomState(hash(("kde", B, N)) % 2 ** 31)
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(B, N).astype(np.float32))

    def loss(x):
        return jnp.sum(G.kde_density(x, bw) * w)

    res = {}
    for backend in ("xla", "pallas"):
        G.set_backend(backend)
        try:
            res[backend] = (np.asarray(G.kde_density(xyz, bw)),
                            np.asarray(jax.grad(loss)(xyz)))
        finally:
            G.set_backend("auto")
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(res["pallas"][1], res["xla"][1],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,N,K,C", [(2, 137, 16, 24), (1, 300, 8, 40),
                                     (3, 999, 24, 8)])
def test_linear_bn_max_backends_agree(B, N, K, C):
    """Fused linear+BN+global-max dispatch (max_linear_pallas) vs the
    unfused composition at off-tile N, values + the first-argmax
    sparse backward (ties are measure-zero on continuous data)."""
    import jax
    from hitadv_tpu.nn import functional as F

    rng = np.random.RandomState(hash(("mlm", B, N, K, C)) % 2 ** 31)
    lin = {"w": jnp.asarray(rng.randn(K, C).astype(np.float32) * 0.2),
           "b": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)}
    bn = {"scale": jnp.asarray(0.5 + rng.rand(C).astype(np.float32)),
          "bias": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
          "mean": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
          "var": jnp.asarray(0.5 + rng.rand(C).astype(np.float32))}
    x = jnp.asarray(rng.randn(B, N, K).astype(np.float32))
    w = jnp.asarray(rng.randn(B, C).astype(np.float32))

    def loss(x):
        return jnp.sum(F.linear_bn_max(lin, bn, x) * w)

    res = {}
    for backend in ("xla", "pallas"):
        G.set_backend(backend)
        try:
            res[backend] = (np.asarray(F.linear_bn_max(lin, bn, x)),
                            np.asarray(jax.grad(loss)(x)))
        finally:
            G.set_backend("auto")
    np.testing.assert_allclose(res["pallas"][0], res["xla"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(res["pallas"][1], res["xla"][1],
                               rtol=1e-4, atol=1e-4)
