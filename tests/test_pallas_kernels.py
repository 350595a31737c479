"""Pallas kernel parity tests (interpreter mode on the CPU mesh)."""


import functools
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.ops import geometry as G
from hitadv_tpu.ops import pallas_kernels as PK


class TestKNNPallas:
    @pytest.mark.parametrize("B,Nq,N,k", [(2, 64, 64, 5), (1, 100, 200, 9),
                                          (3, 33, 70, 17)])
    def test_matches_xla(self, rng, B, Nq, N, k):
        q = jnp.array(rng.randn(B, Nq, 3).astype(np.float32))
        p = jnp.array(rng.randn(B, N, 3).astype(np.float32))
        ref = G._knn_xla(q, p, k)
        d, i = PK.knn_pallas(q, p, k, tile_q=32)
        np.testing.assert_allclose(np.asarray(d), np.asarray(ref.dists),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref.idx))

    def test_self_query(self, rng):
        x = jnp.array(rng.randn(2, 96, 3).astype(np.float32))
        d, i = PK.knn_pallas(x, x, 8)
        # nearest neighbor of each point is itself at distance ~0
        np.testing.assert_allclose(np.asarray(d[..., 0]), 0.0, atol=1e-5)
        self_idx = np.arange(96)[None, :]
        np.testing.assert_array_equal(np.asarray(i[..., 0]),
                                      np.broadcast_to(self_idx, (2, 96)))

    def test_grad_through_dispatch(self, rng):
        # force the pallas path and check the custom VJP matches XLA
        q = jnp.array(rng.randn(2, 32, 3).astype(np.float32))
        p = jnp.array(rng.randn(2, 48, 3).astype(np.float32))
        G.set_backend("pallas")
        try:
            g_pal = jax.grad(
                lambda q, p: jnp.sum(G.knn_points(q, p, 5).dists))(q, p)
        finally:
            G.set_backend("auto")
        g_xla = jax.grad(
            lambda q, p: jnp.sum(G._knn_xla(q, p, 5).dists))(q, p)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                                   atol=1e-4)

    def test_grad_wrt_points_scatter(self, rng):
        q = jnp.array(rng.randn(1, 16, 3).astype(np.float32))
        p = jnp.array(rng.randn(1, 24, 3).astype(np.float32))
        G.set_backend("pallas")
        try:
            gp_pal = jax.grad(
                lambda p: jnp.sum(G.knn_points(q, p, 4).dists ** 2))(p)
        finally:
            G.set_backend("auto")
        gp_xla = jax.grad(
            lambda p: jnp.sum(G._knn_xla(q, p, 4).dists ** 2))(p)
        np.testing.assert_allclose(np.asarray(gp_pal), np.asarray(gp_xla),
                                   atol=1e-4)


class TestBallQueryPallas:
    @pytest.mark.parametrize("B,N,S,ns,r", [
        (2, 256, 128, 32, 0.2),
        (1, 333, 77, 16, 0.4),       # ragged sizes (lane/tile padding)
        (3, 128, 8, 64, 0.1),        # sparse balls -> pad-with-first
        (2, 64, 16, 8, 3.0),         # everything in-ball
        (1, 200, 50, 24, 1e-3),      # mostly-empty balls -> clamp path
    ])
    def test_matches_xla_bitwise(self, rng, B, N, S, ns, r):
        xyz = jnp.array(rng.rand(B, N, 3).astype(np.float32))
        new = jnp.array(rng.rand(B, S, 3).astype(np.float32))
        # exact self-centers exercise the d=0 rim case
        new = new.at[:, :4].set(xyz[:, :4])
        G.set_backend("xla")
        try:
            ref = np.asarray(G.query_ball_point(r, ns, xyz, new))
        finally:
            G.set_backend("auto")
        got = np.asarray(PK.ball_query_pallas(r, ns, xyz, new))
        np.testing.assert_array_equal(got, ref)

    def test_dispatch(self, rng):
        xyz = jnp.array(rng.rand(1, 96, 3).astype(np.float32))
        new = xyz[:, :24]
        G.set_backend("pallas")
        try:
            a = np.asarray(G.query_ball_point(0.25, 12, xyz, new))
        finally:
            G.set_backend("auto")
        G.set_backend("xla")
        try:
            b = np.asarray(G.query_ball_point(0.25, 12, xyz, new))
        finally:
            G.set_backend("auto")
        np.testing.assert_array_equal(a, b)


class TestFPSPallas:
    @pytest.mark.parametrize("B,N,npoint", [(2, 128, 32), (1, 200, 64),
                                            (4, 96, 96)])
    def test_matches_xla_fixed_start(self, rng, B, N, npoint):
        x = jnp.array(rng.randn(B, N, 3).astype(np.float32))
        ref = G.farthest_point_sample(x, npoint, start_idx=0)
        got = PK.fps_pallas(x, npoint)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_random_start_matches(self, rng):
        x = jnp.array(rng.randn(2, 64, 3).astype(np.float32))
        key = jax.random.PRNGKey(5)
        ref = G.farthest_point_sample(x, 16, key=key)
        got = PK.fps_pallas(x, 16, key=key)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_nondiff_through_model_grad(self, rng):
        # FPS inside a differentiated function must not break autodiff
        x = jnp.array(rng.randn(1, 64, 3).astype(np.float32))
        G.set_backend("pallas")
        try:
            def f(x):
                idx = G.farthest_point_sample(x, 8)
                return jnp.sum(G.index_points(x, idx) ** 2)

            g = jax.grad(f)(x)
        finally:
            G.set_backend("auto")
        assert np.isfinite(np.asarray(g)).all()


class TestGraphMaxPool:
    """Fused EdgeConv neighbor reduction (one-hot MXU kernels)."""

    def _oracle(self, y, idx):
        # gather y[b, idx[b,n,j], c] then max over j
        B, N, k = idx.shape
        C = y.shape[-1]
        out = np.empty((B, N, k, C), y.dtype)
        for b in range(B):
            out[b] = y[b][idx[b]]
        return out.max(axis=2)

    @pytest.mark.parametrize("B,N,k,C", [(2, 128, 5, 8), (1, 256, 20, 64),
                                         (2, 130, 3, 16)])
    def test_fwd_matches_oracle(self, rng, B, N, k, C):
        y = rng.randn(B, N, C).astype(np.float32)
        idx = rng.randint(0, N, size=(B, N, k)).astype(np.int32)
        want = self._oracle(y, idx)
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                got = np.asarray(G.graph_max_pool(jnp.array(y),
                                                  jnp.array(idx)))
            finally:
                G.set_backend("auto")
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg=backend)

    def test_grad_matches_across_backends(self, rng):
        B, N, k, C = 2, 128, 7, 16
        y = jnp.array(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.array(rng.randint(0, N, size=(B, N, k)).astype(np.int32))
        w = jnp.array(rng.randn(B, N, C).astype(np.float32))

        def loss(y):
            return jnp.sum(G.graph_max_pool(y, idx) * w)

        grads = {}
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                grads[backend] = np.asarray(jax.grad(loss)(y))
            finally:
                G.set_backend("auto")
        np.testing.assert_allclose(grads["xla"], grads["pallas"],
                                   atol=1e-5)

    def test_grad_routes_to_argmax_rows(self, rng):
        # tiny hand-checkable case through the XLA fallback
        G.set_backend("xla")
        try:
            y = jnp.array([[[1.0], [5.0], [3.0]]])          # [1, 3, 1]
            idx = jnp.array([[[0, 1], [1, 2], [2, 0]]],
                            jnp.int32)                       # [1, 3, 2]
            out = G.graph_max_pool(y, idx)
            np.testing.assert_allclose(np.asarray(out[0, :, 0]),
                                       [5.0, 5.0, 3.0])
            g = jax.grad(lambda y: jnp.sum(G.graph_max_pool(y, idx)))(y)
            # rows 1 (x2 wins twice) and 2 (wins once) get gradient
            np.testing.assert_allclose(np.asarray(g[0, :, 0]),
                                       [0.0, 2.0, 1.0])
        finally:
            G.set_backend("auto")

    def test_dgcnn_fused_apply_matches_reference_path(self, rng):
        from hitadv_tpu.models import dgcnn
        from hitadv_tpu.nn import functional as nnF

        cfg = dgcnn.DGCNNConfig(k=6)
        params = dgcnn.init(jax.random.PRNGKey(0), cfg=cfg)
        x = jnp.array(rng.randn(2, 128, 3).astype(np.float32) * 0.5)
        apply = dgcnn.make_apply(cfg)
        fused = apply(params, x)                             # eval: fused
        # reference edge-grid path (train-mode branch, frozen stats)
        records = []
        with nnF.bn_training(records):
            pass  # just verifying flag flips the branch below
        ref_logits = _dgcnn_reference_path(params, x, cfg)
        np.testing.assert_allclose(np.asarray(fused),
                                   np.asarray(ref_logits), atol=3e-4)


def _dgcnn_reference_path(params, x, cfg):
    """The original [B,N,k,2C] edge-grid formulation, for equivalence."""
    from hitadv_tpu.models.dgcnn import get_graph_feature
    from hitadv_tpu.nn import functional as F

    feats = []
    h = x
    for i in range(1, 5):
        e = get_graph_feature(h, cfg.k)
        e = F.leaky_relu(F.batchnorm(params[f"bn{i}"],
                                     F.linear(params[f"conv{i}"], e)))
        h = jnp.max(e, axis=2)
        feats.append(h)
    h = jnp.concatenate(feats, axis=-1)
    h = F.leaky_relu(F.batchnorm(params["bn5"],
                                 F.linear(params["conv5"], h)))
    g = jnp.concatenate([jnp.max(h, 1), jnp.mean(h, 1)], -1)
    g = F.leaky_relu(F.batchnorm(params["bn6"],
                                 F.linear(params["linear1"], g)))
    g = F.leaky_relu(F.batchnorm(params["bn7"],
                                 F.linear(params["linear2"], g)))
    return F.linear(params["linear3"], g)


class TestGatherRowsMXU:
    """Large-gather custom VJP: scatter-add bwd as one-hot matmuls."""

    def test_grad_matches_xla_scatter(self, rng):
        B, N, S, ns, C = 2, 256, 64, 16, 8
        y = jnp.array(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.array(rng.randint(0, N, (B, S, ns)).astype(np.int32))
        w = jnp.array(rng.randn(B, S, ns, C).astype(np.float32))

        def loss(y):
            return jnp.sum(G.index_points(y, idx) * w)

        grads = {}
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                grads[backend] = np.asarray(jax.grad(loss)(y))
            finally:
                G.set_backend("auto")
        np.testing.assert_allclose(grads["pallas"], grads["xla"],
                                   atol=1e-4)

    def test_fwd_identical(self, rng):
        B, N = 2, 192
        y = jnp.array(rng.randn(B, N, 5).astype(np.float32))
        idx = jnp.array(rng.randint(0, N, (B, 300, 4)).astype(np.int32))
        outs = {}
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                outs[backend] = np.asarray(G.index_points(y, idx))
            finally:
                G.set_backend("auto")
        np.testing.assert_array_equal(outs["pallas"], outs["xla"])

    def test_bf16_mxu_gather_fwd_exact(self, rng):
        """bf16 forwards >= 2048 flat rows ride the one-hot MXU gather
        (gather_rows_pallas) — must be bitwise equal to take_along_axis
        (each one-hot row contributes exactly one 1.0 * value product,
        accumulated alone in f32; verified EXACT on hardware too)."""
        B, N, C = 2, 256, 35
        y = jnp.array(rng.randn(B, N, C).astype(np.float32)
                      ).astype(jnp.bfloat16)
        idx = jnp.array(rng.randint(0, N, (B, 1024, 4)).astype(np.int32))
        want = np.asarray(jnp.take_along_axis(
            y, idx.reshape(B, -1)[..., None], axis=1)
        ).reshape(B, 1024, 4, C)
        G.set_backend("pallas")
        try:
            direct = np.asarray(
                PK.gather_rows_pallas(y, idx.reshape(B, -1))
            ).reshape(B, 1024, 4, C)
            got = np.asarray(G.index_points(y, idx))
        finally:
            G.set_backend("auto")
        np.testing.assert_array_equal(direct, want)
        np.testing.assert_array_equal(got, want)

    def test_f32_mxu_gather_fwd_exact(self, rng):
        """f32 forwards ride the one-hot MXU gather via an exact
        3-plane bf16 decomposition (hi|mid|lo, lax.reduce_precision —
        an astype round-trip is elided under
        --xla_allow_excess_precision). Must be bitwise equal."""
        B, N, C = 2, 256, 3
        y = jnp.array(rng.randn(B, N, C).astype(np.float32) * 3)
        idx = jnp.array(rng.randint(0, N, (B, 4096)).astype(np.int32))
        want = np.asarray(jnp.take_along_axis(y, idx[..., None], axis=1))
        G.set_backend("pallas")
        try:
            got = np.asarray(PK.gather_rows_pallas(y, idx))
        finally:
            G.set_backend("auto")
        np.testing.assert_array_equal(got, want)


class TestBackendDispatch:
    def test_set_backend_validation(self):
        with pytest.raises(ValueError):
            G.set_backend("cuda")
        assert G.get_backend() == "auto"

    def test_xla_backend_forced(self, rng):
        x = jnp.array(rng.randn(1, 32, 3).astype(np.float32))
        G.set_backend("xla")
        try:
            res = G.knn_points(x, x, 4)
        finally:
            G.set_backend("auto")
        assert res.idx.shape == (1, 32, 4)


class TestEdgeShapes:
    def test_fps_non_multiple_of_128(self, rng):
        x = jnp.array(rng.randn(2, 300, 3).astype(np.float32))
        ref = G.farthest_point_sample(x, 50, start_idx=0)
        got = PK.fps_pallas(x, 50)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_knn_bf16_inputs(self, rng):
        x32 = rng.randn(2, 128, 16).astype(np.float32)
        xb = jnp.array(x32).astype(jnp.bfloat16)
        d, i = PK.knn_pallas(xb, xb, 5)
        assert d.dtype == jnp.float32
        # agree with f32 XLA on the bf16-rounded values
        ref = G._knn_xla(xb.astype(jnp.float32),
                         xb.astype(jnp.float32), 5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref.idx))

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_gather_group_bitwise(self, rng, dtype):
        """Grouped neighbors-major gather == take_along_axis bitwise
        (bf16 native pass; f32 3-plane split), and the VJP scatter
        matches the flat scatter_add kernel on the same cotangent."""
        dt = jnp.dtype(dtype)
        pts = jnp.asarray(rng.randn(2, 200, 16), jnp.float32).astype(dt)
        idx = jnp.asarray(rng.randint(0, 200, (2, 40, 32)), jnp.int32)
        got = PK.gather_group_pallas(pts, idx)          # [B, ns, S, C]
        ref = jnp.transpose(jnp.take_along_axis(
            pts, idx.reshape(2, -1)[..., None], axis=1
        ).reshape(2, 40, 32, 16), (0, 2, 1, 3))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        g = jnp.asarray(rng.randn(2, 32, 40, 16), jnp.float32).astype(dt)
        grouped = PK.scatter_add_group_pallas(idx, g, 200)
        gsm = jnp.transpose(g, (0, 2, 1, 3))            # [B, S, ns, C]
        flat = PK.scatter_add_rows_pallas(idx.reshape(2, -1),
                                          gsm.reshape(2, -1, 16), 200)
        np.testing.assert_allclose(np.asarray(grouped, np.float32),
                                   np.asarray(flat, np.float32),
                                   rtol=0, atol=5e-5)

    def test_group_tile_vmem_cap(self):
        """The S-tile shrinks until the [1, ns, tile, C] block is
        under ~6 MB (the PCT group1 f32 8 MB block blew Mosaic's 16 MB
        scoped-VMEM stack); measured-good bf16 cases keep their
        probed tiles."""
        # the shape that crashed: f32, ns=32, C=256 -> 128 (4.2 MB)
        assert PK._group_tile(256, 32, 256, jnp.float32, 256) == 128
        # probed-good bf16 cases stay at 256
        assert PK._group_tile(256, 32, 256, jnp.bfloat16, 256) == 256
        assert PK._group_tile(256, 32, 64, jnp.bfloat16, 512) == 256
        # never above S
        assert PK._group_tile(256, 32, 64, jnp.bfloat16, 40) == 40
        # wide rows keep shrinking below 64 — the cap must always win
        # (ns=128, C=1024 f32 is 512 KB/row; tile=64 would be a 32 MB
        # block, double the 16 MB scoped-VMEM stack)
        assert PK._group_tile(256, 128, 1024, jnp.float32, 512) == 8
        # a row wider than the cap even at the one-sublane tile has NO
        # valid tile: the kernel refuses (a tile=8 return here would be
        # a guaranteed Mosaic scoped-VMEM compile crash on hardware —
        # ns=512, C=4096 f32 is 8 MB/row) and geometry.gather_group_nm's
        # dispatch gate routes such shapes to the XLA path instead
        with pytest.raises(ValueError, match="cannot fit"):
            PK._group_tile(256, 512, 4096, jnp.float32, 512)

    def test_gather_group_nm_wide_row_takes_xla_path(self, rng):
        """Shapes whose one-sublane block exceeds the grouped kernels'
        VMEM cap must dispatch to XLA, not the Pallas kernel (which
        raises for them)."""
        from hitadv_tpu.ops import set_backend

        pts = jnp.asarray(rng.randn(1, 256, 13000), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 256, (1, 64, 32)), jnp.int32)
        set_backend("pallas")
        try:
            out = G.gather_group_nm(pts, idx)   # 13000*32*4 > 6 MB/8
        finally:
            set_backend("auto")
        want = jnp.transpose(G.index_points(pts, idx), (0, 2, 1, 3))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    def test_gather_group_nm_fwd_bwd_vs_xla(self, rng):
        """G.gather_group_nm value and grad equal the XLA autodiff
        formulation (transpose of index_points)."""
        from hitadv_tpu.ops import set_backend

        pts = jnp.asarray(rng.randn(2, 256, 8), jnp.float32)
        idx = jnp.asarray(rng.randint(0, 256, (2, 128, 16)), jnp.int32)
        w = jnp.asarray(rng.randn(2, 16, 128, 8), jnp.float32)

        def loss(p):
            return jnp.sum(G.gather_group_nm(p, idx) * w)

        outs = {}
        for be in ("pallas", "xla"):
            set_backend(be)
            try:
                outs[be] = jax.value_and_grad(loss)(pts)
            finally:
                set_backend("auto")
        np.testing.assert_allclose(float(outs["pallas"][0]),
                                   float(outs["xla"][0]), rtol=1e-6)
        # hi|lo f32 scatter contract: ~2^-17 relative per contribution
        np.testing.assert_allclose(np.asarray(outs["pallas"][1]),
                                   np.asarray(outs["xla"][1]),
                                   rtol=2e-5, atol=1e-4)

    def test_knn_dot_precision_policy(self, rng):
        """bf16-origin operands take the one-pass DEFAULT dot (exact:
        the f32 upcast is the identity on bf16 values — hardware-
        asserted bitwise in scripts/tpu_verify.py); any f32 operand
        must keep HIGHEST (the MXU's DEFAULT rounds f32 operands to
        bf16 — CLAUDE.md Mosaic rule 5)."""
        from jax import lax

        bf = jnp.zeros((2, 8, 4), jnp.bfloat16)
        f32 = jnp.zeros((2, 8, 4), jnp.float32)
        assert PK._knn_dot_precision(bf, bf) == lax.Precision.DEFAULT
        assert PK._knn_dot_precision(f32, f32) == lax.Precision.HIGHEST
        assert PK._knn_dot_precision(bf, f32) == lax.Precision.HIGHEST
        assert PK._knn_dot_precision(f32, bf) == lax.Precision.HIGHEST


class TestPopulationWithHiTADV:
    def test_composes(self, rng):
        from hitadv_tpu.attacks import base, hit_adv
        from hitadv_tpu.data import synthetic_clouds
        from hitadv_tpu.models import pointnet
        from hitadv_tpu.parallel import population_attack

        pts, labels = synthetic_clouds(2, num_points=64, seed=60)
        params = pointnet.init(jax.random.PRNGKey(0))
        attack = hit_adv.make_hit_adv(
            lambda x: pointnet.apply(params, x),
            base.make_adv_fn("logits", 30.0, False),
            hit_adv.HiTADVConfig(binary_step=1, num_iter=2,
                                 central_num=8, total_central_num=16,
                                 curv_loss_knn=4))
        pop = population_attack(attack, 2)
        res = pop(jnp.array(pts), jnp.array(labels),
                  jax.random.PRNGKey(0))
        assert res.adv_points.shape == (2, 64, 3)
        assert np.isfinite(np.asarray(res.adv_points)).all()


class TestGaussianBlend:
    """Fused HiT-ADV deformation field vs the XLA parity path."""

    def _inputs(self, rng, B=2, Cn=12, N=200):
        ori = rng.randn(B, N, 3).astype(np.float32)
        # centers coincide with cloud points (the real HiT-ADV setup) to
        # exercise the d ~ 0 / sqrt(1e-24) corner
        sel = rng.randint(0, N, size=(B, Cn))
        central = np.stack([ori[b, sel[b]] for b in range(B)])
        delta = (0.1 + rng.rand(B, Cn) * 1.1).astype(np.float32)
        pert = (rng.randn(B, Cn, 3) * 0.1).astype(np.float32)
        return (jnp.array(central), jnp.array(ori), jnp.array(delta),
                jnp.array(pert))

    def test_precomputed_negd_is_bitwise_identical(self, rng):
        # the HiT-ADV scan hoists the loop-invariant distance field via
        # neg_gaussian_field + gaussian_blend(negd=...) — values AND
        # pert/delta grads must match the inline path EXACTLY
        central, ori, delta, pert = self._inputs(rng, B=2, Cn=12, N=200)
        negd = G.neg_gaussian_field(central, ori)

        def loss(fn):
            def f(delta, pert):
                num, deno = fn(delta, pert)
                return jnp.sum(num ** 2) + jnp.sum(deno ** 2)
            return f

        base = loss(lambda d, p: G.gaussian_blend(central, ori, d, p))
        hoist = loss(lambda d, p: G.gaussian_blend(central, ori, d, p,
                                                   negd=negd))
        for f_b, f_h in ((base, hoist),):
            v_b, g_b = jax.value_and_grad(f_b, argnums=(0, 1))(delta,
                                                               pert)
            v_h, g_h = jax.value_and_grad(f_h, argnums=(0, 1))(delta,
                                                               pert)
            np.testing.assert_array_equal(np.asarray(v_b),
                                          np.asarray(v_h))
            for a, b in zip(g_b, g_h):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))

    @pytest.mark.parametrize("B,Cn,N", [(2, 12, 200), (1, 192, 512),
                                        (3, 8, 100)])
    def test_fwd_matches_xla(self, rng, B, Cn, N):
        args = self._inputs(rng, B, Cn, N)
        want_num, want_deno = G._gaussian_blend_xla(*args)
        num, deno = PK.gaussian_blend_pallas(*args)
        np.testing.assert_allclose(np.asarray(num), np.asarray(want_num),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(deno),
                                   np.asarray(want_deno),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_match_xla_all_args(self, rng):
        args = self._inputs(rng, B=2, Cn=12, N=130)
        w_num = jnp.array(rng.randn(2, 130, 3).astype(np.float32))
        w_deno = jnp.array(rng.randn(2, 130).astype(np.float32))

        def loss(fn, central, ori, delta, pert):
            num, deno = fn(central, ori, delta, pert)
            return jnp.sum(num * w_num) + jnp.sum(deno * w_deno)

        grads = {}
        for backend, fn in (("xla", G.gaussian_blend),
                            ("pallas", G.gaussian_blend_fused)):
            G.set_backend(backend)
            try:
                grads[backend] = jax.grad(
                    functools.partial(loss, fn), argnums=(0, 1, 2, 3))(
                        *args)
            finally:
                G.set_backend("auto")
        for g_x, g_p, name in zip(grads["xla"], grads["pallas"],
                                  ("central", "ori", "delta", "pert")):
            np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    @pytest.mark.parametrize("B,Cn,N", [(2, 12, 200), (1, 192, 512),
                                        (3, 8, 100), (2, 15, 130)])
    def test_negdt_fwd_matches_xla(self, rng, B, Cn, N):
        # schedule-pinned blend from the hoisted field (the B>=128
        # HiT-ADV route) vs the stock program
        central, ori, delta, pert = self._inputs(rng, B, Cn, N)
        negd = G.neg_gaussian_field(central, ori)
        negdt = jnp.swapaxes(negd, 1, 2)
        want_num, want_deno = G._blend_from_negd(negd, delta, pert)
        num, deno = PK.gaussian_blend_negdt_pallas(negdt, delta, pert)
        np.testing.assert_allclose(np.asarray(num), np.asarray(want_num),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(deno),
                                   np.asarray(want_deno),
                                   rtol=1e-5, atol=1e-6)

    def test_negdt_grads_match_xla_all_args(self, rng):
        central, ori, delta, pert = self._inputs(rng, B=2, Cn=12, N=130)
        negdt = jnp.swapaxes(G.neg_gaussian_field(central, ori), 1, 2)
        w_num = jnp.array(rng.randn(2, 130, 3).astype(np.float32))
        w_deno = jnp.array(rng.randn(2, 130).astype(np.float32))

        def loss(fn, negdt, delta, pert):
            num, deno = fn(negdt, delta, pert)
            return jnp.sum(num * w_num) + jnp.sum(deno * w_deno)

        want = jax.grad(functools.partial(
            loss, G._gaussian_blend_negdt_xla), argnums=(0, 1, 2))(
                negdt, delta, pert)
        G.set_backend("pallas")
        try:
            got = jax.grad(functools.partial(
                loss, G.gaussian_blend_negdt), argnums=(0, 1, 2))(
                    negdt, delta, pert)
        finally:
            G.set_backend("auto")
        for g_x, g_p, name in zip(want, got, ("negdt", "delta", "pert")):
            np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    def test_hit_adv_trajectory_invariant_across_blend_impls(self, rng):
        # the full attack with the kernel blend forced vs the stock
        # XLA blend — the B=256 dispatch must not change trajectories
        from hitadv_tpu.attacks import base, hit_adv
        from hitadv_tpu.data import synthetic_clouds
        from hitadv_tpu.models import pointnet

        pts, labels = synthetic_clouds(2, num_points=128, seed=62)
        params = pointnet.init(jax.random.PRNGKey(0))
        cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=4,
                                   central_num=16, total_central_num=32,
                                   curv_loss_knn=4)
        out = {}
        for impl in ("xla", "pallas"):
            G.set_blend_impl(impl)
            if impl == "pallas":
                G.set_backend("pallas")
            try:
                attack = hit_adv.make_hit_adv(
                    lambda x: pointnet.apply(params, x),
                    base.make_adv_fn("logits", 30.0, False), cfg)
                out[impl] = attack(jnp.array(pts), jnp.array(labels),
                                   jax.random.PRNGKey(3))
            finally:
                G.set_blend_impl("auto")
                G.set_backend("auto")
        np.testing.assert_allclose(np.asarray(out["xla"].adv_points),
                                   np.asarray(out["pallas"].adv_points),
                                   rtol=1e-4, atol=2e-5)

    def test_hit_adv_trajectory_invariant_across_backends(self, rng):
        from hitadv_tpu.attacks import base, hit_adv
        from hitadv_tpu.data import synthetic_clouds
        from hitadv_tpu.models import pointnet

        pts, labels = synthetic_clouds(2, num_points=128, seed=61)
        params = pointnet.init(jax.random.PRNGKey(0))
        cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=4,
                                   central_num=16, total_central_num=32,
                                   curv_loss_knn=4)
        out = {}
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                attack = hit_adv.make_hit_adv(
                    lambda x: pointnet.apply(params, x),
                    base.make_adv_fn("logits", 30.0, False), cfg)
                out[backend] = attack(jnp.array(pts), jnp.array(labels),
                                      jax.random.PRNGKey(3))
            finally:
                G.set_backend("auto")
        np.testing.assert_allclose(np.asarray(out["xla"].adv_points),
                                   np.asarray(out["pallas"].adv_points),
                                   rtol=1e-4, atol=2e-5)


class TestKDEDensity:
    """Fused PointConv KDE vs the XLA parity path."""

    @pytest.mark.parametrize("B,N,bw", [(2, 200, 0.1), (1, 512, 0.2),
                                        (3, 100, 0.4)])
    def test_fwd_matches_xla(self, rng, B, N, bw):
        xyz = jnp.array(rng.randn(B, N, 3).astype(np.float32))
        want = G._kde_density_xla(xyz, bw)
        got = PK.kde_density_pallas(xyz, bw)
        # the XLA path's matmul-form distances lose ~1e-6 absolute to
        # cancellation near d=0; the kernel's subtract form is exact
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-5)

    def test_grad_matches_xla(self, rng):
        xyz = jnp.array(rng.randn(2, 130, 3).astype(np.float32))
        w = jnp.array(rng.randn(2, 130).astype(np.float32))

        def loss(x, backend):
            G.set_backend(backend)
            try:
                return jnp.sum(G.kde_density(x, 0.15) * w)
            finally:
                G.set_backend("auto")

        g_x = jax.grad(lambda x: loss(x, "xla"))(xyz)
        g_p = jax.grad(lambda x: loss(x, "pallas"))(xyz)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-6)

    def test_pointconv_forward_invariant_across_backends(self, rng):
        from hitadv_tpu.models import pointconv

        params = pointconv.init(jax.random.PRNGKey(0), num_classes=10)
        x = jnp.array(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        out = {}
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                out[backend] = np.asarray(pointconv.apply(params, x))
            finally:
                G.set_backend("auto")
        np.testing.assert_allclose(out["pallas"], out["xla"],
                                   rtol=1e-4, atol=1e-4)


class TestPackedKNN:
    """Index-only packed single-reduction kernel vs the exact path."""

    @pytest.mark.parametrize("B,Nq,N,k,C", [(2, 64, 64, 5, 3),
                                            (1, 100, 200, 9, 3),
                                            (2, 128, 128, 20, 64)])
    def test_idx_matches_xla(self, rng, B, Nq, N, k, C):
        # scale up so squared-distance gaps exceed the 2^-ceil(log2(N))
        # truncation everywhere (random normals in 3-64 dims are far
        # from ties at this scale)
        q = jnp.array(rng.randn(B, Nq, C).astype(np.float32) * 2)
        p = jnp.array(rng.randn(B, N, C).astype(np.float32) * 2)
        want = G._knn_xla(q, p, k).idx
        _, got = PK.knn_pallas(q, p, k, tile_q=32, packed=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_self_query_first_neighbor(self, rng):
        x = jnp.array(rng.randn(2, 96, 3).astype(np.float32))
        _, i = PK.knn_pallas(x, x, 8, packed=True)
        self_idx = np.arange(96)[None, :]
        np.testing.assert_array_equal(np.asarray(i[..., 0]),
                                      np.broadcast_to(self_idx, (2, 96)))

    def test_duplicate_points_tie_break_lowest_index(self):
        # three identical points: packed uniqueness must break ties by
        # ascending index, like lax.top_k of the negated distances
        x = np.zeros((1, 8, 3), np.float32)
        x[0, 3:] = np.arange(5 * 3).reshape(5, 3)
        _, i = PK.knn_pallas(jnp.array(x), jnp.array(x), 4, packed=True)
        np.testing.assert_array_equal(np.asarray(i[0, 0]), [0, 1, 2, 3])

    def test_knn_idx_dispatch(self, rng):
        x = jnp.array(rng.randn(1, 64, 3).astype(np.float32) * 2)
        want = np.asarray(G._knn_xla(x, x, 6).idx)
        for backend in ("xla", "pallas"):
            G.set_backend(backend)
            try:
                got = np.asarray(G.knn_idx(x, x, 6))
            finally:
                G.set_backend("auto")
            np.testing.assert_array_equal(got, want, err_msg=backend)

    def test_knn_idx_f32_features_take_exact_kernel(self, rng):
        """Policy: f32 FEATURE-space knn_idx must be exact. Points are
        crafted with squared-distance gaps below the packed kernel's
        2^-ceil(log2(N)) truncation — packed dispatch would misorder
        them; the auto policy (exact kernel at C > 4 f32) must not.
        Measured on TPU: packed in DGCNN's feature kNN perturbed 2.5%
        of grad entries; the exact kernel reproduces XLA bitwise."""
        C, N = 64, 128
        base = rng.randn(1, 1, C).astype(np.float32)
        # neighbors at distance ~1 with squared-distance gaps of a few
        # f32 ULPs — far below the packed kernel's 7-bit mantissa
        # truncation quantum (2^-16 relative at N=128), so packing
        # quantizes them equal and tie-breaks by INDEX; the radii are
        # shuffled so index order differs from true distance order
        radii = 1.0 + rng.permutation(N) * 4e-7
        dirs = rng.randn(1, N, C).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        p = jnp.array(base + radii[None, :, None] * dirs)
        q = jnp.array(base)
        exact_idx = np.asarray(
            PK.knn_pallas(q, p, 8, packed=False)[1])
        packed_idx = np.asarray(
            PK.knn_pallas(q, p, 8, packed=True)[1])
        assert not np.array_equal(packed_idx, exact_idx), \
            "tie-rich fixture no longer exercises the truncation"
        G.set_backend("pallas")
        try:
            got = np.asarray(G.knn_idx(q, p, 8))
        finally:
            G.set_backend("auto")
        # the policy must have picked the exact kernel, not packed
        np.testing.assert_array_equal(got, exact_idx)


class TestTransposedLayout:
    """Sublane ("transposed") selection-loop layout vs the default.

    The transposed kernels must preserve selection semantics exactly:
    bitwise outputs for exact kNN / ball query / FPS, identical
    neighbor SETS for the packed kNN (its distances may differ by one
    truncation quantum from the transposed accumulation order).
    """

    @pytest.fixture
    def sublanes(self):
        PK.set_extract_layout("sublanes")
        try:
            yield
        finally:
            PK.set_extract_layout("auto")

    def test_layout_validation(self):
        with pytest.raises(ValueError):
            PK.set_extract_layout("diagonal")

    def test_auto_policy_per_op(self):
        """Default "auto" encodes the round-4 hardware verdict: sublane
        layout for the kNN/ball-query selection loops, lane layout for
        FPS (probes measured sublanes 2.5x SLOWER there — the argmax
        tree sits on FPS's serial critical path)."""
        assert PK.get_extract_layout() == "auto"
        assert PK._use_transposed(1024, "knn_exact")
        assert PK._use_transposed(1024, "knn_packed")
        assert PK._use_transposed(1024, "ballq")
        assert not PK._use_transposed(1024, "fps")
        # forcing works both ways, for every op
        PK.set_extract_layout("sublanes")
        try:
            assert PK._use_transposed(1024, "fps")
        finally:
            PK.set_extract_layout("lanes")
        try:
            assert not PK._use_transposed(1024, "knn_exact")
        finally:
            PK.set_extract_layout("auto")
        # >25% pow2 pad falls back regardless of policy
        assert not PK._use_transposed(300, "knn_exact")

    @pytest.mark.parametrize("C", [3, 64])
    def test_knn_exact_same_selection(self, rng, sublanes, C):
        # distances agree to FMA-association noise only (~2 ulp): the
        # compiler contracts the rank-1/dot cross term differently in
        # the two layouts, so exact-equality of dists is fusion luck,
        # not a contract. Selections must match on generic data.
        q = jnp.array(rng.randn(2, 256, C).astype(np.float32))
        p = jnp.array(rng.randn(2, 512, C).astype(np.float32))
        PK.set_extract_layout("lanes")
        d0, i0 = PK.knn_pallas(q, p, 12)
        PK.set_extract_layout("sublanes")
        d1, i1 = PK.knn_pallas(q, p, 12)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                                   atol=1e-5)

    def test_knn_packed_same_neighbors(self, rng, sublanes):
        x = jnp.array(rng.randn(2, 512, 64).astype(np.float32))
        PK.set_extract_layout("lanes")
        _, i0 = PK.knn_pallas(x, x, 20, packed=True)
        PK.set_extract_layout("sublanes")
        _, i1 = PK.knn_pallas(x, x, 20, packed=True)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_knn_non_pow2_n_pads(self, rng, sublanes):
        # N=300 pads to 512 (>25%): dispatcher must fall back to the
        # lane layout rather than eat a 70% pad — output equality is
        # the only externally visible contract either way
        q = jnp.array(rng.randn(1, 40, 3).astype(np.float32))
        p = jnp.array(rng.randn(1, 300, 3).astype(np.float32))
        ref = G._knn_xla(q, p, 7)
        d, i = PK.knn_pallas(q, p, 7)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref.idx))
        # N=224 pads to 256 (<25%): transposed path taken, same contract
        p2 = jnp.array(rng.randn(1, 224, 3).astype(np.float32))
        ref2 = G._knn_xla(q, p2, 7)
        _, i2 = PK.knn_pallas(q, p2, 7)
        np.testing.assert_array_equal(np.asarray(i2),
                                      np.asarray(ref2.idx))

    def test_ball_query_bitwise(self, rng, sublanes):
        xyz = jnp.array((rng.rand(2, 512, 3) * 2 - 1).astype(np.float32))
        centers = xyz[:, :128]
        PK.set_extract_layout("lanes")
        i0 = PK.ball_query_pallas(0.3, 24, xyz, centers)
        PK.set_extract_layout("sublanes")
        i1 = PK.ball_query_pallas(0.3, 24, xyz, centers)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    @pytest.mark.parametrize("B", [1, 3])
    def test_fps_bitwise(self, rng, sublanes, B):
        xyz = jnp.array(rng.randn(B, 256, 3).astype(np.float32))
        start = jnp.array(rng.randint(0, 256, size=(B,)).astype(np.int32))
        PK.set_extract_layout("lanes")
        i0 = PK.fps_pallas_from_start(xyz, 64, start)
        PK.set_extract_layout("sublanes")
        i1 = PK.fps_pallas_from_start(xyz, 64, start)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_geometry_dispatch_unchanged(self, rng, sublanes):
        # public API end-to-end under the transposed layout
        x = jnp.array(rng.randn(2, 256, 3).astype(np.float32))
        G.set_backend("pallas")
        try:
            idx_t = np.asarray(G.knn_idx(x, x, 9))
        finally:
            G.set_backend("auto")
        ref = np.asarray(G._knn_xla(x, x, 9).idx)
        np.testing.assert_array_equal(idx_t, ref)
