"""Unit tests for hitadv_tpu.ops.geometry against brute-force NumPy oracles.

Implements the test pyramid level (a) from SURVEY.md §4: each geometry
kernel vs. an independent NumPy implementation, including gradient checks
for the differentiable gathers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import ops


# --------------------------------------------------------------------------
# NumPy oracles
# --------------------------------------------------------------------------

def np_square_distance(src, dst):
    # brute force [B, N, M]
    return np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)


def np_fps(xyz, npoint, start):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        dist = np.full(N, 1e10)
        far = start
        for i in range(npoint):
            out[b, i] = far
            d = np.sum((xyz[b] - xyz[b, far]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sq = np_square_distance(new_xyz, xyz)
    out = np.zeros((B, S, nsample), dtype=np.int64)
    for b in range(B):
        for s in range(S):
            idx = np.where(sq[b, s] <= radius ** 2)[0]
            if len(idx) == 0:
                # reference semantics: sentinel N everywhere -> first stays N;
                # degenerate, excluded from tests (reference would also break)
                out[b, s] = N
                continue
            take = idx[:nsample]
            pad = np.full(nsample - len(take), take[0])
            out[b, s] = np.concatenate([take, pad])
    return out


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------

class TestSquareDistance:
    def test_matches_bruteforce(self, rng):
        src = rng.randn(2, 17, 3).astype(np.float32)
        dst = rng.randn(2, 23, 3).astype(np.float32)
        got = np.asarray(ops.square_distance(jnp.array(src), jnp.array(dst)))
        want = np_square_distance(src, dst)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_self_distance_diag_zero(self, rng):
        pts = rng.randn(1, 32, 3).astype(np.float32)
        d = np.asarray(ops.pairwise_distance(jnp.array(pts)))
        np.testing.assert_allclose(np.diagonal(d[0]), 0.0, atol=1e-5)


class TestIndexPoints:
    def test_2d_idx(self, rng):
        pts = rng.randn(3, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, size=(3, 7))
        got = np.asarray(ops.index_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(3)])
        np.testing.assert_array_equal(got, want)

    def test_3d_idx(self, rng):
        pts = rng.randn(2, 16, 3).astype(np.float32)
        idx = rng.randint(0, 16, size=(2, 5, 4))
        got = np.asarray(ops.index_points(jnp.array(pts), jnp.array(idx)))
        want = np.stack([pts[b][idx[b].ravel()].reshape(5, 4, 3)
                         for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_gather_grad_is_scatter_add(self, rng):
        # duplicate indices must accumulate gradient (the CUDA *_grad
        # kernels' atomicAdd semantics, sampling_gpu.cu:33-57)
        pts = jnp.array(rng.randn(1, 4, 2).astype(np.float32))
        idx = jnp.array([[0, 0, 3]])
        g = jax.grad(lambda p: jnp.sum(ops.index_points(p, idx)))(pts)
        want = np.zeros((1, 4, 2), np.float32)
        want[0, 0] = 2.0
        want[0, 3] = 1.0
        np.testing.assert_allclose(np.asarray(g), want)


class TestKNN:
    def test_knn_points_matches_bruteforce(self, rng):
        q = rng.randn(2, 9, 3).astype(np.float32)
        p = rng.randn(2, 31, 3).astype(np.float32)
        res = ops.knn_points(jnp.array(q), jnp.array(p), 5)
        sq = np_square_distance(q, p)
        want_idx = np.argsort(sq, axis=-1)[..., :5]
        np.testing.assert_array_equal(np.asarray(res.idx), want_idx)
        want_d = np.sort(sq, axis=-1)[..., :5]
        np.testing.assert_allclose(np.asarray(res.dists), want_d, atol=1e-4)

    def test_knn_indices_excludes_self(self, rng):
        pts = rng.randn(1, 40, 3).astype(np.float32)
        dists, idx = ops.knn_indices(jnp.array(pts), k=4)
        # self (dist 0) dropped -> all returned dists strictly positive
        assert np.asarray(dists).min() > 0
        self_idx = np.arange(40)[None, :, None]
        assert not np.any(np.asarray(idx) == self_idx)

    def test_knn_gather(self, rng):
        pts = rng.randn(2, 12, 3).astype(np.float32)
        res = ops.knn_points(jnp.array(pts), jnp.array(pts), 3)
        gathered = np.asarray(ops.knn_gather(jnp.array(pts), res.idx))
        assert gathered.shape == (2, 12, 3, 3)
        np.testing.assert_allclose(gathered[:, :, 0, :], pts, atol=1e-6)


class TestFPS:
    def test_fixed_start_matches_oracle(self, rng):
        xyz = rng.randn(2, 64, 3).astype(np.float32)
        got = np.asarray(ops.farthest_point_sample(jnp.array(xyz), 16,
                                                   start_idx=0))
        want = np_fps(xyz, 16, 0)
        np.testing.assert_array_equal(got, want)

    def test_random_start_valid_and_distinct(self, rng):
        xyz = rng.randn(2, 64, 3).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(
            jnp.array(xyz), 16, key=jax.random.PRNGKey(3)))
        assert idx.min() >= 0 and idx.max() < 64
        for b in range(2):
            assert len(set(idx[b].tolist())) == 16

    def test_covers_spread(self):
        # FPS of 4 from clustered corners must pick one per corner
        corners = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 0]],
                           dtype=np.float32)
        pts = np.concatenate([corners, corners + 0.01], axis=0)[None]
        idx = np.asarray(ops.farthest_point_sample(jnp.array(pts), 4,
                                                   start_idx=0))[0]
        picked = pts[0][idx]
        # each corner within 0.1 of some picked point
        d = np_square_distance(corners[None], picked[None])[0]
        assert d.min(axis=1).max() < 0.1


class TestBallQuery:
    def test_matches_oracle(self, rng):
        xyz = rng.rand(2, 48, 3).astype(np.float32)
        centers_idx = rng.randint(0, 48, size=(2, 6))
        new_xyz = np.stack([xyz[b][centers_idx[b]] for b in range(2)])
        got = np.asarray(ops.query_ball_point(0.3, 8, jnp.array(xyz),
                                              jnp.array(new_xyz)))
        want = np_ball_query(0.3, 8, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_pad_with_first(self, rng):
        # isolated center with exactly one in-ball point -> all slots = it
        xyz = np.zeros((1, 4, 3), np.float32)
        xyz[0, 1] = [5, 5, 5]
        xyz[0, 2] = [9, 9, 9]
        xyz[0, 3] = [5.05, 5, 5]
        new_xyz = np.array([[[5, 5, 5]]], np.float32)
        idx = np.asarray(ops.query_ball_point(0.2, 4, jnp.array(xyz),
                                              jnp.array(new_xyz)))
        np.testing.assert_array_equal(idx[0, 0], [1, 3, 1, 1])


class TestSampleAndGroup:
    def test_shapes_and_centering(self, rng):
        xyz = rng.rand(2, 128, 3).astype(np.float32)
        feats = rng.randn(2, 128, 7).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group(
            16, 0.4, 8, jnp.array(xyz), jnp.array(feats))
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 3 + 7)

    def test_group_all(self, rng):
        xyz = rng.rand(2, 32, 3).astype(np.float32)
        feats = rng.randn(2, 32, 5).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group_all(
            jnp.array(xyz), jnp.array(feats))
        assert new_xyz.shape == (2, 1, 3)
        assert new_points.shape == (2, 1, 32, 8)
        np.testing.assert_allclose(np.asarray(new_points[..., :3])[0, 0],
                                   xyz[0], atol=1e-6)

    def test_knn_variant_shapes(self, rng):
        xyz = rng.rand(2, 64, 3).astype(np.float32)
        feats = rng.randn(2, 64, 6).astype(np.float32)
        new_xyz, new_points = ops.sample_and_group_knn(
            16, 8, jnp.array(xyz), jnp.array(feats))
        assert new_xyz.shape == (2, 16, 3)
        assert new_points.shape == (2, 16, 8, 12)


class TestThreeInterpolate:
    def test_three_nn(self, rng):
        unknown = rng.randn(2, 20, 3).astype(np.float32)
        known = rng.randn(2, 8, 3).astype(np.float32)
        d, idx = ops.three_nn(jnp.array(unknown), jnp.array(known))
        sq = np_square_distance(unknown, known)
        want_idx = np.argsort(sq, axis=-1)[..., :3]
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_allclose(np.asarray(d) ** 2,
                                   np.sort(sq, -1)[..., :3], atol=1e-4)

    def test_interpolate_exact_at_known_point(self, rng):
        known = rng.randn(1, 8, 3).astype(np.float32)
        feats = rng.randn(1, 8, 4).astype(np.float32)
        # query exactly at known point 2
        unknown = known[:, 2:3, :]
        d, idx = ops.three_nn(jnp.array(unknown), jnp.array(known))
        w = ops.interpolate_weights(d ** 2)
        out = np.asarray(ops.three_interpolate(jnp.array(feats), idx, w))
        np.testing.assert_allclose(out[0, 0], feats[0, 2], atol=1e-3)

    def test_interpolate_grad_flows(self, rng):
        known = jnp.array(rng.randn(1, 8, 3).astype(np.float32))
        feats = jnp.array(rng.randn(1, 8, 4).astype(np.float32))
        unknown = jnp.array(rng.randn(1, 5, 3).astype(np.float32))

        def f(feats):
            d, idx = ops.three_nn(unknown, known)
            w = ops.interpolate_weights(d ** 2)
            return jnp.sum(ops.three_interpolate(feats, idx, w))

        g = jax.grad(f)(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestHelpers:
    def test_l2_normalize(self, rng):
        x = jnp.array(rng.randn(4, 3).astype(np.float32))
        n = np.linalg.norm(np.asarray(ops.l2_normalize(x)), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)

    def test_median_lower_for_even(self):
        pc = jnp.array([[[1.0, 0, 0], [2.0, 0, 0],
                         [3.0, 0, 0], [4.0, 0, 0]]])
        m = np.asarray(ops.median_points(pc, axis=1))
        # torch.median picks the lower middle: 2.0
        assert m[0, 0] == 2.0


class TestJit:
    def test_ops_jit_compile(self, rng):
        xyz = jnp.array(rng.rand(2, 64, 3).astype(np.float32))

        @jax.jit
        def pipeline(xyz):
            idx = ops.farthest_point_sample(xyz, 16)
            centers = ops.index_points(xyz, idx)
            gid = ops.query_ball_point(0.5, 8, xyz, centers)
            return ops.index_points(xyz, gid)

        out = pipeline(xyz)
        assert out.shape == (2, 16, 8, 3)
