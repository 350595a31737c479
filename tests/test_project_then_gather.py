"""Project-then-gather first-layer fusion == reference formulation.

The eval-mode PointNet++ SA stages and PCT Local_ops run their first
MLP layer as one gather of a projected feature field (see
models/pointnet2._sa_apply / models/pct._local_op_fused). These tests
pin the fused paths against the reference concat formulation
(`model/pointnet2_utils.py:110-138`, `model/pct_utils.py:111-141`) at
reassociation-level tolerance — 100x tighter than the torch parity
tests — so a fusion bug cannot hide inside the cross-framework bound.
"""

import jax
import jax.numpy as jnp
import pytest

import hitadv_tpu.ops.geometry as G
from hitadv_tpu.models import pct, pointconv as PC, pointnet2 as P
from hitadv_tpu.nn import functional as F

TOL = 5e-6


def _ref_pointnet2(params, x):
    """apply() with the reference concat grouping (concat=True)."""
    def sa(p, cfg, xyz, pts):
        if cfg.group_all:
            nx, np_ = G.sample_and_group_all(xyz, pts)
        else:
            nx, np_ = G.sample_and_group(cfg.npoint, cfg.radius,
                                         cfg.nsample, xyz, pts)
        return nx, F.max_mid(F.mlp_apply(p, np_))

    l1x, l1p = sa(params["sa1"], P.SSG_STAGES[0], x, None)
    l2x, l2p = sa(params["sa2"], P.SSG_STAGES[1], l1x, l1p)
    _, l3p = sa(params["sa3"], P.SSG_STAGES[2], l2x, l2p)
    g = l3p[:, 0, :]
    g = F.relu(F.linear_bn(params["fc1"], params["bn1"], g))
    g = F.relu(F.linear_bn(params["fc2"], params["bn2"], g))
    return F.linear(params["fc3"], g)


def _ref_pct(params, x):
    """apply() with the reference concat grouping."""
    h = F.relu(F.linear_bn(params["conv1"], params["bn1"], x))
    h = F.relu(F.linear_bn(params["conv2"], params["bn2"], h))
    new_xyz, grouped = G.sample_and_group_knn(512, 32, x, h)
    feat0 = pct._local_op_apply(params["gather0"], grouped)
    new_xyz, grouped = G.sample_and_group_knn(256, 32, new_xyz, feat0)
    feat1 = pct._local_op_apply(params["gather1"], grouped)
    h = F.relu(F.linear_bn(params["pt_conv1"], params["pt_bn1"], feat1))
    h = F.relu(F.linear_bn(params["pt_conv2"], params["pt_bn2"], h))
    x1 = pct._sa_layer_apply(params["sa1"], h)
    x2 = pct._sa_layer_apply(params["sa2"], x1)
    x3 = pct._sa_layer_apply(params["sa3"], x2)
    x4 = pct._sa_layer_apply(params["sa4"], x3)
    hh = jnp.concatenate([x1, x2, x3, x4], axis=-1)
    hh = jnp.concatenate([hh, feat1], axis=-1)
    g = F.leaky_relu(F.linear_bn_max(params["conv_fuse"],
                                     params["bn_fuse"], hh))
    g = F.leaky_relu(F.linear_bn(params["linear1"], params["bn6"], g))
    g = F.leaky_relu(F.linear_bn(params["linear2"], params["bn7"], g))
    return F.linear(params["linear3"], g)


@pytest.fixture(scope="module")
def cloud():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 600, 3))


class TestPointNet2:
    def test_logits_match_reference_formulation(self, cloud):
        params = P.init(jax.random.PRNGKey(0), num_classes=10)
        fused = P.apply(params, cloud)
        ref = _ref_pointnet2(params, cloud)
        assert jnp.abs(fused - ref).max() < TOL

    def test_input_grads_match(self, cloud):
        # relative L2: reassociation drift can flip a relu/argmax
        # boundary, which legitimately moves isolated entries — the
        # aggregate must stay at float-noise level
        params = P.init(jax.random.PRNGKey(0), num_classes=10)
        g1 = jax.grad(lambda x: P.apply(params, x).sum())(cloud)
        g2 = jax.grad(lambda x: _ref_pointnet2(params, x).sum())(cloud)
        rel = jnp.linalg.norm(g1 - g2) / jnp.linalg.norm(g2)
        assert rel < 1e-4


class TestPCT:
    def test_logits_match_reference_formulation(self, cloud):
        params = pct.init(jax.random.PRNGKey(0), num_classes=10)
        fused = pct.apply(params, cloud)
        ref = _ref_pct(params, cloud)
        assert jnp.abs(fused - ref).max() < TOL

    def test_input_grads_match(self, cloud):
        # relative L2 (see TestPointNet2: boundary flips move entries)
        params = pct.init(jax.random.PRNGKey(0), num_classes=10)
        g1 = jax.grad(lambda x: pct.apply(params, x).sum())(cloud)
        g2 = jax.grad(lambda x: _ref_pct(params, x).sum())(cloud)
        rel = jnp.linalg.norm(g1 - g2) / jnp.linalg.norm(g2)
        assert rel < 1e-3


def _ref_pointconv_stage(p, stage, xyz, points):
    """One PointConv SA stage in the reference gather-then-slice
    formulation (`util/pointconv_util.py:334-401`): gather the
    [xyz | inv_density | feats] concat, normalize the xyz slice by the
    group center, run the full stage MLP / WeightNet on the grouped
    tensors."""
    B, N, _ = xyz.shape
    inv_density = 1.0 / G.kde_density(xyz, stage.bandwidth)
    if stage.group_all:
        new_xyz = jnp.mean(xyz, axis=1, keepdims=True)
        grouped_xyz = xyz[:, None] - new_xyz[:, :, None]
        new_points = (grouped_xyz, points[:, None])
        grouped_density = inv_density.reshape(B, 1, N)
    else:
        fps_idx = G.farthest_point_sample(xyz, stage.npoint, start_idx=0)
        new_xyz = G.index_points(xyz, fps_idx)
        idx = G.knn_point(stage.nsample, xyz, new_xyz)
        aug = jnp.concatenate(
            [xyz, inv_density[..., None], points], axis=-1)
        grouped_aug = G.index_points(aug, idx)
        grouped_xyz = grouped_aug[..., :3] - new_xyz[:, :, None, :]
        grouped_density = grouped_aug[..., 3]
        new_points = (grouped_xyz, grouped_aug[..., 4:])
    h = F.mlp_apply(p["mlp"], new_points)
    inv_max = PC._max_lastdim(grouped_density)
    scale = PC._densitynet_apply(
        p["densitynet"], (grouped_density / inv_max)[..., None])
    h = h * scale
    weights = PC._weightnet_apply(p["weightnet"], grouped_xyz)
    agg = jnp.einsum("bsnc,bsnw->bscw", h, weights,
                     preferred_element_type=jnp.float32)
    agg = agg.reshape(B, 1 if stage.group_all else stage.npoint, -1)
    out = F.relu(F.linear_bn(p["linear"], p["bn_linear"], agg))
    return new_xyz, out


def _ref_pointconv(params, x):
    xyz = x[..., :3]
    h_xyz, h = _ref_pointconv_stage(params["sa1"], PC.STAGES[0], xyz, xyz)
    h_xyz, h = _ref_pointconv_stage(params["sa2"], PC.STAGES[1], h_xyz, h)
    _, h = _ref_pointconv_stage(params["sa3"], PC.STAGES[2], h_xyz, h)
    g = h[:, 0, :]
    g = F.relu(F.linear_bn(params["fc1"], params["bn1"], g))
    g = F.relu(F.linear_bn(params["fc2"], params["bn2"], g))
    return F.linear(params["fc3"], g)


class TestPointConv:
    def test_logits_match_reference_formulation(self, cloud):
        params = PC.init(jax.random.PRNGKey(0), num_classes=10)
        fused = PC.apply(params, cloud)
        ref = _ref_pointconv(params, cloud)
        assert jnp.abs(fused - ref).max() < TOL

    def test_input_grads_match(self, cloud):
        # relative L2 (see TestPointNet2: boundary flips move entries)
        params = PC.init(jax.random.PRNGKey(0), num_classes=10)
        g1 = jax.grad(lambda x: PC.apply(params, x).sum())(cloud)
        g2 = jax.grad(lambda x: _ref_pointconv(params, x).sum())(cloud)
        rel = jnp.linalg.norm(g1 - g2) / jnp.linalg.norm(g2)
        assert rel < 1e-3

    def test_train_mode_keeps_reference_formulation(self, cloud):
        # the fused path is eval-only: under bn_training the stage must
        # run the reference grouping so BN sees the edge-grid stats
        params = PC.init(jax.random.PRNGKey(0), num_classes=10)
        with F.bn_training([]):
            out = PC.apply(params, cloud)
        assert out.shape == (2, 10)
        assert bool(jnp.isfinite(out).all())


def test_linear_parts_matches_concat():
    key = jax.random.PRNGKey(2)
    p = F.linear_init(key, 131, 64)
    a = jax.random.normal(jax.random.PRNGKey(3), (4, 7, 3))
    b = jax.random.normal(jax.random.PRNGKey(4), (4, 7, 128))
    full = F.linear(p, jnp.concatenate([a, b], axis=-1))
    split = F.linear(p, (a, b))
    assert jnp.abs(full - split).max() < 1e-5


def test_linear_parts_broadcasts_singleton_part():
    key = jax.random.PRNGKey(5)
    p = F.linear_init(key, 12, 8)
    a = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 9, 4))
    c = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 1, 8))
    tiled = jnp.broadcast_to(c, (2, 5, 9, 8))
    full = F.linear(p, jnp.concatenate([a, tiled], axis=-1))
    split = F.linear(p, (a, c))
    assert split.shape == full.shape
    assert jnp.abs(full - split).max() < 1e-5
