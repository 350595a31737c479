"""PointNet++ MSG / FeaturePropagation parity tests vs torch reference."""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.models import pointnet2
from hitadv_tpu.utils import checkpoint as ckpt

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))
if HAS_REFERENCE and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


class TestMSGModule:
    def test_shapes(self, rng):
        key = jax.random.PRNGKey(0)
        params = pointnet2.msg_init(key, in_channel=16,
                                    mlp_list=[[32, 32], [32, 64]])
        xyz = jnp.array(rng.rand(2, 128, 3).astype(np.float32))
        feats = jnp.array(rng.randn(2, 128, 16).astype(np.float32))
        new_xyz, out = pointnet2.msg_apply(
            params, 32, [0.2, 0.4], [8, 16], xyz, feats)
        assert new_xyz.shape == (2, 32, 3)
        assert out.shape == (2, 32, 32 + 64)

    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
    def test_torch_parity(self, rng, monkeypatch):
        import torch
        import model.pointnet2_utils as pnu
        from tests.test_model_zoo import _torch_fps_fixed_start

        monkeypatch.setattr(pnu, "farthest_point_sample",
                            _torch_fps_fixed_start())
        torch.manual_seed(0)
        m = pnu.PointNetSetAbstractionMsg(
            npoint=32, radius_list=[0.2, 0.4], nsample_list=[8, 16],
            in_channel=16, mlp_list=[[32, 32], [32, 64]]).eval()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.5)
                    mod.running_var.uniform_(0.5, 2.0)

        # convert: conv_blocks.{i}.{j} / bn_blocks.{i}.{j}
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        spec = {}
        for i in range(2):
            for j in range(2):
                spec[f"branch{i}/conv{j}"] = (
                    f"conv_blocks.{i}.{j}", "conv")
                spec[f"branch{i}/bn{j}"] = (f"bn_blocks.{i}.{j}", "bn")
        params = ckpt.convert_state_dict(sd, spec)

        xyz = rng.rand(2, 128, 3).astype(np.float32)
        feats = rng.randn(2, 128, 16).astype(np.float32)
        with torch.no_grad():
            # torch signature: channels-first [B, C, N]
            t_xyz, t_out = m(torch.from_numpy(np.swapaxes(xyz, 1, 2)
                                              .copy()),
                             torch.from_numpy(np.swapaxes(feats, 1, 2)
                                              .copy()))
        new_xyz, out = pointnet2.msg_apply(
            params, 32, [0.2, 0.4], [8, 16], jnp.array(xyz),
            jnp.array(feats))
        np.testing.assert_allclose(np.asarray(new_xyz),
                                   np.swapaxes(t_xyz.numpy(), 1, 2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out),
                                   np.swapaxes(t_out.numpy(), 1, 2),
                                   atol=3e-4)


class TestFPModule:
    def test_shapes_and_exact_at_known(self, rng):
        key = jax.random.PRNGKey(1)
        params = pointnet2.fp_init(key, in_channel=8 + 16, mlp=[32])
        xyz1 = jnp.array(rng.rand(2, 64, 3).astype(np.float32))
        xyz2 = jnp.array(rng.rand(2, 16, 3).astype(np.float32))
        p1 = jnp.array(rng.randn(2, 64, 8).astype(np.float32))
        p2 = jnp.array(rng.randn(2, 16, 16).astype(np.float32))
        out = pointnet2.fp_apply(params, xyz1, xyz2, p1, p2)
        assert out.shape == (2, 64, 32)

    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
    def test_torch_parity(self, rng):
        import torch
        import model.pointnet2_utils as pnu

        torch.manual_seed(0)
        m = pnu.PointNetFeaturePropagation(in_channel=24,
                                           mlp=[32, 16]).eval()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, torch.nn.BatchNorm1d):
                    mod.running_mean.normal_(0, 0.5)
                    mod.running_var.uniform_(0.5, 2.0)
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        spec = {}
        for j in range(2):
            spec[f"conv{j}"] = (f"mlp_convs.{j}", "conv")
            spec[f"bn{j}"] = (f"mlp_bns.{j}", "bn")
        params = ckpt.convert_state_dict(sd, spec)

        xyz1 = rng.rand(2, 64, 3).astype(np.float32)
        xyz2 = rng.rand(2, 16, 3).astype(np.float32)
        p1 = rng.randn(2, 64, 8).astype(np.float32)
        p2 = rng.randn(2, 16, 16).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(np.swapaxes(xyz1, 1, 2).copy()),
                     torch.from_numpy(np.swapaxes(xyz2, 1, 2).copy()),
                     torch.from_numpy(np.swapaxes(p1, 1, 2).copy()),
                     torch.from_numpy(np.swapaxes(p2, 1, 2).copy()))
        out = pointnet2.fp_apply(params, jnp.array(xyz1),
                                 jnp.array(xyz2), jnp.array(p1),
                                 jnp.array(p2))
        np.testing.assert_allclose(np.asarray(out),
                                   np.swapaxes(want.numpy(), 1, 2),
                                   atol=3e-4)

    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
    def test_torch_parity_s1_broadcast(self, rng):
        """S == 1 path broadcasts sparse features (reference :289-290)."""
        import torch
        import model.pointnet2_utils as pnu

        torch.manual_seed(1)
        m = pnu.PointNetFeaturePropagation(in_channel=16,
                                           mlp=[8]).eval()
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = ckpt.convert_state_dict(
            sd, {"conv0": ("mlp_convs.0", "conv"),
                 "bn0": ("mlp_bns.0", "bn")})
        xyz1 = rng.rand(1, 32, 3).astype(np.float32)
        xyz2 = rng.rand(1, 1, 3).astype(np.float32)
        p2 = rng.randn(1, 1, 16).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(np.swapaxes(xyz1, 1, 2).copy()),
                     torch.from_numpy(np.swapaxes(xyz2, 1, 2).copy()),
                     None,
                     torch.from_numpy(np.swapaxes(p2, 1, 2).copy()))
        out = pointnet2.fp_apply(params, jnp.array(xyz1),
                                 jnp.array(xyz2), None, jnp.array(p2))
        np.testing.assert_allclose(np.asarray(out),
                                   np.swapaxes(want.numpy(), 1, 2),
                                   atol=3e-4)
