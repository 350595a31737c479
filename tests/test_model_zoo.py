"""Logit-parity tests for the full victim zoo vs the torch reference.

For models whose torch implementation uses a random-start FPS
(PointNet++, PCT) the test monkeypatches the torch side to the
deterministic index-0 start so both frameworks sample identical centers;
our models use start_idx=0 by default.
"""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.models import dgcnn, pct, pointconv, pointnet2
from hitadv_tpu.utils import checkpoint as ckpt

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))
if HAS_REFERENCE and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _stub_missing_modules():
    """The reference imports CUDA-era deps (torchvision, pytorch3d, ...)
    at module scope; stub the ones absent from this environment so the
    pure-torch model code can be imported for parity testing."""
    class _Stub(types.ModuleType):
        def __getattr__(self, item):
            if item.startswith("__"):
                raise AttributeError(item)
            return lambda *a, **k: None

    for name in ("torchvision", "torchvision.models", "pytorch3d",
                 "pytorch3d.ops", "pytorch3d.loss", "open3d", "mayavi",
                 "typing_extensions", "seaborn", "matplotlib",
                 "matplotlib.pyplot", "pointnet2_ops_lib",
                 "pointnet2_ops_lib.pointnet2_ops",
                 "pointnet2_ops_lib.pointnet2_ops.pointnet2_utils"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = _Stub(name)
                mod.Literal = str
                sys.modules[name] = mod


if HAS_REFERENCE:
    _stub_missing_modules()


def _torch_fps_fixed_start():
    """Deterministic torch FPS oracle (start index 0) for monkeypatching."""
    import torch

    def fps(xyz, npoint):
        device = xyz.device
        B, N, C = xyz.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long, device=device)
        distance = torch.ones(B, N, device=device) * 1e10
        farthest = torch.zeros(B, dtype=torch.long, device=device)
        batch_indices = torch.arange(B, dtype=torch.long, device=device)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return centroids

    return fps


def _randomize_bn(m):
    import torch

    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)


def _convert(m, spec):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return ckpt.convert_state_dict(sd, spec)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
class TestParity:
    def test_pointnet2_ssg(self, rng, monkeypatch):
        import torch
        import model.pointnet2_utils as pnu
        from model.pointnet2_cls_ssg import get_model

        monkeypatch.setattr(pnu, "farthest_point_sample",
                            _torch_fps_fixed_start())
        torch.manual_seed(0)
        m = get_model(40, normal_channel=False).eval()
        _randomize_bn(m)
        params = _convert(m, pointnet2.TORCH_SPEC)

        x = rng.randn(2, 700, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            want, _ = m(torch.from_numpy(np.swapaxes(x, 1, 2).copy()))
        got = pointnet2.apply(params, jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=3e-4)

    def test_dgcnn(self, rng):
        import torch
        from model.dgcnn_cls import DGCNN_cls

        args = types.SimpleNamespace(k=20, emb_dims=1024, dropout=0.2)
        torch.manual_seed(0)
        # reference hard-codes device cuda in get_graph_feature; run the
        # knn on cpu by monkeypatching torch.device? Instead rebuild the
        # graph feature path only if cuda is requested.
        m = DGCNN_cls(args, output_channels=40).eval()
        _randomize_bn(m)
        params = _convert(m, dgcnn.TORCH_SPEC)

        x = rng.randn(2, 256, 3).astype(np.float32) * 0.5
        import model.dgcnn_cls as dg

        # patch the cuda device reference for CPU execution
        real_device = torch.device("cpu")
        orig = torch.device
        torch.device = lambda *a, **k: real_device  # noqa: E731
        try:
            with torch.no_grad():
                want = m(torch.from_numpy(np.swapaxes(x, 1, 2).copy()))
        finally:
            torch.device = orig
        got = dgcnn.apply(params, jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=3e-4)

    def test_pct(self, rng, monkeypatch):
        import torch
        import model.pct_utils as pu
        from model.pct_cls import Pct

        monkeypatch.setattr(pu, "fps", _torch_fps_fixed_start())
        args = types.SimpleNamespace(dropout=0.2)
        torch.manual_seed(0)
        m = Pct(args, output_channels=40).eval()
        _randomize_bn(m)
        params = _convert(m, pct.TORCH_SPEC)

        x = rng.randn(2, 700, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            want = m(torch.from_numpy(np.swapaxes(x, 1, 2).copy()))
        got = pct.apply(params, jnp.array(x))
        # r2 shipped with atol=3e-3; a stage-by-stage bisection (r3)
        # showed the only large intermediate divergence is the grouped
        # neighbor ORDER inside sample_and_group (kNN tie/sort order,
        # erased by the Local_op max-pool) — actual logit divergence is
        # ~2e-7, same class as the rest of the zoo. The old tolerance
        # was stale, not hiding numerics: tightened 10x.
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=3e-4)

    def test_pointconv(self, rng):
        import torch
        from model.pointconv import PointConvDensityClsSsg

        torch.manual_seed(0)
        m = PointConvDensityClsSsg(num_classes=40).eval()
        _randomize_bn(m)
        params = _convert(m, pointconv.TORCH_SPEC)

        x = rng.randn(2, 700, 3).astype(np.float32) * 0.5
        xt = torch.from_numpy(np.swapaxes(x, 1, 2).copy())
        with torch.no_grad():
            want = m(xt, xt)
        got = pointconv.apply(params, jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=3e-4)


class TestZooBasics:
    @pytest.mark.parametrize("mod,needs", [
        (pointnet2, 3), (dgcnn, 3), (pct, 3), (pointconv, 3)])
    def test_finite_and_grad(self, rng, mod, needs):
        params = mod.init(jax.random.PRNGKey(0))
        x = jnp.array(rng.randn(2, 300, needs).astype(np.float32) * 0.5)
        logits = mod.apply(params, x)
        assert logits.shape == (2, 40)
        assert np.isfinite(np.asarray(logits)).all()
        g = jax.grad(lambda x: jnp.sum(mod.apply(params, x)))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
