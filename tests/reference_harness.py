"""Shared harness for executing the torch reference's *attack loops* on CPU.

Round-1 verified logit parity of every victim; this harness closes the
remaining gap (VERDICT.md Missing #2) by making the reference's attack
classes (`CW/Perturb.py`, `FGM/FGSM.py`, `ShapeAttack/HiT_ADV.py`)
actually runnable in this CUDA-less environment:

  * `.cuda()` / `torch.cuda.empty_cache()` no-op'd (the reference calls
    them unconditionally, e.g. `CW/Perturb.py:33,55`);
  * absent GUI/CUDA deps (mayavi, open3d, torchvision) stubbed;
  * pytorch3d.ops.knn_points/knn_gather replaced with REAL pure-torch
    implementations (matmul-form squared distances, ascending sort) so
    the curvature/kNN math runs for real, matching pytorch3d semantics
    (squared dists, sorted, `return_sorted=True`).

Nothing here is imported by the package — test-only infrastructure.
"""

from __future__ import annotations

import os
import sys
import types
from collections import namedtuple

import numpy as np

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))
if HAS_REFERENCE and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

_KNN = namedtuple("KNN", ["dists", "idx"])


def _install_real_pytorch3d():
    """Functional pytorch3d.ops: exact pure-torch knn_points/knn_gather."""
    import torch

    def _sqdist(a, b):
        # same |a|^2+|b|^2-2ab form as the reference's square_distance
        # (`ShapeAttack/HiT_ADV.py:447-468`) and our ops.geometry
        aa = (a * a).sum(-1)[:, :, None]
        bb = (b * b).sum(-1)[:, None, :]
        return aa + bb - 2.0 * torch.bmm(a, b.transpose(1, 2))

    def knn_points(p1, p2, K, **kwargs):
        d = _sqdist(p1.float(), p2.float())
        dists, idx = torch.topk(d, k=K, dim=-1, largest=False)
        return _KNN(dists=dists, idx=idx)

    def knn_gather(x, idx):
        B, P, K = idx.shape
        C = x.shape[-1]
        flat = idx.reshape(B, P * K, 1).expand(-1, -1, C)
        return torch.gather(x, 1, flat).reshape(B, P, K, C)

    ops = types.ModuleType("pytorch3d.ops")
    ops.knn_points = knn_points
    ops.knn_gather = knn_gather
    pkg = types.ModuleType("pytorch3d")
    pkg.ops = ops
    sys.modules["pytorch3d"] = pkg
    sys.modules["pytorch3d.ops"] = ops


def _install_fake_modules():
    """Stub the GUI/vision deps the attack files import but never use
    on this code path (same recipe as tests/test_model_zoo.py)."""
    class _Stub(types.ModuleType):
        def __getattr__(self, item):
            if item.startswith("__"):
                raise AttributeError(item)
            return lambda *a, **k: None

    for name in ("torchvision", "torchvision.models", "open3d", "mayavi",
                 "typing_extensions", "seaborn", "matplotlib",
                 "matplotlib.pyplot"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = _Stub(name)
                mod.Literal = str
                sys.modules[name] = mod


def install():
    """Idempotent: make the reference's attack modules importable."""
    if not HAS_REFERENCE:
        return
    _install_real_pytorch3d()
    _install_fake_modules()


def patch_cuda(monkeypatch):
    """No-op every unconditional .cuda() so the loops run on CPU."""
    import torch

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.cuda, "empty_cache",
                        lambda: None, raising=False)


def torch_fps_fixed_start(index_points=None):
    """Deterministic start-0 FPS, drop-in for the reference's
    random-start `farthest_point_sample` (`ShapeAttack/HiT_ADV.py:489`)."""
    import torch

    def fps(xyz, npoint):
        B, N, _ = xyz.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        farthest = torch.zeros(B, dtype=torch.long)
        batch_indices = torch.arange(B, dtype=torch.long)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return centroids

    return fps


class RandQueue:
    """Shape-dispatching fake for torch.rand: returns queued arrays so
    the reference's random inits (`ShapeAttack/HiT_ADV.py:130-137`) can
    be pinned to the exact values fed to the JAX attack."""

    def __init__(self, arrays):
        import torch

        self._queue = [torch.from_numpy(np.asarray(a, np.float32))
                       for a in arrays]

    def __call__(self, *shape, **kwargs):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        want = tuple(int(s) for s in shape)
        for i, t in enumerate(self._queue):
            if tuple(t.shape) == want:
                return self._queue.pop(i)
        raise AssertionError(f"no queued rand array of shape {want}; "
                             f"have {[tuple(t.shape) for t in self._queue]}")


def randomize_bn(m, seed=0):
    """Give BN layers non-trivial running stats so eval-mode parity is
    meaningful (fresh torch BN stats are exactly 0/1)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)


def build_torch_ae(params, num_points):
    """Torch mirror of models/autoencoder.py loaded with OUR weights,
    channels-first [B, 3, N] -> [B, 3, N] as the reference's AdvPC
    expects (`CW/AdvPC.py:92`)."""
    import torch
    import torch.nn as nn

    enc = params["enc"]
    n_layers = len(enc) // 2

    class TorchAE(nn.Module):
        def __init__(self):
            super().__init__()
            convs, bns = [], []
            for i in range(n_layers):
                w = np.asarray(enc[f"conv{i}"]["w"])        # [Cin, Cout]
                conv = nn.Conv1d(w.shape[0], w.shape[1], 1)
                with torch.no_grad():
                    conv.weight.copy_(torch.from_numpy(
                        w.T[:, :, None].copy()))
                    conv.bias.copy_(torch.from_numpy(
                        np.asarray(enc[f"conv{i}"]["b"])))
                bn = nn.BatchNorm1d(w.shape[1]).eval()
                b = enc[f"bn{i}"]
                with torch.no_grad():
                    bn.weight.copy_(torch.from_numpy(np.asarray(b["scale"])))
                    bn.bias.copy_(torch.from_numpy(np.asarray(b["bias"])))
                    bn.running_mean.copy_(
                        torch.from_numpy(np.asarray(b["mean"])))
                    bn.running_var.copy_(
                        torch.from_numpy(np.asarray(b["var"])))
                convs.append(conv)
                bns.append(bn)
            self.convs = nn.ModuleList(convs)
            self.bns = nn.ModuleList(bns)

            def _linear(p):
                w = np.asarray(p["w"])                       # [in, out]
                fc = nn.Linear(w.shape[0], w.shape[1])
                with torch.no_grad():
                    fc.weight.copy_(torch.from_numpy(w.T.copy()))
                    fc.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                return fc

            self.fc1 = _linear(params["dec_fc1"])
            self.fc2 = _linear(params["dec_fc2"])
            self.fc3 = _linear(params["dec_fc3"])

        def forward(self, x):                                # [B, 3, N]
            h = x
            for conv, bn in zip(self.convs, self.bns):
                h = torch.relu(bn(conv(h)))
            z = torch.max(h, dim=2).values                   # [B, latent]
            h = torch.relu(self.fc1(z))
            h = torch.relu(self.fc2(h))
            out = self.fc3(h).reshape(x.shape[0], num_points, 3)
            return out.transpose(1, 2).contiguous()

    return TorchAE().eval()


def build_pointnet_pair(seed=0):
    """(torch_model, jax_params): the reference PointNet and its
    converted weights — the victim pair for attack-trajectory parity."""
    import torch

    from model.pointnet_cls import get_model
    from hitadv_tpu.models import pointnet
    from hitadv_tpu.utils import checkpoint as ckpt

    torch.manual_seed(seed)
    m = get_model(40, normal_channel=False).eval()
    randomize_bn(m, seed)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = ckpt.convert_state_dict(sd, pointnet.TORCH_SPEC)
    return m, params
