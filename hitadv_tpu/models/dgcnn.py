"""DGCNN classifier — functional JAX.

Parity surface: reference `model/dgcnn_cls.py`: four EdgeConv blocks
(dynamic kNN graph in feature space, ``concat(x_j - x_i, x_i)`` edge
features, 1x1 conv + BN + LeakyReLU(0.2), max over neighbors), 1024-d
embedding conv, global max+avg pool concat, and a 512/256/num_classes
head. The eval config of record uses k=5 (`eval.py:48`); the
architecture default is k=20 (`model/dgcnn_cls.py:17`).

The kNN here *includes self* and takes plain top-k of negative squared
distance (`model/dgcnn_cls.py:7-13`) — unlike the attack-side kNN ops
which drop self. Don't "fix" this: checkpoint parity depends on it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.nn import functional as F
from hitadv_tpu.ops import geometry as G


@dataclass(frozen=True)
class DGCNNConfig:
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.2        # identity in eval mode


def get_graph_feature(x: jnp.ndarray, k: int,
                      concat: bool = True) -> jnp.ndarray:
    """Edge features over the feature-space kNN graph.

    x: ``[B, N, C]`` -> ``[B, N, k, 2C]`` (= concat(x_j - x_i, x_i)).
    Parity: `model/dgcnn_cls.py:16-43` (self included in neighbors).

    ``concat=False`` returns ``(x_j - x_i, x_i [B, N, 1, C])`` for
    `F.linear_parts` — the center part stays singleton (broadcasts in
    the matmul sum), so neither the edge-grid concat nor the tiled
    center is materialized.
    """
    # indices are piecewise-constant in x: the reference's torch.topk
    # idx carries no gradient either (`model/dgcnn_cls.py:7-13`), and
    # cutting the knn out of the autodiff graph removes its whole
    # backward (the dists cotangent is identically zero here)
    xs = lax.stop_gradient(x)
    idx = G.knn_idx(xs, xs, k)                                # [B, N, k]
    neighbors = G.index_points(x, idx)                        # [B, N, k, C]
    if not concat:
        return neighbors - x[:, :, None, :], x[:, :, None, :]
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=-1)


def edge_conv_fused(p_conv: Dict, p_bn: Dict, h: jnp.ndarray,
                    k: int) -> jnp.ndarray:
    """Eval-mode EdgeConv with the conv factored off the edge grid.

    Exact rewrite of ``max_j leaky(bn(W·[x_j - x_i; x_i]))``
    (`model/dgcnn_cls.py:16-43` + the conv/BN/LeakyReLU blocks):
    splitting W into the (x_j - x_i) rows Wd and the x_i rows Wc and
    folding the eval BN affine ``a·(-) + b`` into both projections
    gives ``e'_ij = y_j + z_i`` with ``y = x·(Wd·a)`` and
    ``z = x·((Wc - Wd)·a) + b``; LeakyReLU is strictly increasing, so
    ``max_j leaky(e'_ij) = leaky(max_j y_j + z_i)`` — the [B,N,k,2C]
    edge tensor, its per-edge matmul, and the per-edge BN all vanish.

    The neighbor gather runs as per-slot one-hot matmuls on the MXU
    instead of a dynamic gather: XLA's gather VJP emits scatter-add,
    which is pathological on TPU, while the one-hot form differentiates
    into more matmuls (measured at B=16/N=1024/k=20: whole-model
    fwd+bwd 41 -> 29 ms vs the gather path; logits argmax-identical,
    drift ~2e-4 from reassociation). One-hot entries are exact in any
    dtype, so a single nonzero product per row reproduces the gathered
    value exactly even at bf16.

    Only valid in eval mode (running-stat BN); training uses the
    reference edge-grid formulation so batch statistics are computed
    over edges like torch's.
    """
    C = h.shape[-1]
    W = p_conv["w"]                                           # [2C, C']
    Wd, Wc = W[:C], W[C:]
    a = p_bn["scale"] * lax.rsqrt(p_bn["var"] + 1e-5)
    b = p_bn["bias"] - p_bn["mean"] * a

    hs = lax.stop_gradient(h)        # idx-only consumer (see above)
    idx = G.knn_idx(hs, hs, k)                                # [B, N, k]
    y = F.linear({"w": Wd * a[None]}, h)                      # [B, N, C']
    # bias INSIDE the linear so it follows the compute dtype: a bare
    # `+ b` (f32) upcast mx+z — and therefore every later layer's h —
    # to f32, which knocked the feature kNNs off the packed-bf16 gate
    # onto the exact kernel (profiled 1083 vs ~560 us/iter each,
    # .r5/profile_dgcnn_r5.log)
    z = F.linear({"w": (Wc - Wd) * a[None], "b": b}, h)
    mx = G.graph_max_pool(y, idx)                             # [B, N, C']
    return F.leaky_relu(mx + z)


def init(key: jax.Array, num_classes: int = 40,
         cfg: DGCNNConfig = DGCNNConfig()) -> Dict:
    keys = jax.random.split(key, 8)
    p = {}
    dims = [(6, 64), (128, 64), (128, 128), (256, 256)]
    for i, (cin, cout) in enumerate(dims, start=1):
        p[f"conv{i}"] = F.conv1x1_init(keys[i - 1], cin, cout, bias=False)
        p[f"bn{i}"] = F.batchnorm_init(cout)
    p["conv5"] = F.conv1x1_init(keys[4], 512, cfg.emb_dims, bias=False)
    p["bn5"] = F.batchnorm_init(cfg.emb_dims)
    p["linear1"] = F.linear_init(keys[5], cfg.emb_dims * 2, 512,
                                 bias=False)
    p["bn6"] = F.batchnorm_init(512)
    p["linear2"] = F.linear_init(keys[6], 512, 256)
    p["bn7"] = F.batchnorm_init(256)
    p["linear3"] = F.linear_init(keys[7], 256, num_classes)
    return p


def make_apply(cfg: DGCNNConfig = DGCNNConfig()):
    def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, N, 3] -> logits [B, num_classes]."""
        feats = []
        h = x
        # train-mode BN needs batch statistics over the edge grid
        # (torch semantics), so the fused factored form only runs in
        # eval mode — the attack path, where it is 1.4x faster.
        fused = not F.bn_is_training()
        for i in range(1, 5):
            with jax.named_scope(f"dg_edge{i}"):
                if fused:
                    h = edge_conv_fused(params[f"conv{i}"],
                                        params[f"bn{i}"], h, cfg.k)
                else:
                    # tuple parts ride F.linear_parts; BN batch stats
                    # still see the full [B, N, k, C'] edge grid
                    e = get_graph_feature(h, cfg.k, concat=False)
                    e = F.leaky_relu(F.linear_bn(params[f"conv{i}"],
                                                 params[f"bn{i}"], e))
                    h = jnp.max(e, axis=2)                    # [B, N, C']
            feats.append(h)

        with jax.named_scope("dg_emb"):
            h = jnp.concatenate(feats, axis=-1)               # [B, N, 512]
            h = F.leaky_relu(F.linear_bn(params["conv5"],
                                         params["bn5"], h))
            gmax = jnp.max(h, axis=1)
            gavg = jnp.mean(h, axis=1)
            g = jnp.concatenate([gmax, gavg], axis=-1)        # [B, 2*emb]

        g = F.leaky_relu(F.linear_bn(params["linear1"], params["bn6"], g))
        g = F.leaky_relu(F.linear_bn(params["linear2"], params["bn7"], g))
        return F.linear(params["linear3"], g)
    return apply


apply = make_apply()


# torch keys: convN is Sequential(conv2d/1d, bn, leaky) -> ".0"/".1"
TORCH_SPEC = {
    **{f"conv{i}": (f"conv{i}.0", "conv") for i in range(1, 6)},
    **{f"bn{i}": (f"conv{i}.1", "bn") for i in range(1, 6)},
    "linear1": ("linear1", "linear"),
    "bn6": ("bn6", "bn"),
    "linear2": ("linear2", "linear"),
    "bn7": ("bn7", "bn"),
    "linear3": ("linear3", "linear"),
}
