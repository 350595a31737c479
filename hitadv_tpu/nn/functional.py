"""Functional layers: pointwise conv (= matmul), linear, batchnorm.

Weight layout conventions (chosen so XLA sees plain ``[..., Cin] @ [Cin,
Cout]`` matmuls on the MXU):
  * linear / 1x1-conv weight: ``[Cin, Cout]`` (PyTorch stores ``[Cout,
    Cin]`` / ``[Cout, Cin, 1]`` — the converter transposes).
  * batchnorm: dict of ``scale/bias/mean/var`` each ``[C]``; eval-mode
    only, eps matches torch's 1e-5 default.

Initializers reproduce PyTorch's Conv/Linear defaults
(kaiming-uniform(a=√5) ⇒ U(-1/√fan_in, 1/√fan_in) for both weight and
bias) so randomly initialized victims have torch-typical activation
scales even before a checkpoint is loaded.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


# Compute dtype for activations flowing between layers. None keeps f32
# (exact parity with the torch victims). bfloat16 halves HBM traffic —
# the victim forwards are bandwidth-bound, and the MXU rounds matmul
# inputs to bf16 at DEFAULT precision anyway, so only the inter-op
# activation precision changes. Attack quality is typically unaffected;
# logits differ from torch at ~1e-2.
_COMPUTE_DTYPE = None


def set_compute_dtype(dtype) -> None:
    """None (f32 parity) or jnp.bfloat16 (bandwidth-optimized)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


def _cast(x: jnp.ndarray) -> jnp.ndarray:
    if _COMPUTE_DTYPE is not None and x.dtype != _COMPUTE_DTYPE:
        return x.astype(_COMPUTE_DTYPE)
    return x


# ---------------------------------------------------------------------------
# Linear / pointwise conv
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                bias: bool = True) -> Params:
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    p = {"w": jax.random.uniform(wkey, (in_features, out_features),
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_features,),
                                    minval=-bound, maxval=bound)
    return p


# A 1x1 Conv1d over points is exactly a linear layer applied per point.
conv1x1_init = linear_init


def linear(p: Params, x) -> jnp.ndarray:
    """``[..., Cin] -> [..., Cout]`` matmul; bias optional.

    ``x`` may be a tuple of channel-partitioned parts (see
    ``linear_parts``) — the concat is never materialized.
    """
    if isinstance(x, (tuple, list)):
        return linear_parts(p, x)
    if _COMPUTE_DTYPE is not None:
        y = jnp.matmul(_cast(x), _cast(p["w"]),
                       preferred_element_type=jnp.float32)
        y = y.astype(_COMPUTE_DTYPE)
        if "b" in p:
            y = y + _cast(p["b"])
        return y
    y = jnp.matmul(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def linear_parts(p: Params, parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Linear over a channel-partitioned input without materializing
    the concat: ``concat(parts, -1) @ W == Σ_i parts_i @ W[off_i:off_i
    + Ci]`` (partials summed in f32 before the compute-dtype cast —
    the same reassociation class as the one-matmul form).

    Why: the grouped-feature concats (`model/pointnet2_utils.py:134`,
    `model/pct_utils.py:139`) cost layout copies on TPU — profiled at
    ~0.5 ms/iter of the PointNet++ attack program — and produce ragged
    channel counts (3+128=131) that tile badly on the MXU. A part with
    a singleton group axis (the tiled PCT center, [B, S, 1, D])
    broadcasts in the sum, so its matmul runs on S rows, not S·ns.
    """
    w = p["w"]
    off, y = 0, None
    for x in parts:
        c = x.shape[-1]
        wi = w[off:off + c]
        if _COMPUTE_DTYPE is not None:
            yi = jnp.matmul(_cast(x), _cast(wi),
                            preferred_element_type=jnp.float32)
        else:
            yi = jnp.matmul(x, wi, preferred_element_type=jnp.float32)
        y = yi if y is None else y + yi
        off += c
    if off != w.shape[0]:
        raise ValueError(
            f"parts supply {off} channels, weight expects {w.shape[0]}")
    if _COMPUTE_DTYPE is not None:
        y = y.astype(_COMPUTE_DTYPE)
        return y + _cast(p["b"]) if "b" in p else y
    return y + p["b"] if "b" in p else y


def conv1d_init(key: jax.Array, in_channels: int, out_channels: int,
                kernel_size: int, bias: bool = True) -> Params:
    """General 1D conv weights ``[K, Cin, Cout]`` (torch ``[Cout, Cin, K]``
    transposed by the checkpoint converter)."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_channels * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(wkey,
                                 (kernel_size, in_channels, out_channels),
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_channels,),
                                    minval=-bound, maxval=bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, padding: str = "SAME") -> jnp.ndarray:
    """1D conv over the point axis: ``[B, N, Cin] -> [B, N, Cout]``."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# BatchNorm (inference by default; batch-stat mode inside bn_training())
# ---------------------------------------------------------------------------

def batchnorm_init(c: int) -> Params:
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


# When not None, batchnorm() normalizes with BATCH statistics (torch
# train()-mode) and appends ``(id(p), batch_mean, batch_var_unbiased)``
# so the caller can EMA-update the running stats. Trace-time only.
_BN_TRAINING_RECORDS = None


class bn_training:
    """Context manager: train-mode BN, recording batch stats.

    Torch semantics (the parity surface — torch BatchNorm1d/2d
    ``train()``): forward normalizes with the *biased* batch variance;
    the running-stat update uses the *unbiased* variance. The recorded
    tuples let a training step apply ``new = (1-m)*old + m*batch``.
    """

    def __init__(self, records: list):
        self.records = records

    def __enter__(self):
        global _BN_TRAINING_RECORDS
        self._prev = _BN_TRAINING_RECORDS
        _BN_TRAINING_RECORDS = self.records
        return self.records

    def __exit__(self, *exc):
        global _BN_TRAINING_RECORDS
        _BN_TRAINING_RECORDS = self._prev
        return False


def bn_is_training() -> bool:
    """True while tracing inside a ``bn_training`` context — models
    that have a faster eval-only formulation branch on this."""
    return _BN_TRAINING_RECORDS is not None


def batchnorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """BN over the trailing channel dim.

    Works for both torch BatchNorm1d over features ``[B, C]`` and over
    point sequences ``[B, N, C]`` / groups ``[B, S, ns, C]`` (torch's
    BatchNorm1d/2d normalize dim 1 = channels; channels are trailing
    here). Eval mode uses the stored running stats; inside a
    ``bn_training`` context the batch statistics are used and recorded.
    """
    if _BN_TRAINING_RECORDS is not None:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        bm = jnp.mean(xf, axis=axes)
        bv = jnp.var(xf, axis=axes)                   # biased (forward)
        count = 1
        for a in axes:
            count *= x.shape[a]
        unbiased = bv * (count / max(count - 1, 1))   # running update
        _BN_TRAINING_RECORDS.append(
            (id(p), jax.lax.stop_gradient(bm),
             jax.lax.stop_gradient(unbiased)))
        inv = jax.lax.rsqrt(bv + eps)
        return _cast((xf - bm) * (inv * p["scale"]) + p["bias"])
    inv = jax.lax.rsqrt(p["var"] + eps)
    y = (x.astype(jnp.float32) - p["mean"]) * (inv * p["scale"]) \
        + p["bias"]
    return _cast(y)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """``jnp.max(x, axis)`` with an elementwise tie-splitting VJP.

    XLA lowers reduce-max's autodiff transpose to a select-and-scatter
    fusion (profiled at 1.3 ms/iter for PointConv's density maxes
    alone); the mask/count formulation computes the identical
    tie-splitting gradient with plain elementwise ops. Covers both the
    grouped [..., ns, C] layout (axis=-2, see `max_mid`) and the
    neighbors-major [B, ns, S, C] layout (axis=1,
    `ops.geometry.gather_group_nm`)."""
    return jnp.max(x, axis=axis)


def _max_axis_fwd(x, axis):
    m = jnp.max(x, axis=axis)
    return m, (x, m)


def _max_axis_bwd(axis, res, g):
    x, m = res
    mask = (x == jnp.expand_dims(m, axis)).astype(g.dtype)
    cnt = jnp.sum(mask, axis=axis, keepdims=True)
    return (mask * (jnp.expand_dims(g, axis) / cnt),)


max_axis.defvjp(_max_axis_fwd, _max_axis_bwd)


def max_mid(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.max(x, axis=-2)`` — the neighbor-axis max of grouped
    features ([..., ns, C] -> [..., C]) in PointNet++/PCT set
    abstractions. Thin alias of `max_axis` so the tie-splitting VJP
    has exactly one definition."""
    return max_axis(x, -2)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def fold_bn(lin: Params, bn: Params,
            eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold an eval-mode BN affine into the preceding linear's weights:
    bn(xW + b) = x(W·s) + ((b - μ)·s + β), s = scale·rsqrt(var + eps).
    Returns the folded ``(w, b)``. THE single definition of the fold —
    the project-then-gather paths (pointnet2._sa_apply,
    pct._local_op_fused) and the fused max-pool path split the folded
    pieces around their gathers and must stay bit-identical to
    ``linear_bn``'s algebra (tests/test_project_then_gather.py pins the
    equivalence).
    """
    s = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    b = bn["bias"] - bn["mean"] * s
    if "b" in lin:
        b = b + lin["b"] * s
    return lin["w"] * s[None], b


def linear_bn(lin: Params, bn: Params, x: jnp.ndarray,
              eps: float = 1e-5) -> jnp.ndarray:
    """linear followed by batchnorm, with the eval-mode BN affine folded
    into the matmul (``fold_bn``). Exact algebra (reassociation-level
    drift); measured 1.4x on a bf16 conv-bn-relu chain at attack shapes
    (the separate normalize pass and its f32 round-trip disappear).
    Inside ``bn_training`` the explicit batch-stat batchnorm runs.
    """
    if bn_is_training():
        return batchnorm(bn, linear(lin, x), eps)
    w, b = fold_bn(lin, bn, eps)
    return linear({"w": w, "b": b}, x)


def linear_bn_pre(lin: Params, bn: Params, pre: jnp.ndarray,
                  x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """``bn(linear(lin, x @ pre))`` with the per-example ``[k, k]``
    transform folded into the (BN-folded) weight:
    ``(x @ pre) @ W + b == x @ (pre @ W) + b``.

    The PointNet STN pattern (`model/pointnet_utils.py:11-60`:
    input/feature transform matmul feeding conv1/conv2). Applied
    standalone, ``x @ pre`` at k=3 writes a ``[B, N, 3]`` intermediate
    whose 3-wide minor dim tile-pads 128x in HBM — profiled ~209 us/iter
    standing alone HBM-bound in the flagship/CW programs (RESULTS.md
    "CW-Perturb floor attribution"). Folding it into the conv weight
    (``pre @ W``: a tiny [B, k, Cout] batched matmul) means the
    transformed cloud never exists; the big matmul reads the original
    ``x`` XLA already has in registers. Exact algebra — same
    reassociation class as ``fold_bn`` itself. Training-mode BN keeps
    the explicit composition (batch stats must see conv output of the
    transformed input — they do either way, but the fold needs eval-mode
    affine BN).
    """
    if bn_is_training():
        h = jnp.matmul(x, pre, preferred_element_type=jnp.float32)
        return batchnorm(bn, linear(lin, h), eps)
    w, b = fold_bn(lin, bn, eps)
    wb = jnp.matmul(pre, w, preferred_element_type=jnp.float32)
    if _COMPUTE_DTYPE is not None:
        y = jnp.matmul(_cast(x), _cast(wb),
                       preferred_element_type=jnp.float32)
        return y.astype(_COMPUTE_DTYPE) + _cast(b)
    return jnp.matmul(x, wb, preferred_element_type=jnp.float32) + b


def linear_bn_max(lin: Params, bn: Params, x: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """``max_n bn(x @ W + b)[b, n, :]`` — the conv-to-wide +
    global-max-pool bottleneck (PointNet conv3/bn3 + torch.max,
    `model/pointnet_utils.py:47-55`).

    In eval mode on TPU this dispatches to a fused Pallas pair
    that never materializes the [B, N, C] activation: the forward
    keeps a running (max, argmax-row) in VMEM; the backward routes the
    cotangent through the single argmax row per (b, c) — profiled, the
    unfused version streamed ~670 MB/iter of [64, 1024, 1024] through
    HBM across conv write / maxpool read / dense max-bwd / dx / dW,
    the HBM floor of the whole flagship attack. Ties pick the lowest
    row (torch.max first-argmax; jnp.max autodiff instead SPLITS the
    cotangent among ties — measure-zero for continuous activations).

    The fused path covers BOTH compute dtypes: bf16, and f32 parity
    mode — on TPU the MXU rounds f32 matmul operands to bf16 at
    DEFAULT precision anyway (the unfused `jnp.matmul` does exactly
    that), so the in-kernel DEFAULT-precision dot reproduces the
    unfused f32 path's numerics while eliminating the 2x-wider HBM
    streaming that made parity mode 4x slower than bf16 mode.

    Everywhere else: the plain composition.
    """
    from hitadv_tpu.ops.geometry import _pallas_active

    if (not bn_is_training()) and _pallas_active() \
            and x.dtype in (jnp.bfloat16, jnp.float32) \
            and x.shape[1] >= 16:
        w, b = fold_bn(lin, bn, eps)
        return _max_linear_fused(x, w.astype(x.dtype),
                                 b.astype(jnp.float32))
    return jnp.max(linear_bn(lin, bn, x, eps), axis=1)


def _max_linear_combine(mx8, row8):
    """First-argmax reduce of the kernel's 8-row partials."""
    vmax = jnp.max(mx8, axis=1)                              # [B, C]
    tie = mx8 == vmax[:, None, :]
    row = jnp.min(jnp.where(tie, row8, jnp.int32(2 ** 30)), axis=1)
    return vmax, row


@jax.custom_vjp
def _max_linear_fused(x, w, b):
    from hitadv_tpu.ops import pallas_kernels as PK

    mx8, row8 = PK.max_linear_pallas(x, w, b)
    return _max_linear_combine(mx8, row8)[0]


def _max_linear_fwd(x, w, b):
    from hitadv_tpu.ops import pallas_kernels as PK

    mx8, row8 = PK.max_linear_pallas(x, w, b)
    vmax, row = _max_linear_combine(mx8, row8)
    return vmax, (x, w, row)


def _max_linear_bwd(res, g):
    from hitadv_tpu.ops import pallas_kernels as PK
    from hitadv_tpu.ops.geometry import index_points

    x, w, row = res
    gf = g.astype(jnp.float32)
    dx = PK.max_linear_dh_pallas(row, gf, w, x.shape[1])     # [B, N, K]
    xsel = index_points(x, row).astype(jnp.float32)          # [B, C, K]
    dw = jnp.einsum("bck,bc->kc", xsel, gf,
                    preferred_element_type=jnp.float32)
    db = jnp.sum(gf, axis=0)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


_max_linear_fused.defvjp(_max_linear_fwd, _max_linear_bwd)


# A fused linear+leaky+global-(max,mean) pair (DGCNN's conv5 block,
# `model/dgcnn_cls.py:100-106`) was built, verified, and REJECTED in
# round 3: at the DGCNN attack shape ([16, 1024, 512]@[512, emb]) the
# block is MXU-compute-bound, XLA already fuses the epilogue, and the
# Pallas pair measured 4% SLOWER op-level (0.876 vs 0.841 ms fwd+bwd)
# and ~1% slower end-to-end (10.66 vs 10.54 ms/iter) — the [B, N, C]
# HBM round trip it removes is not the bottleneck there, unlike the
# conv3 global-max bottleneck above. See RESULTS.md.


# ---------------------------------------------------------------------------
# Conv-BN(-act) stacks (the ubiquitous pattern in all victims)
# ---------------------------------------------------------------------------

def mlp_init(key: jax.Array, channels: Sequence[int],
             bias: bool = True) -> Dict[str, Params]:
    """Init a stack of (1x1 conv + BN) layers: channels [c0, c1, ..., ck]."""
    params = {}
    keys = jax.random.split(key, len(channels) - 1)
    for i, (cin, cout) in enumerate(zip(channels[:-1], channels[1:])):
        params[f"conv{i}"] = conv1x1_init(keys[i], cin, cout, bias=bias)
        params[f"bn{i}"] = batchnorm_init(cout)
    return params


def mlp_apply(params: Dict[str, Params], x: jnp.ndarray,
              act=relu, last_act: bool = True,
              start: int = 0) -> jnp.ndarray:
    """Apply the conv-bn-act stack; ``last_act=False`` skips the final act.

    In eval mode the BN affine folds into the matmul: bn(xW + b) =
    x(W·s) + ((b - μ)·s + β) with s = scale·rsqrt(var+eps) — exact
    algebra (reassociation-level float drift), one matmul per layer
    instead of matmul + separate normalize. Train mode (inside
    ``bn_training``) keeps the explicit batch-stat batchnorm.

    ``start`` skips the first layers (a caller that fused layer 0 into
    its gather — see pointnet2._sa_apply — passes start=1; ``x`` is
    then that layer's already-activated output).
    """
    n = len(params) // 2
    fold = not bn_is_training()
    for i in range(start, n):
        lin, bn = params[f"conv{i}"], params[f"bn{i}"]
        if fold:
            w, b = fold_bn(lin, bn)
            x = linear({"w": w, "b": b}, x)
        else:
            x = batchnorm(bn, linear(lin, x))
        if act is not None and (last_act or i < n - 1):
            x = act(x)
    return x
