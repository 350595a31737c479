"""Measure DGCNN EdgeConv variants on the chip (VERDICT.md Missing #5).

Variants, full DGCNN-shaped stack at B=16, N=1024, k=20:
  A. current model: gather x -> concat(x_j - x_i, x_i) -> conv on the
     [B,N,k,2C] edge grid -> max;
  B. factored+folded: y = x @ (Wd·a), z = x @ ((Wc-Wd)·a) + b with the
     eval BN affine folded, so out = leaky(max_j y_j + z_i) — conv off
     the edge grid, MAX-only pooling (no sign dance), layer 1 kept in
     form A (gathering C=3 x is 20x cheaper than gathering C=64 y);
  C. B but gather+max via per-slot one-hot matmuls (MXU instead of
     dynamic gather; candidate for a Pallas fusion).

Timing: in-jit lax.scan over ITERS iterations (host round-trips through
the TPU tunnel cost ~30 ms; never time per-call).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hitadv_tpu import models
    from hitadv_tpu.models import dgcnn
    from hitadv_tpu.nn import functional as F
    from hitadv_tpu.ops import geometry as G

    B, N, k = 16, 1024, 20
    cfg = dgcnn.DGCNNConfig(k=k)
    params = dgcnn.init(jax.random.PRNGKey(0), cfg=cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(B, N, 3).astype(np.float32) * 0.5)

    apply_a = dgcnn.make_apply(cfg)

    def edge_factored(p_conv, p_bn, h, first):
        W = p_conv["w"]
        C = h.shape[-1]
        Wd, Wc = W[:C], W[C:]
        a = p_bn["scale"] * lax.rsqrt(p_bn["var"] + 1e-5)
        b = p_bn["bias"] - p_bn["mean"] * a
        idx = G.knn_points(h, h, k).idx
        if first:
            nb = G.index_points(h, idx)                    # [B,N,k,C]
            y_nb = jnp.einsum("bnkc,cd->bnkd", nb, Wd * a[None])
            mx = jnp.max(y_nb, axis=2)
        else:
            y = h @ (Wd * a[None])                         # [B,N,C']
            mx = jnp.max(G.index_points(y, idx), axis=2)
        z = h @ ((Wc - Wd) * a[None]) + b
        return F.leaky_relu(mx + z)

    def edge_onehot(p_conv, p_bn, h):
        W = p_conv["w"]
        C = h.shape[-1]
        Wd, Wc = W[:C], W[C:]
        a = p_bn["scale"] * lax.rsqrt(p_bn["var"] + 1e-5)
        b = p_bn["bias"] - p_bn["mean"] * a
        idx = G.knn_points(h, h, k).idx                    # [B,N,k]
        y = h @ (Wd * a[None])

        def slot(j, mx):
            onehot = (idx[:, :, j][:, :, None]
                      == lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
                      ).astype(y.dtype)                    # [B,N,N]
            nb = jnp.einsum("bnm,bmc->bnc", onehot, y)
            return jnp.maximum(mx, nb)

        mx = lax.fori_loop(0, k, slot,
                           jnp.full(y.shape, -jnp.inf, y.dtype))
        z = h @ ((Wc - Wd) * a[None]) + b
        return F.leaky_relu(mx + z)

    def head(params, h_list, h_last):
        h = jnp.concatenate(h_list, axis=-1)
        h = F.leaky_relu(F.batchnorm(params["bn5"],
                                     F.linear(params["conv5"], h)))
        pooled = jnp.concatenate([jnp.max(h, 1), jnp.mean(h, 1)], -1)
        h = F.leaky_relu(F.batchnorm(params["bn6"],
                                     F.linear(params["linear1"], pooled)))
        h = F.leaky_relu(F.batchnorm(params["bn7"],
                                     F.linear(params["linear2"], h)))
        return F.linear(params["linear3"], h)

    def apply_b(params, x):
        feats = []
        h = x
        for i in range(1, 5):
            h = edge_factored(params[f"conv{i}"], params[f"bn{i}"], h,
                              first=(i == 1))
            feats.append(h)
        return head(params, feats, h)

    def apply_c(params, x):
        feats = []
        h = x
        for i in range(1, 5):
            h = edge_onehot(params[f"conv{i}"], params[f"bn{i}"], h)
            feats.append(h)
        return head(params, feats, h)

    # parity check (CPU-exactness not expected; argmax-equal logits)
    la = apply_a(params, x)
    for name, fn in (("B", apply_b), ("C", apply_c)):
        lo = fn(params, x)
        err = float(jnp.abs(la - lo).max())
        agree = float(jnp.mean(jnp.argmax(la, -1) == jnp.argmax(lo, -1)))
        print(f"variant {name}: max|dlogits|={err:.2e} argmax agree={agree}")

    ITERS = 10

    def timed(fn, what):
        def fwd_loop(x):
            def body(c, _):
                out = fn(params, c)
                return c + 1e-6 * jnp.sum(out), None
            c, _ = lax.scan(body, x, None, length=ITERS)
            return c

        def fwdbwd_loop(x):
            def body(c, _):
                g = jax.grad(lambda q: jnp.sum(fn(params, q)))(c)
                return c + 1e-6 * g, None
            c, _ = lax.scan(body, x, None, length=ITERS)
            return c

        for tag, loop in (("fwd", fwd_loop), ("fwd+bwd", fwdbwd_loop)):
            j = jax.jit(loop)
            np.asarray(j(x))                                 # compile
            t0 = time.perf_counter()
            np.asarray(j(x))
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{what:10s} {tag:8s} {dt:8.2f} ms/iter", flush=True)

    timed(apply_a, "A current")
    timed(apply_b, "B factored")
    timed(apply_c, "C onehot")


if __name__ == "__main__":
    main()
