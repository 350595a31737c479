"""Minimal Mosaic probe: sub-8-sublane halving-tree slices.

The sublane ("transposed") selection kernels reduce axis 0 by
elementwise halving (`pallas_kernels._tree`), whose last three levels
slice WITHIN a sublane tile (t[:4], t[:2], t[:1] on multi-lane-tile
vectors) — the one pattern in those kernels no recorded Mosaic rule
covers (rule 7 rejects in-tile sublane strided-slices in at least one
other context). This kernel isolates exactly that pattern at the kNN
shapes, so if `knn_transposed_probe` fails to compile, this probe says
whether the tree slices are the cause.

Run on TPU; interpret mode (CPU) checks values only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hitadv_tpu.ops.pallas_kernels import _tree_min, _interpret


def _tree_kernel(x_ref, o_ref):
    o_ref[0] = _tree_min(x_ref[0])                           # [1, lanes]


def tree_min_pallas(x: jnp.ndarray) -> jnp.ndarray:
    B, R, L = x.shape
    return pl.pallas_call(
        _tree_kernel,
        grid=(B,),
        interpret=_interpret(),
        in_specs=[pl.BlockSpec((1, R, L), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, L), x.dtype),
    )(x)


def main():
    rng = np.random.default_rng(0)
    # R spans full tiles down into the sub-8 tree levels; L spans one
    # and multiple lane tiles (rule 7 bit at >128 lanes elsewhere)
    for R in (1024, 64, 8):
        for L in (128, 256, 1024):
            x = jnp.asarray(rng.normal(size=(2, R, L)), jnp.float32)
            try:
                got = np.asarray(jax.jit(tree_min_pallas)(x))
            except Exception as e:
                print(f"R={R:5d} L={L:5d}  COMPILE FAIL "
                      f"{type(e).__name__}: "
                      + str(e).splitlines()[0][:120], flush=True)
                continue
            want = np.asarray(jnp.min(x, axis=1, keepdims=True))
            same = bool(np.array_equal(got, want))
            print(f"R={R:5d} L={L:5d}  ok exact={same}", flush=True)


if __name__ == "__main__":
    main()
