"""Dump the optimized HLO of the CW-Perturb bench program (debug aid).

Identifies what the big HBM-bound fusion attributed to the knn_points
call site actually computes. Writes /tmp/cw_hlo.txt.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))



def main():
    import jax
    import jax.numpy as jnp

    import bench
    from hitadv_tpu.nn import functional as nnF

    nnF.set_compute_dtype(jnp.bfloat16)
    run, pts = bench._make_cw_run(jax, jnp, 64, 1024, 25)
    compiled = jax.jit(lambda p: run(p)).lower(pts).compile()
    txt = compiled.as_text()
    with open("/tmp/cw_hlo.txt", "w") as f:
        f.write(txt)
    print("wrote /tmp/cw_hlo.txt", len(txt))


if __name__ == "__main__":
    main()
