"""Ring set-distance at scale: CW-Perturb with `--dist_func chamfer`.

Compares the dense chamfer attack program against the ring-chamfer
(`--sp_devices 8`) program at large N on the 8-virtual-device CPU mesh:
compiled temp memory (the [B, N, N] term vs [B, N/D, N/D] blocks) and
wall-clock for a short run. VERDICT r2 item 8 / SURVEY.md §5.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/ring_scale_bench.py [N]
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    from hitadv_tpu.config import EvalConfig
    from hitadv_tpu.eval import build_attack, build_model

    B = 2
    base_kw = dict(model="pointnet", attack_type="CW-Perturb",
                   dist_func="chamfer", binary_step=1, num_iter=3,
                   num_point=n)
    cfgs = {"dense": EvalConfig(**base_kw),
            "ring8": EvalConfig(**base_kw, sp_devices=8)}

    params, logits_fn = build_model(cfgs["dense"])
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, n, 3)), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)

    for name, cfg in cfgs.items():
        atk = jax.jit(build_attack(cfg, logits_fn))
        lowered = atk.lower(pts, labels, key)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        t0 = time.perf_counter()
        out = compiled(pts, labels, key)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name}: temp={ma.temp_size_in_bytes/1e9:.3f} GB "
              f"argout={ma.output_size_in_bytes/1e6:.1f} MB "
              f"wall={dt:.2f}s  (B={B}, N={n}, 1x3 iters)")


if __name__ == "__main__":
    main()
