"""Probe which host-side sync patterns actually await TPU compute
through the axon relay.

Round-5 context: bench.py's chip-health canary read 45137 TF/s with
per-call block_until_ready on a scalar, and 103097 TF/s with a chained
[n,n] carry synced once — both physically impossible (v5e bf16
nameplate is 197 TF/s), so NEITHER pattern waited for execution. Yet
the flagship attack timings in the same process (per-call
block_until_ready) look real (1.37 s, stable). This probe times one
known compute quantity (scanned 4096x4096 bf16 matmul chain) under
each sync pattern and prints implied TF/s, so the canary can be built
on a pattern measured honest.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    n = 4096
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = (jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
         * (0.5 / np.sqrt(n))).astype(jnp.bfloat16)

    def make_run(iters):
        @jax.jit
        def run(c, b):
            def body(c, _):
                return jnp.matmul(c, b,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16), ()
            c, _ = lax.scan(body, c, None, length=iters)
            return c
        return run

    for iters in (32, 512):
        run = make_run(iters)
        flops = iters * 2 * n ** 3
        c = jax.block_until_ready(run(a, b))   # compile + warm
        print(f"--- iters={iters} ({flops/1e12:.2f} TFLOP/call)",
              flush=True)

        # pattern 1: per-call block_until_ready, fresh input each call
        for rep in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(a, b))
            dt = time.perf_counter() - t0
            print(f"  per-call bur fresh-input rep{rep}: {dt*1e3:8.2f} ms"
                  f"  -> {flops/dt/1e12:9.1f} TF/s", flush=True)

        # pattern 2: per-call block_until_ready, chained carry
        for rep in range(3):
            t0 = time.perf_counter()
            c = jax.block_until_ready(run(c, b))
            dt = time.perf_counter() - t0
            print(f"  per-call bur chained     rep{rep}: {dt*1e3:8.2f} ms"
                  f"  -> {flops/dt/1e12:9.1f} TF/s", flush=True)

        # pattern 3: chain 4 calls async, sync once at the end
        t0 = time.perf_counter()
        for _ in range(4):
            c = run(c, b)
        jax.block_until_ready(c)
        dt = time.perf_counter() - t0
        print(f"  4x chained, one bur:   {dt*1e3:8.2f} ms"
              f"  -> {4*flops/dt/1e12:9.1f} TF/s", flush=True)

        # pattern 4: scalar fetch (np.asarray of a reduced output)
        t0 = time.perf_counter()
        c = run(c, b)
        s = float(jnp.sum(c.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(f"  1x + scalar fetch:     {dt*1e3:8.2f} ms"
              f"  -> {flops/dt/1e12:9.1f} TF/s  (sum={s:.3e})",
              flush=True)

    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
