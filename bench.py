"""Benchmark harness: flagship attack throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: full HiT-ADV attacks (the paper's headline engine, eval
config of record: 10 binary steps x 100 Adam iters, PointNet victim,
N=1024) in examples attacked per second per chip. The whole attack is
one XLA program (scanned binary search + Adam + bookkeeping) with the
Pallas geometry backend active.

Secondary metrics in "extra":
  - mfu: model-FLOPs utilization of the flagship attack program —
    XLA-reported FLOPs of the attack's ACTUAL per-iteration scan body
    (hit_adv.make_inner_iter, traced on the XLA geometry backend) x
    iteration count + stage-1/2 setup, divided by wall-clock x chip
    peak (bf16). The reference publishes no FLOPs accounting at all
    (SURVEY.md §6); this defines the perf record.
  - dgcnn_examples_per_sec: HiT-ADV against DGCNN, the *hardest* victim
    (gather/scatter-bound EdgeConv bwd), so the bench sees the hard case
    and not just PointNet's best case.
  - cw_perturb_iters_per_sec: the `CW/Perturb.py:95-173` hot loop.

Baseline (BASELINE.md): the reference publishes no numbers; its measured
quantity is per-phase wall-clock on 1x GPU. BASELINE.json's target is
>10x per v5e chip. vs_baseline divides by
``published.attack_examples_per_sec`` from BASELINE.json when present,
else 1.0 (unknown).

Env knobs (test/smoke use): ``HITADV_BENCH_SMOKE=1`` shrinks every
config to seconds-on-CPU sizes so the JSON contract is testable without
a TPU (tests/test_graft_entry.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SMOKE = os.environ.get("HITADV_BENCH_SMOKE") == "1"

# Peak dense matmul throughput per chip, used for MFU. TPU v5e:
# 197 TFLOP/s bf16. (Bench runs with bf16 activations.)
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e12, "gpu": 1e12}


def _program_flops(jax, fn, *args):
    """XLA-reported FLOPs for one execution of jit(fn)(*args)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):   # older jax: per-device list
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        return flops if flops > 0 else None
    except Exception:
        return None


def _bench_hit_adv(jax, jnp, victim="pointnet", B=64, N=1024, bf16=True,
                   want_flops=False):
    from hitadv_tpu.attacks import base, hit_adv
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu import models
    from hitadv_tpu.nn import functional as nnF

    # bf16 activations: ~1.6x on the victim fwd+bwd, 100% argmax
    # agreement with f32 (logit drift ~5e-4) — the production setting.
    nnF.set_compute_dtype(jnp.bfloat16 if bf16 else None)

    if SMOKE:
        B, N = 4, 64

    init_fn, apply_fn = models.get_model(victim)
    params = init_fn(jax.random.PRNGKey(42))
    logits_fn = lambda x: apply_fn(params, x)  # noqa: E731
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    cfg = hit_adv.HiTADVConfig()          # config of record (10 x 100)
    if SMOKE:
        cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=3,
                                   central_num=12, total_central_num=16,
                                   curv_loss_knn=4)
    attack = hit_adv.make_hit_adv(logits_fn, adv_fn, cfg)

    pts, labels = synthetic_clouds(B, num_points=N, seed=0)
    pts, labels = jnp.asarray(pts), jnp.asarray(labels)

    # Model-FLOPs for MFU: XLA's cost_analysis counts a lax.scan body
    # ONCE (no trip-count multiplication), so analyzing the full attack
    # program reports ~1 iteration's FLOPs. Instead cost-analyze the
    # attack's ACTUAL per-iteration scan body (hit_adv.make_inner_iter:
    # Gaussian-blend deform + victim fwd/bwd + the 3x3 chamfer quirk +
    # ker/hide losses + Adam + bookkeeping) and multiply by the
    # iteration count, plus the one-time stage-1/2 setup. The trace
    # runs on the XLA geometry backend: cost_analysis() reports 0 FLOPs
    # for Pallas custom calls, and the XLA path also counts one-hot
    # MXU *movement* matmuls as the gathers they implement (honest
    # model-FLOPs, not inflated by the data-movement trick).
    flops = None
    if want_flops:
        from hitadv_tpu.attacks.base import BestState, adam_init
        from hitadv_tpu.ops import geometry as _G

        _G.set_backend("xla")
        try:
            ori, cps, cks = jax.jit(
                lambda p, l: hit_adv.prepare_centrals(logits_fn, cfg,
                                                      p, l))(pts, labels)
            inner = hit_adv.make_inner_iter(logits_fn, adv_fn, cfg,
                                            ori, labels, cps, cks)
            pert0 = jnp.zeros((B, cfg.central_num, 3), ori.dtype)
            delta0 = jnp.full((B, cfg.central_num), cfg.min_sigm,
                              ori.dtype)
            carry0 = (pert0, delta0, adam_init(pert0),
                      adam_init(delta0),
                      jnp.full((B,), cfg.init_weight),
                      BestState.init(ori), BestState.init(ori),
                      jnp.zeros_like(ori))
            step_flops = _program_flops(
                jax, lambda c: inner(c, None)[0], carry0)

            def _setup(p, l):
                # stage-1/2 prep PLUS the loop-invariant Gaussian
                # distance field, which the hoist moved out of the
                # per-iteration body (attacks/hit_adv.py)
                o, cp, ck = hit_adv.prepare_centrals(logits_fn, cfg,
                                                     p, l)
                return o, cp, ck, _G.neg_gaussian_field(cp, o)

            setup_flops = _program_flops(jax, _setup, pts, labels) or 0.0
        finally:
            _G.set_backend("auto")
        if step_flops:
            flops = (step_flops * cfg.binary_step * cfg.num_iter
                     + setup_flops)

    # Timing discipline (r4 post-mortem, RESULTS.md "the r4 dip"): a
    # single timed run of a ~1.3 s program is exposed to relay-tunnel
    # congestion — and syncing via np.asarray pulls the [B,N,3] result
    # (768 KB) through the tunnel inside the timed region, which on a
    # congested relay costs 100s of ms. Median of `reps` runs, synced
    # with block_until_ready (a ready-event RPC, no data transfer);
    # the output is pulled once, outside the timed region.
    res = attack(pts, labels, jax.random.PRNGKey(0))   # compile + warm
    float(jnp.sum(res.adv_points.astype(jnp.float32)))  # honest sync
    reps = 1 if SMOKE else 3
    dts = []
    for r in range(reps):
        t0 = time.perf_counter()
        res = attack(pts, labels, jax.random.PRNGKey(1 + r))
        jax.block_until_ready(res)
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[len(dts) // 2]
    # block_until_ready can fire before execution through the relay
    # (see _bench_canary — three canary builds were faked by it). One
    # more rep synced by fetching a scalar RESULT (unfakeable: the
    # bytes must exist to cross the tunnel) cross-checks the median;
    # if the bur-timed reps lied, this rep also drains their backlog,
    # so it reads >> dt and we adopt it (over-stating time — the
    # headline can only ever be under-claimed, never fake-fast).
    t0 = time.perf_counter()
    res = attack(pts, labels, jax.random.PRNGKey(99))
    float(jnp.sum(res.adv_points.astype(jnp.float32)))
    fetch_dt = time.perf_counter() - t0
    sync_ok = fetch_dt <= 1.25 * dt
    if not sync_ok:
        dt = fetch_dt
    iters = cfg.binary_step * cfg.num_iter
    out = {
        "examples_per_sec": B / dt,
        "attack_seconds": dt,
        "attack_seconds_reps": [round(d, 3) for d in dts],
        "attack_seconds_fetchsync": round(fetch_dt, 3),
        "sync_ok": sync_ok,
        "iters_per_sec": iters / dt,
        "batch": B,
        "points": N,
    }
    if flops:
        backend = jax.default_backend()
        peak = PEAK_FLOPS.get(backend, 1e12)
        out["flops"] = flops
        out["mfu"] = (flops / dt) / peak
    return out


def _bench_canary(jax, jnp):
    """Chip-health canary: achieved bf16 matmul TFLOP/s on a pure-MXU
    program (scanned [n, n] @ [n, n] chain, carry-consuming, scalar
    return). Decouples environmental drift from code changes: r4's
    flagship ran at 1.26 s on Aug 19 and the IDENTICAL code measured
    1.44 s on Aug 20 (.r5/bench_check2.log) — without a canary in the
    record, that 14% server-side swing reads as a code regression.
    """
    from jax import lax

    n, iters = (256, 4) if SMOKE else (4096, 512)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = (jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
         * (0.5 / np.sqrt(n))).astype(jnp.bfloat16)

    @jax.jit
    def run(c, b):
        def body(c, _):
            c = jnp.matmul(c, b, preferred_element_type=jnp.float32)
            # renormalize the carry each step: the raw chain's typical
            # singular values < 1 underflow bf16 to EXACT ZERO within
            # ~32 steps (probe: sum=0.0) — timing on all-zero data.
            # One n^2 rsqrt-scale per 2n^3-FLOP matmul is free.
            c = c * lax.rsqrt(jnp.mean(c * c) + 1e-30)
            return c.astype(jnp.bfloat16), ()
        c, _ = lax.scan(body, c, None, length=iters)
        return c

    # Timing shape (round-5 fix, .r5/probe_canary_sync.log): through
    # the axon relay, block_until_ready LIES — the ready event can
    # fire BEFORE execution. Three canary builds timed with it read
    # 45137 / 103097 / 646064 "TF/s" (nameplate: 197); the standalone
    # probe saw the same per-call sync behave honestly at ~394 ms of
    # compute, so honesty is queue-state-dependent, not size-
    # guaranteed. The only unfakeable sync is fetching a RESULT: data
    # bytes cannot cross the tunnel before they exist. Chain the
    # carry across reps (data dependency forces sequential execution
    # on device) and end the timed region with one scalar fetch of
    # the final carry; the single ~30 ms RTT is <3% of the window.
    reps = 2 if SMOKE else 3
    c = run(a, b)                                  # compile + warmup
    float(jnp.sum(c.astype(jnp.float32)))          # honest warmup sync
    t0 = time.perf_counter()
    for _ in range(reps):
        c = run(c, b)
    s = float(jnp.sum(c.astype(jnp.float32)))      # forces the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(s), "canary chain produced non-finite data"
    return (reps * iters * 2 * n ** 3 / dt) / 1e12


def _make_cw_run(jax, jnp, B, N, ITERS):
    """Build the jitted CW-Perturb hot loop (`CW/Perturb.py:95-173`).

    Returns ``(run, pts)``. Shared with `scripts/profile_cw.py` so the
    profiler traces the exact program the bench times.
    """
    from jax import lax

    from hitadv_tpu import losses
    from hitadv_tpu.attacks import base
    from hitadv_tpu.models import pointnet

    params = pointnet.init(jax.random.PRNGKey(0))
    logits_fn = lambda x: pointnet.apply(params, x)  # noqa: E731
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    pts = jnp.asarray(np.random.RandomState(0)
                      .randn(B, N, 3).astype(np.float32) * 0.5)
    labels = jnp.zeros((B,), jnp.int32)
    weight = jnp.full((B,), 10.0)

    def one_iter(carry, _):
        adv, opt_state, best_dist = carry

        def loss_fn(adv):
            logits = logits_fn(adv)
            al = adv_fn(logits, labels)
            dl = losses.chamfer_dist(adv, pts) * weight
            return jnp.mean(al + dl), logits

        (_, logits), grad = jax.value_and_grad(loss_fn,
                                               has_aux=True)(adv)
        new_adv, opt_state = base.adam_update(grad, opt_state, adv, 1e-2)
        dist = jnp.sqrt(jnp.sum((adv - pts) ** 2, axis=(1, 2)))
        pred = jnp.argmax(logits, axis=-1)
        better = (dist < best_dist) & (pred != labels)
        best_dist = jnp.where(better, dist, best_dist)
        return (new_adv, opt_state, best_dist), ()

    @jax.jit
    def run(pts):
        init = (pts, base.adam_init(pts), jnp.full((B,), 1e10))
        (adv, _, best), _ = lax.scan(one_iter, init, None, length=ITERS)
        return adv

    return run, pts


def _bench_cw_iters(jax, jnp, B=64, N=1024, ITERS=300):
    # ITERS=300 (3x the reference's per-binary-step count) so the one
    # ~30 ms relay dispatch round-trip is <5% of the measured window —
    # at ITERS=100 it was ~14% and swamped real per-iter changes. The
    # metric stays a per-iteration rate of the same scanned body.
    if SMOKE:
        B, N, ITERS = 4, 64, 5
    run, pts = _make_cw_run(jax, jnp, B, N, ITERS)

    adv = run(pts)                              # compile + warm
    float(jnp.sum(adv.astype(jnp.float32)))     # honest sync
    dts = []
    for _ in range(1 if SMOKE else 3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pts))
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[len(dts) // 2]
    # scalar-fetch cross-check rep (see _bench_hit_adv): adopt it if
    # the block_until_ready-timed median was faked by the relay.
    t0 = time.perf_counter()
    adv = run(pts)
    float(jnp.sum(adv.astype(jnp.float32)))
    fetch_dt = time.perf_counter() - t0
    if fetch_dt > 1.25 * dt:
        dt = fetch_dt
    return ITERS / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    # The environment's sitecustomize imports jax (and pins the platform)
    # at interpreter start, so a JAX_PLATFORMS env var alone is too late;
    # re-assert it through the config (same recipe as tests/conftest.py).
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)

    from hitadv_tpu.utils import enable_compile_cache
    from hitadv_tpu.nn import functional as _nnF

    enable_compile_cache()

    # _bench_hit_adv sets the production bf16 compute dtype and must
    # leave it set while timing; restore the caller's dtype on the way
    # out so an in-process invocation (tests) doesn't leak bf16 into
    # everything that runs after (round-5 post-mortem: 20 torch-parity
    # tests failed at 2.6e-3 from exactly this).
    prev_dtype = _nnF.get_compute_dtype()
    try:
        _run_benches(jax, jnp)
    finally:
        _nnF.set_compute_dtype(prev_dtype)


def _run_benches(jax, jnp) -> None:
    canary = _bench_canary(jax, jnp)
    hit = _bench_hit_adv(jax, jnp, want_flops=True)
    dgc = _bench_hit_adv(jax, jnp, victim="dgcnn", B=16,
                         want_flops=True)
    cw_iters = _bench_cw_iters(jax, jnp)

    # Batch-scaling study (VERDICT r3 Next #3): the reference's config
    # of record evaluates at batch 256 (`eval.py:26`); measure the
    # flagship at B ∈ {128, 256} too so the headline B is a recorded
    # choice, not an accident. Skipped in smoke mode; compiles hit the
    # persistent cache after the first run.
    b_scaling = {str(hit["batch"]): round(hit["examples_per_sec"], 2)}
    if not SMOKE:
        for b in (128, 256):
            try:
                r = _bench_hit_adv(jax, jnp, B=b)
                b_scaling[str(b)] = round(r["examples_per_sec"], 2)
            except Exception as e:   # e.g. VMEM/HBM limit at large B
                b_scaling[str(b)] = f"failed: {type(e).__name__}"

    # vs_baseline: prefer a published reference number (there is none —
    # BASELINE.md), else the measured torch-CPU reference baseline
    # written by scripts/bench_reference.py (cross-hardware: reference
    # CUDA path can't run here; caveat recorded in BASELINE.json/md).
    baseline = None
    baseline_kind = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            bj = json.load(f)
        baseline = bj.get("published", {}).get("attack_examples_per_sec")
        baseline_kind = "published" if baseline else None
        if not baseline:
            baseline = bj.get("measured", {}).get(
                "reference_cpu", {}).get("hitadv_examples_per_sec")
            baseline_kind = "measured_reference_torch_cpu" if baseline \
                else None
    except Exception:
        pass
    vs = (hit["examples_per_sec"] / baseline) if baseline else 1.0

    extra = {
        "hitadv_attack_seconds": round(hit["attack_seconds"], 2),
        "hitadv_attack_seconds_reps": hit["attack_seconds_reps"],
        "hitadv_attack_seconds_fetchsync": hit["attack_seconds_fetchsync"],
        "hitadv_sync_ok": hit["sync_ok"],
        "hitadv_iters_per_sec": round(hit["iters_per_sec"], 1),
        "cw_perturb_iters_per_sec": round(cw_iters, 1),
        "dgcnn_examples_per_sec": round(dgc["examples_per_sec"], 3),
        "dgcnn_attack_seconds": round(dgc["attack_seconds"], 2),
        "dgcnn_batch": dgc["batch"],
        "batch": hit["batch"], "points": hit["points"],
        "b_scaling_examples_per_sec": b_scaling,
        # pure-MXU chip-health canary (bf16 nameplate 197): read the
        # flagship number RELATIVE to this — the tunnel/TPU backend
        # drifts >10% day to day (see _bench_canary)
        "canary_matmul_tflops": round(canary, 1),
    }
    if baseline_kind:
        extra["baseline_kind"] = baseline_kind
    # MFU must never silently vanish (VERDICT r4 Weak #6): if XLA's
    # cost_analysis() yields no FLOPs (jax version drift, backend
    # change), record an explicit null + warning instead of dropping
    # the key, so the degradation is visible in the BENCH record.
    if "mfu" in hit:
        extra["mfu"] = round(hit["mfu"], 4)
        extra["attack_tflops"] = round(hit["flops"] / 1e12, 2)
    else:
        extra["mfu"] = None
        extra["mfu_warning"] = ("cost_analysis() reported no FLOPs for "
                                "the flagship scan body; MFU unavailable")
    if "mfu" in dgc:
        extra["dgcnn_mfu"] = round(dgc["mfu"], 4)
    elif not SMOKE:
        extra["dgcnn_mfu"] = None
    # Model-FLOPs MFU is a meaningless ceiling for a selection/
    # movement-bound program (the numerator excludes the one-hot
    # matmuls and the FLOP-free kNN selection loop that ARE the
    # program). dgcnn_floor_frac is measured-ms-per-iter relative to
    # the formulation floor re-attributed in round 5 AFTER the
    # bias-dtype fix moved the 4 feature kNNs onto the packed-bf16
    # one-pass-DEFAULT kernels (.r5/profile_dgcnn_postbias.log):
    # 1.58 ms kNN (4 kernels, selection-bound, in-program — grid
    # pipelining overlaps them below their 0.578 ms standalone time,
    # so a sum-of-standalone floor overshoots) + 4.70 ms graph-max-
    # pool fwd+bwd at shape speed-of-light (C'=256 slot dots ~97% of
    # bf16 nameplate) + 0.26 ms convs = 6.54 ms/iter at this exact
    # config (B=16, N=1024, k=20, bf16). Round-4's 8.57 ms constant
    # predates the kNN dtype fix.
    if dgc["batch"] == 16 and dgc["points"] == 1024:
        dgcnn_ms_per_iter = 1e3 / dgc["iters_per_sec"]
        extra["dgcnn_floor_frac"] = round(6.54 / dgcnn_ms_per_iter, 3)

    print(json.dumps({
        "metric": "hitadv_attack_examples_per_sec_B64_N1024_pointnet",
        "value": round(hit["examples_per_sec"], 2),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
