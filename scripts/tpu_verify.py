"""End-to-end TPU numerics verification of the Pallas kernel layer.

Drives the public API on the real chip and compares the "pallas"
backend against the "xla" backend for values AND gradients; isolates
the scatter/kNN backward kernels with identical indices so boundary
tie-swaps can't mask kernel bugs. This catches the class of failure
the CPU suite (interpreter mode) cannot: Mosaic compile behavior —
e.g. the default-precision bf16 rounding of f32 one-hot matmul
operands (2e-2 grad error, fixed with precision=HIGHEST) and the
B=1 FPS layout-inference crash, both found by exactly this script.

Usage: python -u scripts/tpu_verify.py   (run as a background task;
first compile of the attack checks takes minutes).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import glob
import json
import re

import jax
import jax.numpy as jnp
import numpy as np

import hitadv_tpu.ops as ops
from hitadv_tpu.ops import geometry as G
from hitadv_tpu.ops import pallas_kernels as PK
from hitadv_tpu.ops import set_backend

ok = True
RESULTS = []          # [{name, ok, detail}] → VERIFY_r<N>.json


def check(name, cond, detail=""):
    global ok
    print(("PASS " if cond else "FAIL ") + name
          + (" " + detail if detail else ""), flush=True)
    RESULTS.append({"name": name, "ok": bool(cond), "detail": detail})
    ok = ok and cond


def _artifact_path() -> str:
    """`VERIFY_r<N>.json` next to the driver's BENCH artifacts.

    The round number is the CURRENT round: the driver writes
    BENCH_r{N}.json at round end, so N = max committed BENCH round + 1
    (override with HITADV_VERIFY_OUT)."""
    override = os.environ.get("HITADV_VERIFY_OUT")
    if override:
        return override
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [int(m.group(1)) for p in glob.glob(
        os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(repo, f"VERIFY_r{n:02d}.json")


def write_artifact():
    """Persist pass/fail per check so 'bitwise on hardware' claims are
    reproducible evidence (VERDICT r3 Next #7)."""
    import datetime

    path = _artifact_path()
    payload = {
        "ok": bool(ok),
        "n_checks": len(RESULTS),
        "n_failed": sum(1 for r in RESULTS if not r["ok"]),
        "devices": [str(d) for d in jax.devices()],
        "extract_layout_default": PK.get_extract_layout(),
        "timestamp": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "checks": RESULTS,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", flush=True)


def _forced_highest_knn(x, k):
    """Pre-cast bf16->f32 so `_knn_dot_precision` picks HIGHEST — the
    reference arm for the bf16 DEFAULT-dot bitwise check."""
    xf = x.astype(jnp.float32)
    return PK.knn_pallas(xf, xf, k)


def main():
    global ok
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # ---- scatter_add_rows vs .at[].add with IDENTICAL idx ----
    B, M, N, C = 4, 4096, 1024, 3
    idx = jnp.asarray(rng.integers(0, N, size=(B, M)), jnp.int32)
    contrib = jnp.asarray(rng.normal(size=(B, M, C)), jnp.float32)
    gp_p = np.asarray(jax.jit(
        lambda i, c: PK.scatter_add_rows_pallas(i, c, N))(idx, contrib))
    gp_x = np.asarray(jax.jit(lambda i, c: jax.vmap(
        lambda ii, cc: jnp.zeros((N, C), jnp.float32).at[ii].add(cc)
    )(i, c))(idx, contrib))
    d = np.max(np.abs(gp_p - gp_x))
    check("scatter_add_rows identical-idx f32", d < 1e-4, f"max={d:.2e}")

    # ---- kNN fwd + bwd vs the XLA backend, incl. non-128-multiple N ----
    for n in (1024, 777):
        q = jnp.asarray(rng.normal(size=(4, 256, 3)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(4, n, 3)), jnp.float32)

        def loss(q, p):
            r = ops.knn_points(q, p, 16)
            return jnp.sum(jnp.sin(r.dists))

        outs = {}
        for be in ("pallas", "xla"):
            set_backend(be)
            v, gs = jax.jit(jax.value_and_grad(loss, (0, 1)))(q, p)
            outs[be] = (np.asarray(v), *map(np.asarray, gs))
        set_backend("auto")
        dv = abs(outs["pallas"][0] - outs["xla"][0])
        dgq = np.max(np.abs(outs["pallas"][1] - outs["xla"][1]))
        dgp = np.max(np.abs(outs["pallas"][2] - outs["xla"][2]))
        check(f"knn fwd+bwd N={n}", dv < 1e-3 and dgq < 1e-3
              and dgp < 1e-3, f"dv={dv:.1e} dgq={dgq:.1e} dgp={dgp:.1e}")

    # ---- DGCNN f32: full grad must match the XLA backend closely ----
    from hitadv_tpu.models import dgcnn
    params = dgcnn.init(jax.random.PRNGKey(0), num_classes=40)
    x = jnp.asarray(rng.normal(size=(2, 512, 3)), jnp.float32)

    def dg_loss(x):
        return jnp.sum(dgcnn.apply(params, x) ** 2)

    res = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        v, g = jax.jit(jax.value_and_grad(dg_loss))(x)
        res[be] = (float(v), np.asarray(g))
    set_backend("auto")
    rel = abs(res["pallas"][0] - res["xla"][0]) / (abs(res["xla"][0]) + 1e-9)
    gd = (np.max(np.abs(res["pallas"][1] - res["xla"][1]))
          / (np.max(np.abs(res["xla"][1])) + 1e-9))
    check("dgcnn f32 fwd+bwd vs xla backend", rel < 1e-4 and gd < 1e-3,
          f"rel={rel:.1e} graddiff={gd:.1e}")

    # ---- ball query + PointNet++ (the sort-free Pallas kernel) ----
    xyzb = jnp.asarray(rng.uniform(size=(4, 512, 3)), jnp.float32)
    newb = xyzb[:, :128]
    bq = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        bq[be] = np.asarray(jax.jit(
            lambda x, n: ops.query_ball_point(0.2, 32, x, n))(xyzb, newb))
    set_backend("auto")
    frac = np.mean(bq["pallas"] != bq["xla"])
    # rim ties (|d^2-r^2| ~ 2e-7) are implementation-defined; anything
    # beyond a stray flip means a real kernel bug
    check("ball_query pallas vs xla", frac < 1e-3, f"mismatch={frac:.2e}")

    from hitadv_tpu.models import pointnet2
    p2 = pointnet2.init(jax.random.PRNGKey(2), num_classes=40)
    x2 = jnp.asarray(rng.uniform(size=(2, 256, 3)), jnp.float32)

    def p2_loss(x):
        return jnp.sum(pointnet2.apply(p2, x) ** 2)

    res = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        v, g = jax.jit(jax.value_and_grad(p2_loss))(x2)
        res[be] = (float(v), np.asarray(g))
    set_backend("auto")
    rel = abs(res["pallas"][0] - res["xla"][0]) / (abs(res["xla"][0]) + 1e-9)
    gd = (np.max(np.abs(res["pallas"][1] - res["xla"][1]))
          / (np.max(np.abs(res["xla"][1])) + 1e-9))
    check("pointnet++ fwd+bwd vs xla backend", rel < 1e-3 and gd < 1e-2,
          f"rel={rel:.1e} graddiff={gd:.1e}")

    # ---- PCT (fused project-then-gather Local_ops + attention) ----
    # PCT's geometry rides the PACKED index-only kNN on TPU, whose
    # documented contract (ops/geometry.py::knn_idx) permits neighbor
    # flips between candidates within the truncation quantum of the
    # k-boundary. On near-tie-rich uniform clouds ~0.1% of entries flip
    # vs XLA top_k (r4 diagnostic: 34/32768), and attention on random
    # init amplifies those legitimate set changes to O(1) grad moves —
    # a raw pallas-vs-xla grad compare therefore measures tie density,
    # not kernel correctness. Three contracts are checked instead:
    # (1) FPS center selection identical across backends; (2) boundary
    # flip fraction stays at the tie-noise level; (3) with indices
    # PINNED, forward AND gradient match between backends (the
    # gather/scatter movement-kernel machinery itself).
    from hitadv_tpu.models import pct
    pctp = pct.init(jax.random.PRNGKey(3), num_classes=40)
    x3 = jnp.asarray(rng.uniform(size=(2, 700, 3)), jnp.float32)

    fps_out = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        fps_out[be] = np.asarray(jax.jit(
            lambda x: G.farthest_point_sample(x, 512))(x3))
    set_backend("auto")
    check("pct fps pallas vs xla", np.array_equal(fps_out["pallas"],
                                                  fps_out["xla"]))

    fidx = jnp.asarray(fps_out["xla"])
    knn_out = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        knn_out[be] = np.asarray(jax.jit(
            lambda x, fi: G.knn_point(32, x, G.index_points(x, fi))
        )(x3, fidx))
    set_backend("auto")
    flip = float(np.mean(knn_out["pallas"] != knn_out["xla"]))
    check("pct knn boundary flips", flip < 2e-3, f"flip_frac={flip:.2e}")

    # grad machinery with pinned indices: monkeypatch the two geometry
    # selectors to constants (stop_gradient'd in the model anyway)
    pin1 = jnp.asarray(knn_out["xla"])
    x1 = jax.jit(lambda x, fi: G.index_points(x, fi))(x3, fidx)
    f2 = jnp.asarray(np.asarray(jax.jit(
        lambda x: G.farthest_point_sample(x, 256))(x1)))
    pin2 = jnp.asarray(np.asarray(jax.jit(
        lambda x, fi: G.knn_point(32, x, G.index_points(x, fi)))(x1, f2)))
    pins_f, pins_k = [fidx, f2], [pin1, pin2]
    calls = {"f": 0, "k": 0}
    orig_fps, orig_knn = G.farthest_point_sample, G.knn_point

    def fps_pinned(xyz, npoint, key=None):
        calls["f"] += 1
        return pins_f[(calls["f"] - 1) % 2]

    def knn_pinned(ns, xyz, new_xyz):
        calls["k"] += 1
        return pins_k[(calls["k"] - 1) % 2]

    G.farthest_point_sample = fps_pinned
    G.knn_point = knn_pinned
    try:
        def pct_loss(x):
            return jnp.sum(pct.apply(pctp, x) ** 2)

        res = {}
        for be in ("pallas", "xla"):
            set_backend(be)
            calls["f"] = calls["k"] = 0
            v, g = jax.jit(jax.value_and_grad(pct_loss))(x3)
            res[be] = (float(v), np.asarray(g))
        set_backend("auto")
    finally:
        G.farthest_point_sample = orig_fps
        G.knn_point = orig_knn
    rel = abs(res["pallas"][0] - res["xla"][0]) / (abs(res["xla"][0]) + 1e-9)
    gd = (np.linalg.norm(res["pallas"][1] - res["xla"][1])
          / (np.linalg.norm(res["xla"][1]) + 1e-9))
    check("pct fwd+bwd vs xla backend (pinned idx)",
          rel < 1e-3 and gd < 1e-2, f"rel={rel:.1e} gradL2={gd:.1e}")

    # ---- bf16 attack mode: fused paths stay finite and near f32 ----
    from hitadv_tpu.nn import functional as nnF
    for name, apply_fn, prm in (("pointnet2", pointnet2.apply, p2),
                                ("pct", pct.apply, pctp)):
        f32 = np.asarray(jax.jit(
            lambda x, ap=apply_fn, pp=prm: ap(pp, x))(x3))
        nnF.set_compute_dtype(jnp.bfloat16)
        b16 = np.asarray(jax.jit(
            lambda x, ap=apply_fn, pp=prm: ap(pp, x))(x3),
            np.float32)
        nnF.set_compute_dtype(None)
        rel = (np.max(np.abs(b16 - f32))
               / (np.max(np.abs(f32)) + 1e-9))
        check(f"{name} bf16 vs f32 logits", rel < 0.1
              and bool(np.isfinite(b16).all()), f"rel={rel:.1e}")

    # ---- PointConv (kde + FPS), incl. the B=1 degenerate cloud ----
    from hitadv_tpu.models import pointconv
    pcp = pointconv.init(jax.random.PRNGKey(1), num_classes=40)
    for tag, xin in (("B2 N700", rng.normal(size=(2, 700, 3))),
                     ("B1 zeros", np.zeros((1, 512, 3)))):
        xin = jnp.asarray(xin, jnp.float32)

        def pc_loss(x):
            return jnp.sum(pointconv.apply(pcp, x) ** 2)

        vals = {}
        for be in ("pallas", "xla"):
            set_backend(be)
            v, g = jax.jit(jax.value_and_grad(pc_loss))(xin)
            vals[be] = (float(v), np.asarray(g))
        set_backend("auto")
        rel = (abs(vals["pallas"][0] - vals["xla"][0])
               / (abs(vals["xla"][0]) + 1e-9))
        gd = (np.max(np.abs(vals["pallas"][1] - vals["xla"][1]))
              / (np.max(np.abs(vals["xla"][1])) + 1e-9))
        fin = bool(np.isfinite(vals["pallas"][1]).all())
        check(f"pointconv {tag}", rel < 5e-3 and gd < 5e-2 and fin,
              f"rel={rel:.1e} graddiff={gd:.1e} finite={fin}")

    # ---- sublane ("transposed") selection-loop layout on hardware ----
    # Mosaic-compile + selection-equality checks of the layout switch;
    # distances carry FMA-association noise, so compare indices (and
    # dists only within 1e-5). FPS greedy selection may legitimately
    # diverge after a near-tie flip — report the first-divergence step
    # instead of hard-failing on generic data.
    # The sublane kernels compile on real hardware for the FIRST time
    # here (interpret mode checks no Mosaic rules, and the sub-8-sublane
    # tree slices are an untested pattern) — a Mosaic compile failure
    # must record a FAIL and keep the remaining checks running, not
    # abort the script.
    try:
        q = jnp.asarray(rng.normal(size=(4, 512, 64)), jnp.float32)
        outs = {}
        for layout in ("lanes", "sublanes"):
            PK.set_extract_layout(layout)
            try:
                d, i = jax.jit(lambda x: PK.knn_pallas(x, x, 20))(q)
                dp, ip = jax.jit(
                    lambda x: PK.knn_pallas(x, x, 20, packed=True))(q)
                outs[layout] = tuple(map(np.asarray, (d, i, dp, ip)))
            finally:
                PK.set_extract_layout("lanes")
        same_i = np.array_equal(outs["lanes"][1], outs["sublanes"][1])
        # dist tolerance is RELATIVE: the layouts associate the
        # qn - 2*cross + pn FMAs differently, so the noise scales with
        # the squared-distance magnitude (~128 for 64-dim randn data —
        # an absolute 1e-5 gate was measuring the data scale, not the
        # kernel: r4 hardware run saw 1.5e-5 abs = 1.2e-7 relative
        # with ALL indices equal)
        scale = np.max(np.abs(outs["lanes"][0])) + 1e-30
        dd = np.max(np.abs(outs["lanes"][0] - outs["sublanes"][0])) / scale
        same_ip = np.array_equal(outs["lanes"][3], outs["sublanes"][3])
        check("knn sublane layout (exact)", same_i and dd < 1e-6,
              f"idx_equal={same_i} rel_distdiff={dd:.1e}")
        check("knn sublane layout (packed)", same_ip,
              f"idx_equal={same_ip}")
    except Exception as e:  # Mosaic compile failure
        check("knn sublane layout", False, f"EXC {type(e).__name__}: "
              + str(e).splitlines()[0][:160])

    xyz4 = jnp.asarray(rng.uniform(-1, 1, size=(4, 1024, 3)), jnp.float32)
    ctr4 = xyz4[:, :256]
    try:
        bq = {}
        fp = {}
        for layout in ("lanes", "sublanes"):
            PK.set_extract_layout(layout)
            try:
                bq[layout] = np.asarray(jax.jit(
                    lambda c: PK.ball_query_pallas(0.2, 32, xyz4, c)
                )(ctr4))
                fp[layout] = np.asarray(jax.jit(
                    lambda x: PK.fps_pallas_from_start(
                        x, 256, jnp.zeros((4,), jnp.int32)))(xyz4))
            finally:
                PK.set_extract_layout("lanes")
        bq_bad = int((bq["lanes"] != bq["sublanes"]).sum())
        check("ball_query sublane layout", bq_bad == 0,
              f"mismatched={bq_bad}/{bq['lanes'].size}")
        fp_same = np.array_equal(fp["lanes"], fp["sublanes"])
        if fp_same:
            check("fps sublane layout", True, "identical")
        else:
            firsts = [int(np.argmax(r)) for r in
                      (fp["lanes"] != fp["sublanes"])]
            check("fps sublane layout", False,
                  f"first divergence per batch at steps {firsts} "
                  "(near-tie flip is tolerable; investigate if early)")
    except Exception as e:  # Mosaic compile failure
        check("ballq/fps sublane layout", False,
              f"EXC {type(e).__name__}: "
              + str(e).splitlines()[0][:160])

    # ---- bf16 feature kNN: one-pass DEFAULT dot is bitwise HIGHEST --
    # bf16-origin operands upcast exactly to f32, so DEFAULT's operand
    # rounding is the identity — the one-pass dot must reproduce the
    # six-pass HIGHEST selection AND distances bitwise (the claim that
    # lets bf16 attack mode skip 5/6 of the cross-term MXU passes).
    try:
        import functools as _ft

        xb = jnp.asarray(rng.normal(size=(4, 512, 64)), jnp.bfloat16)
        fast = jax.jit(lambda x: PK.knn_pallas(x, x, 20))(xb)
        slow = jax.jit(_ft.partial(_forced_highest_knn, k=20))(xb)
        d_same = bool(np.array_equal(np.asarray(fast[0]),
                                     np.asarray(slow[0])))
        i_same = bool(np.array_equal(np.asarray(fast[1]),
                                     np.asarray(slow[1])))
        check("bf16 knn DEFAULT dot bitwise vs HIGHEST",
              d_same and i_same, f"dists={d_same} idx={i_same}")
    except Exception as e:
        check("bf16 knn DEFAULT dot bitwise vs HIGHEST", False,
              f"EXC {type(e).__name__}: " + str(e).splitlines()[0][:160])

    # ---- grouped neighbors-major gather/scatter (PN++/PCT path) ----
    # gather_group_nm consumes idx as produced ([B, S, ns]) and writes
    # [B, ns, S, C]; fwd must be BITWISE take_along_axis in both
    # dtypes, bwd within the hi|lo f32 scatter contract.
    try:
        for dt, gate in ((jnp.bfloat16, 0.0), (jnp.float32, 5e-5)):
            pts = jnp.asarray(rng.normal(size=(4, 512, 64)),
                              jnp.float32).astype(dt)
            gidx = jnp.asarray(
                rng.integers(0, 512, (4, 256, 32)), jnp.int32)
            got = jax.jit(PK.gather_group_pallas)(pts, gidx)
            ref = jnp.transpose(jnp.take_along_axis(
                pts, gidx.reshape(4, -1)[..., None], axis=1
            ).reshape(4, 256, 32, 64), (0, 2, 1, 3))
            f_same = bool(np.array_equal(np.asarray(got),
                                         np.asarray(ref)))
            gcot = jnp.asarray(rng.normal(size=(4, 32, 256, 64)),
                               jnp.float32).astype(dt)
            sc = jax.jit(lambda i, gg: PK.scatter_add_group_pallas(
                i, gg, 512))(gidx, gcot)
            sref = jax.jit(lambda i, gg: PK.scatter_add_rows_pallas(
                i.reshape(4, -1),
                jnp.transpose(gg, (0, 2, 1, 3)).reshape(4, -1, 64),
                512))(gidx, gcot)
            dmax = float(jnp.max(jnp.abs(
                sc.astype(jnp.float32) - sref.astype(jnp.float32))))
            check(f"gather_group nm {np.dtype(dt).name}",
                  f_same and dmax <= gate,
                  f"fwd_bitwise={f_same} bwd_maxdiff={dmax:.1e}")
    except Exception as e:  # Mosaic compile failure
        check("gather_group nm", False,
              f"EXC {type(e).__name__}: " + str(e).splitlines()[0][:160])

    # ---- gaussian_blend: hoisted negd is bitwise on HW ----
    # The HiT-ADV scan hoists the loop-invariant distance field
    # (G.neg_gaussian_field). CPU tests pin bitwise equality; TPU
    # fusion could in principle differ between the two program
    # shapes, so re-assert it on the chip (values AND pert/delta
    # grads).
    cb = jnp.asarray(rng.normal(size=(2, 24, 3)), jnp.float32)
    ob = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
    db = jnp.asarray(0.1 + rng.uniform(size=(2, 24)) * 1.1, jnp.float32)
    pb = jnp.asarray(rng.normal(size=(2, 24, 3)) * 0.1, jnp.float32)

    def _blend_loss(fn):
        def f(delta, pert):
            num, deno = fn(delta, pert)
            return jnp.sum(num ** 2) + jnp.sum(deno ** 2)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    v_i, g_i = _blend_loss(
        lambda d, p: G.gaussian_blend(cb, ob, d, p))(db, pb)
    v_h, g_h = _blend_loss(
        lambda d, p: G.gaussian_blend(
            cb, ob, d, p, negd=G.neg_gaussian_field(cb, ob)))(db, pb)
    blend_same = bool(np.array_equal(np.asarray(v_i), np.asarray(v_h))) \
        and all(bool(np.array_equal(np.asarray(a), np.asarray(b)))
                for a, b in zip(g_i, g_h))
    check("gaussian_blend negd hoist bitwise", blend_same,
          f"value inline={float(v_i):.6e} hoisted={float(v_h):.6e}")

    # ---- schedule-pinned blend-from-field kernel pair (round 5) ----
    # the B>=128 HiT-ADV route: values + (delta, pert) grads vs the
    # stock hoisted-field program, on the chip.
    try:
        negdt_b = jnp.swapaxes(G.neg_gaussian_field(cb, ob), 1, 2)
        v_k, g_k = _blend_loss(
            lambda d, p: G.gaussian_blend_negdt(negdt_b, d, p))(db, pb)
        kerr = max(
            abs(float(v_k) - float(v_h)) / (abs(float(v_h)) + 1e-30),
            max(float(jnp.max(jnp.abs(a - b)))
                / (float(jnp.max(jnp.abs(a))) + 1e-30)
                for a, b in zip(g_h, g_k)))
        check("gaussian_blend negdt kernel pair", kerr < 1e-4,
              f"max rel err {kerr:.2e}")
    except Exception as e:  # Mosaic compile failure
        check("gaussian_blend negdt kernel pair", False,
              f"EXC {type(e).__name__}: " + str(e).splitlines()[0][:160])

    # ---- HiT-ADV end-to-end (gaussian_blend) at B=1 and B=4 ----
    from hitadv_tpu.attacks import base
    from hitadv_tpu.attacks.hit_adv import HiTADVConfig, make_hit_adv
    from hitadv_tpu.models import pointnet
    pnp = pointnet.init(jax.random.PRNGKey(2), num_classes=40)
    logits_fn = lambda x: pointnet.apply(pnp, x)                # noqa: E731
    atk = make_hit_adv(logits_fn, base.make_adv_fn("logits", 30.0, False),
                       HiTADVConfig(binary_step=2, num_iter=10))
    for b in (1, 4):
        xyz = rng.normal(size=(b, 1024, 3))
        xyz /= np.max(np.linalg.norm(xyz, axis=-1, keepdims=True),
                      axis=1, keepdims=True)
        nrm = rng.normal(size=(b, 1024, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9
        x6 = jnp.asarray(np.concatenate([xyz, nrm], -1), jnp.float32)
        y = jnp.argmax(logits_fn(x6[..., :3]), -1)
        out = jax.jit(atk)(x6, y, jax.random.PRNGKey(3))
        adv = np.asarray(out.adv_points)
        moved = float(np.max(np.abs(adv - xyz)))
        check(f"hit_adv B={b}", bool(np.isfinite(adv).all())
              and adv.shape == xyz.shape and moved > 1e-5,
              f"max|adv-x|={moved:.4f}")

    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    write_artifact()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
