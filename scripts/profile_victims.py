"""Per-op device-time breakdown of one attack iteration per victim.

Captures an XLA profiler trace of a short HiT-ADV run against the given
victims, converts the .xplane.pb via xprof's op_profile tool, and
prints the top ops by self device time — ground truth for where the
per-iteration milliseconds actually go (RESULTS.md's earlier component
attributions were estimates).

Usage: python scripts/profile_victims.py [victim ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np


def _top_ops(trace_dir: str, top: int = None, n_iters: int = None):
    top = top or int(os.environ.get("PROF_TOP", "18"))
    from xprof.convert import raw_to_tool_data as r2t

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("  no xplane found under", trace_dir)
        return
    data, _ = r2t.xspace_to_tool_data([sorted(xplanes)[-1]],
                                      "hlo_stats", {})
    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in tab["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in tab["rows"]]

    def g(r, k):
        return r[cols.index(k)]

    import re

    rows.sort(key=lambda r: -(g(r, "total_self_time") or 0))
    total = sum(g(r, "total_self_time") or 0 for r in rows)
    print(f"  total device self time {total / 1e3:.1f} ms")
    strip = lambda s: re.sub(r"<[^>]+>", "", str(s))  # noqa: E731
    for r in rows[:top]:
        t = g(r, "total_self_time") or 0
        src = strip(g(r, "source_info")).replace("/root/repo/", "")
        print(f"  {t:9.0f}us {str(g(r, 'category'))[:22]:22s} "
              f"x{g(r, 'occurrences'):5} "
              f"{str(g(r, 'bound_by'))[:10]:10s} "
              f"{str(g(r, 'hlo_op_name'))[:34]:34s} {src[:44]}")

    # aggregate self time by source line — per-iteration ops (the
    # scanned attack body) and one-time prep reported separately
    from collections import defaultdict
    per_iter, prep = defaultdict(float), defaultdict(float)
    # classification threshold: the ATTACK's true scan length when the
    # caller knows it (an op invoked twice per body dedups to
    # occurrences = 2*n_iters — still per-iter; with max(occs) it would
    # instead reclassify every once-per-iter op as "prep" and halve the
    # reported ms/iter). Fallback: the max occurrence count.
    if n_iters:
        iters = n_iters
    else:
        occs = [g(r, "occurrences") or 0 for r in rows]
        iters = max(occs) if occs else 1
    for r in rows:
        src = strip(g(r, "source_info")).replace("/root/repo/", "")
        tgt = per_iter if (g(r, "occurrences") or 0) >= iters else prep
        tgt[src] += g(r, "total_self_time") or 0
    ptot = sum(per_iter.values())
    print(f"  -- by source line (x{iters:.0f} per-iter ops, "
          f"{ptot / 1e3 / iters:.2f} ms/iter) --")
    for s, t in sorted(per_iter.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t / iters:8.1f}us/it {100 * t / ptot:5.1f}%  {s}")
    stot = sum(prep.values())
    print(f"  -- one-time prep total {stot / 1e3:.1f} ms --")
    for s, t in sorted(prep.items(), key=lambda kv: -kv[1])[:6]:
        print(f"  {t:9.0f}us {s}")

    if "tf_op_name" in cols:
        # aggregate self time by the deepest annotated named_scope in
        # the op path — stage totals for the jax.named_scope tags the
        # models/attacks carry (ha_/sag_/sa*/pc_/pct_/dg_)
        tag = re.compile(r"^(ha|sag|sa\d*|sa_all|pc|pct|dg)_\w+$")
        by_scope = {}
        for r in rows:
            name = str(g(r, "tf_op_name") or "")
            segs = [s for s in name.split("/") if tag.match(s)]
            seg = "/".join(segs[-2:]) if segs else "(unscoped)"
            by_scope[seg] = by_scope.get(seg, 0) + (
                g(r, "total_self_time") or 0)
        print("  -- by named scope --")
        for seg, t in sorted(by_scope.items(), key=lambda kv: -kv[1]):
            if t < 0.005 * total:
                continue
            print(f"  {t:9.0f}us {100 * t / total:5.1f}%  {seg}")


def main():
    import jax
    import jax.numpy as jnp

    from hitadv_tpu import models
    from hitadv_tpu.attacks import base, hit_adv
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.nn import functional as nnF

    victims = sys.argv[1:] or ["dgcnn", "pointconv"]
    nnF.set_compute_dtype(jnp.bfloat16)
    B = int(os.environ.get("PROF_B", "16"))
    N = int(os.environ.get("PROF_N", "1024"))
    cfg = hit_adv.HiTADVConfig(binary_step=1, num_iter=25)
    adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
    pts, labels = synthetic_clouds(B, num_points=N, seed=0)
    pts, labels = jnp.asarray(pts), jnp.asarray(labels)

    for name in victims:
        init, apply = models.get_model(name)
        params = init(jax.random.PRNGKey(0))
        attack = hit_adv.make_hit_adv(
            lambda x: apply(params, x), adv_fn, cfg)  # noqa: B023
        res = attack(pts, labels, jax.random.PRNGKey(0))   # compile
        np.asarray(res.adv_points)
        out = f"/tmp/prof_{name}"
        with jax.profiler.trace(out):
            res = attack(pts, labels, jax.random.PRNGKey(1))
            np.asarray(res.adv_points)
        print(f"== {name} (25-iter HiT-ADV, B={B}, bf16) ==", flush=True)
        _top_ops(out, n_iters=cfg.binary_step * cfg.num_iter)


if __name__ == "__main__":
    main()
