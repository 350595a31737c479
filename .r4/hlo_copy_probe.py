"""Dump the compiled HLO of the PointConv HiT-ADV attack and list the
per-iteration copy ops with shapes — chasing the 12%/iter of HBM
'data formatting' the r4 profile attributes to the inner scan carry
(hit_adv.py:308)."""
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from hitadv_tpu.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hitadv_tpu import models
from hitadv_tpu.attacks import base, hit_adv
from hitadv_tpu.data import synthetic_clouds
from hitadv_tpu.nn import functional as nnF

victim = os.environ.get("PROBE_VICTIM", "pointconv")
nnF.set_compute_dtype(jnp.bfloat16)
cfg = hit_adv.HiTADVConfig(binary_step=1, num_iter=25)
adv_fn = base.make_adv_fn("logits", kappa=30.0, targeted=False)
pts, labels = synthetic_clouds(16, num_points=1024, seed=0)
pts, labels = jnp.asarray(pts), jnp.asarray(labels)

init, apply = models.get_model(victim)
params = init(jax.random.PRNGKey(0))
attack = hit_adv.make_hit_adv(lambda x: apply(params, x), adv_fn, cfg)

lowered = jax.jit(attack).lower(pts, labels, jax.random.PRNGKey(0))
compiled = lowered.compile()
txt = compiled.as_text()
path = f"/tmp/hlo_{victim}.txt"
with open(path, "w") as f:
    f.write(txt)
print("HLO chars:", len(txt), "->", path, flush=True)

# copies inside the scan body (while-loop) with shapes
pat = re.compile(r"^\s*(\S+)\s*=\s*(\S+?)\s+copy\((\S+)\)", re.M)
sizes = {}
for m in pat.finditer(txt):
    out, shp, src = m.groups()
    sizes[shp] = sizes.get(shp, 0) + 1
for shp, n in sorted(sizes.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {n:4d}x copy {shp}")

# fusions whose metadata cites hit_adv.py:308
for ln in txt.splitlines():
    if "hit_adv.py" in ln and ("copy" in ln or "kLoop" in ln):
        print(ln.strip()[:240])
