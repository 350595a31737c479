"""Isolate the PCT pallas-vs-xla grad divergence on hardware.

Stages: (1) FPS indices per backend; (2) kNN indices with PINNED fps
idx; (3) full grad with BOTH index sets pinned to the XLA backend's.
"""
import sys, os
sys.path.insert(0, "/root/repo")
from hitadv_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
from hitadv_tpu.ops import geometry as G, set_backend
from hitadv_tpu.models import pct

rng = np.random.default_rng(0)
pctp = pct.init(jax.random.PRNGKey(3), num_classes=40)
x3 = jnp.asarray(rng.uniform(size=(2, 700, 3)), jnp.float32)

# ---- stage 1: FPS idx divergence ----
fps = {}
for be in ("pallas", "xla"):
    set_backend(be)
    fps[be] = np.asarray(jax.jit(
        lambda x: G.farthest_point_sample(x, 512))(x3))
set_backend("auto")
neq = fps["pallas"] != fps["xla"]
print("fps0 idx mismatches:", int(neq.sum()), "/", neq.size,
      "first divergence per batch:",
      [int(np.argmax(r)) if r.any() else -1 for r in neq], flush=True)

# ---- stage 2: kNN idx with PINNED fps idx ----
fidx = jnp.asarray(fps["xla"])
knn = {}
for be in ("pallas", "xla"):
    set_backend(be)
    knn[be] = np.asarray(jax.jit(
        lambda x, fi: G.knn_point(32, x, G.index_points(x, fi)))(x3, fidx))
set_backend("auto")
neq = knn["pallas"] != knn["xla"]
print("knn0 idx mismatches (pinned fps):", int(neq.sum()), "/", neq.size,
      flush=True)

# ---- stage 3: grad with ALL indices pinned to the XLA backend's ----
import hitadv_tpu.ops.geometry as GG
orig_fps, orig_knn = GG.farthest_point_sample, GG.knn_point
pinned = {}
set_backend("xla")
k0 = np.asarray(jax.jit(lambda x, fi: GG.knn_point(
    32, x, GG.index_points(x, fi)))(x3, fidx))
x1 = jax.jit(lambda x, fi: GG.index_points(x, fi))(x3, fidx)
f1 = np.asarray(jax.jit(lambda x: GG.farthest_point_sample(x, 256))(x1))
k1 = np.asarray(jax.jit(lambda x, fi: GG.knn_point(
    32, x, GG.index_points(x, fi)))(x1, jnp.asarray(f1)))
set_backend("auto")
pin_fps = [jnp.asarray(fps["xla"]), jnp.asarray(f1)]
pin_knn = [jnp.asarray(k0), jnp.asarray(k1)]
calls = {"fps": 0, "knn": 0}

def fps_pin(xyz, npoint, key=None):
    i = calls["fps"]; calls["fps"] += 1
    return pin_fps[i % 2]

def knn_pin(ns, xyz, new_xyz):
    i = calls["knn"]; calls["knn"] += 1
    return pin_knn[i % 2]

GG.farthest_point_sample = fps_pin
GG.knn_point = knn_pin
try:
    def pct_loss(x):
        return jnp.sum(pct.apply(pctp, x) ** 2)
    res = {}
    for be in ("pallas", "xla"):
        set_backend(be)
        calls["fps"] = calls["knn"] = 0
        v, g = jax.jit(jax.value_and_grad(pct_loss))(x3)
        res[be] = (float(v), np.asarray(g))
    set_backend("auto")
finally:
    GG.farthest_point_sample = orig_fps
    GG.knn_point = orig_knn
rel = abs(res["pallas"][0] - res["xla"][0]) / (abs(res["xla"][0]) + 1e-9)
gd = (np.linalg.norm(res["pallas"][1] - res["xla"][1])
      / (np.linalg.norm(res["xla"][1]) + 1e-9))
print(f"pinned-idx grad: rel={rel:.2e} gradL2={gd:.2e}", flush=True)
