"""Point/cluster/object adding attacks (CVPR'19 CW-Add family).

Parity surface:
  * `CW/Add.py:14-220` (CWAdd): optimize ``num_add=512`` free points
    seeded at gradient-top-k "critical points"; Chamfer-to-original
    distance; binary search; concat at return.
  * `CW/Add_Cluster.py:48-278` (CWAddClusters): 3 clusters x 32 points
    seeded by DBSCAN(eps=.2, min=3) over 128 critical points;
    FarChamferDist compactness+proximity.
  * `CW/Add_Objects.py:50-367` (CWAddObjects): attach 3 rigid
    mini-objects (64 pts, normalized+scaled); optimize object shape +
    per-object shift + y-axis rotation; angles wrapped mod 2pi;
    L2ChamferDist.

All are *targeted* (bookkeeping ``pred == target``). TPU design: the
optimization (binary search x Adam, bookkeeping) is one XLA program per
attack; only the DBSCAN seeding runs host-side at init (SURVEY.md §7
"hard parts") — it is data-dependent clustering executed once per batch,
implemented here in pure NumPy (the reference uses sklearn's C DBSCAN).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from hitadv_tpu.attacks.base import (
    AttackResult,
    BestState,
    adam_init,
    adam_update,
    binary_search_update,
    update_best,
)
from hitadv_tpu.losses import (
    chamfer_dist,
    cross_entropy_loss,
    far_chamfer_dist,
    l2_chamfer_dist,
)


# ---------------------------------------------------------------------------
# Critical points (shared seeding)
# ---------------------------------------------------------------------------

def get_critical_points(logits_fn: Callable, pc: jnp.ndarray,
                        labels: jnp.ndarray, num: int) -> jnp.ndarray:
    """Top-``num`` points by squared CE-gradient magnitude.

    Parity: `CW/Add.py:14-42`. pc: ``[B, N, 3]`` -> ``[B, num, 3]``.
    """
    grad = jax.grad(
        lambda x: jnp.mean(cross_entropy_loss(logits_fn(x), labels)))(pc)
    score = jnp.sum(grad ** 2, axis=-1)                       # [B, N]
    _, idx = lax.top_k(score, num)
    return jnp.take_along_axis(pc, idx[..., None], axis=1)


# ---------------------------------------------------------------------------
# NumPy DBSCAN (host-side init helper)
# ---------------------------------------------------------------------------

def dbscan_np(points: np.ndarray, eps: float,
              min_samples: int) -> np.ndarray:
    """Minimal DBSCAN. points ``[N, 3]`` -> labels ``[N]`` (-1 noise).

    Semantics match sklearn's: a core point has >= min_samples points
    (including itself) within eps; clusters grow by BFS from cores.
    """
    n = len(points)
    d2 = np.sum((points[:, None] - points[None]) ** 2, axis=-1)
    neigh = d2 <= eps * eps
    core = neigh.sum(1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS expand
        stack = [i]
        labels[i] = cluster
        while stack:
            j = stack.pop()
            if not core[j]:
                continue
            for k in np.where(neigh[j])[0]:
                if labels[k] == -1:
                    labels[k] = cluster
                    stack.append(k)
        cluster += 1
    return labels


def _cluster_seeds(cri_points: np.ndarray, num_add: int, cl_num_p: int,
                   rng: np.random.RandomState,
                   as_centers: bool = False) -> np.ndarray:
    """DBSCAN seeding over critical points.

    Parity: `CW/Add_Cluster.py:83-130` / `CW/Add_Objects.py:100-146`
    (eps=0.2, min=3; top-num_add clusters by size; random kNN fallback).
    Returns ``[B, num_add, cl_num_p, 3]`` cluster seeds, or
    ``[B, num_add, 3]`` centers when ``as_centers``.
    """
    B = cri_points.shape[0]
    out = []
    for i in range(B):
        points = cri_points[i]                                # [num_cri, 3]
        result = dbscan_np(points, eps=0.2, min_samples=3)
        keep = result > -0.5
        res, pts = result[keep], points[keep]
        if len(pts) == 0:
            res, pts = np.zeros(len(points), np.int64), points
        labels, counts = np.unique(res, return_counts=True)
        sel = labels[np.argsort(counts)[-num_add:]]
        items = []
        for lab in sel:
            cp = pts[res == lab]
            if as_centers:
                center = cp.mean(0)
                items.append(cp[np.argmin(
                    np.sum((cp - center) ** 2, 1))])
            else:
                replace = not (len(cp) > cl_num_p)
                idx = rng.choice(len(cp), cl_num_p, replace=replace)
                items.append(cp[idx])
        while len(items) < num_add:                           # fallback
            rand_point = pts[rng.choice(len(pts), 1)[0]]
            if as_centers:
                items.append(rand_point)
            else:
                d = np.sum((pts - rand_point[None]) ** 2, axis=1)
                nn = np.argsort(d)[:cl_num_p]
                # pad by repetition when fewer than cl_num_p survive
                nn = np.resize(nn, cl_num_p)
                items.append(pts[nn])
        out.append(np.stack(items))
    return np.stack(out)


@dataclass(frozen=True)
class AddConfig:
    """Defaults of `CW/Add.py:49-51`."""
    attack_lr: float = 1e-2
    init_weight: float = 5e3
    max_weight: float = 4e4
    binary_step: int = 10
    num_iter: int = 500
    num_add: int = 512


def make_cw_add(logits_fn: Callable, adv_fn: Callable,
                dist_fn: Optional[Callable] = None,
                cfg: AddConfig = AddConfig(),
                *, init_overrides=None):
    """CWAdd: free added points from critical-point seeds.

    init_overrides: optional ``{"noise": [S, B, num_add, 3]}`` pinning
    the per-binary-step 1e-7 init noise (`CW/Add.py:108-109`) for
    trajectory parity — the added points start ON original points, so
    the chamfer gradient direction at iteration 0 is the noise
    direction.
    """
    if dist_fn is None:
        dist_fn = chamfer_dist                               # added→ori
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v)
                          for k, v in init_overrides.items()}

    @jax.jit
    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        B = ori.shape[0]
        cri = get_critical_points(logits_fn, ori, labels, cfg.num_add)

        def inner_iter(carry, _):
            adv, opt, weight, best, o_best = carry

            def loss_fn(adv):
                cat = jnp.concatenate([ori, adv], axis=1)
                logits = logits_fn(cat)
                al = jnp.mean(adv_fn(logits, labels))
                dl = jnp.mean(dist_fn(adv, ori) * weight)
                return al + dl, logits

            (_, logits), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(adv)
            pred = jnp.argmax(logits, axis=-1)
            dist_val = dist_fn(adv, ori)
            ok = pred == labels
            best = update_best(best, ok, dist_val, pred, adv)
            o_best = update_best(o_best, ok, dist_val, pred, adv)
            adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
            return (adv, opt, weight, best, o_best), ()

        def binary_step(carry, step_in):
            step_key, step_idx = step_in
            lower, upper, weight, o_best, _ = carry
            if init_overrides is not None:
                adv0 = cri + init_overrides["noise"][step_idx]
            else:
                adv0 = cri + jax.random.normal(step_key,
                                               cri.shape) * 1e-7
            inner0 = (adv0, adam_init(adv0), weight,
                      BestState.init(adv0), o_best)
            (adv, _, _, best, o_best), _ = lax.scan(
                inner_iter, inner0, None, length=cfg.num_iter)
            found = (best.score == labels) & (best.score != -1) \
                & (best.dist <= o_best.dist)
            lower, upper, weight = binary_search_update(found, lower,
                                                        upper, weight)
            return (lower, upper, weight, o_best, adv), ()

        step_keys = jax.random.split(key, cfg.binary_step)
        zeros_add = jnp.zeros((B, cfg.num_add, 3))
        init = (jnp.zeros((B,)), jnp.full((B,), cfg.max_weight),
                jnp.full((B,), cfg.init_weight),
                BestState.init(zeros_add), zeros_add)
        (lower, _, _, o_best, last_adv), _ = lax.scan(
            binary_step, init,
            (step_keys, jnp.arange(cfg.binary_step)))

        success = lower > 0.0
        added = jnp.where(success[:, None, None], o_best.adv, last_adv)
        adv_final = jnp.concatenate([ori, added], axis=1)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    return attack


@dataclass(frozen=True)
class AddClusterConfig:
    """Defaults of `CW/Add_Cluster.py:52-54`."""
    attack_lr: float = 1e-2
    init_weight: float = 5.0
    max_weight: float = 30.0
    binary_step: int = 5
    num_iter: int = 500
    num_add: int = 3
    cl_num_p: int = 32
    num_cri: int = 128


def make_cw_add_clusters(logits_fn: Callable, adv_fn: Callable,
                         cfg: AddClusterConfig = AddClusterConfig(),
                         seed: int = 0, *, init_overrides=None):
    """CWAddClusters: DBSCAN-seeded compact clusters.

    The DBSCAN seeding is host-side (once per batch); the optimization
    is one jitted program taking the seeds as input.

    init_overrides: optional ``{"clusters": [B, num_add*cl_num_p, 3],
    "noise": [S, B, num_add*cl_num_p, 3]}`` pinning the seeding and the
    per-step 1e-7 init noise (`CW/Add_Cluster.py:167-169`) for
    trajectory-parity testing.
    """
    A = cfg.num_add * cfg.cl_num_p
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v)
                          for k, v in init_overrides.items()}

    def dist_book(added, ori):
        return far_chamfer_dist(added, ori, cfg.num_add)

    @jax.jit
    def optimize(ori, labels, clusters0, key) -> AttackResult:
        B = ori.shape[0]

        def inner_iter(carry, _):
            (adv, opt, weight, bestdist, bestscore, o_bestdist,
             o_bestscore, o_bestadd) = carry

            def loss_fn(adv):
                cat = jnp.concatenate([ori, adv], axis=1)
                logits = logits_fn(cat)
                al = jnp.mean(adv_fn(logits, labels))
                dl = jnp.mean(dist_book(adv, ori) * weight)
                return al + dl, logits

            (_, logits), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(adv)
            pred = jnp.argmax(logits, axis=-1)
            dist_val = dist_book(adv, ori)
            ok = pred == labels
            better = ok & (dist_val < bestdist)
            bestdist = jnp.where(better, dist_val, bestdist)
            bestscore = jnp.where(better, pred, bestscore)
            o_better = ok & (dist_val < o_bestdist)
            o_bestdist = jnp.where(o_better, dist_val, o_bestdist)
            o_bestscore = jnp.where(o_better, pred, o_bestscore)
            o_bestadd = jnp.where(o_better[:, None, None], adv, o_bestadd)
            adv, opt = adam_update(grad, opt, adv, cfg.attack_lr)
            return (adv, opt, weight, bestdist, bestscore, o_bestdist,
                    o_bestscore, o_bestadd), ()

        def binary_step(carry, step_in):
            step_key, step_idx = step_in
            (lower, upper, weight, o_bestdist, o_bestscore, o_bestadd,
             _) = carry
            if init_overrides is not None:
                adv0 = clusters0 + init_overrides["noise"][step_idx]
            else:
                adv0 = clusters0 + jax.random.normal(
                    step_key, clusters0.shape) * 1e-7
            inner0 = (adv0, adam_init(adv0), weight,
                      jnp.full((B,), 1e10), jnp.full((B,), -1, jnp.int32),
                      o_bestdist, o_bestscore, o_bestadd)
            (adv, _, _, bestdist, bestscore, o_bestdist, o_bestscore,
             o_bestadd), _ = lax.scan(inner_iter, inner0, None,
                                      length=cfg.num_iter)
            found = (bestscore == labels) & (bestscore != -1) \
                & (bestdist <= o_bestdist)
            lower = jnp.where(found, jnp.maximum(lower, weight), lower)
            upper = jnp.where(found, upper, jnp.minimum(upper, weight))
            weight = (lower + upper) / 2.0
            return (lower, upper, weight, o_bestdist, o_bestscore,
                    o_bestadd, adv), ()

        step_keys = jax.random.split(key, cfg.binary_step)
        zeros_add = jnp.zeros((ori.shape[0], A, 3))
        init = (jnp.zeros((B,)), jnp.full((B,), cfg.max_weight),
                jnp.full((B,), cfg.init_weight),
                jnp.full((B,), 1e10), jnp.full((B,), -1, jnp.int32),
                zeros_add, zeros_add)
        (lower, _, _, _, _, o_bestadd, last_adv), _ = lax.scan(
            binary_step, init,
            (step_keys, jnp.arange(cfg.binary_step)))
        success = lower > 0.0
        added = jnp.where(success[:, None, None], o_bestadd, last_adv)
        adv_final = jnp.concatenate([ori, added], axis=1)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        if init_overrides is not None and "clusters" in init_overrides:
            clusters0 = init_overrides["clusters"]
        else:
            cri = get_critical_points(logits_fn, ori, labels,
                                      cfg.num_cri)
            seeds = _cluster_seeds(np.asarray(cri), cfg.num_add,
                                   cfg.cl_num_p,
                                   np.random.RandomState(seed))
            clusters0 = jnp.asarray(
                seeds.reshape(ori.shape[0], A, 3), jnp.float32)
        return optimize(ori, labels, clusters0, key)

    return attack


@dataclass(frozen=True)
class AddObjectConfig:
    """Defaults of `CW/Add_Objects.py:54-56`."""
    attack_lr: float = 1e-2
    init_weight: float = 5.0
    max_weight: float = 40.0
    binary_step: int = 5
    num_iter: int = 500
    num_add: int = 3
    obj_num_p: int = 64
    scaling: float = 0.3
    num_cri: int = 128


def default_object_pc(num_points: int = 256, seed: int = 0) -> np.ndarray:
    """A unit-sphere-surface object used when no object file is given
    (the reference loads an external object cloud)."""
    rng = np.random.RandomState(seed)
    v = rng.randn(num_points, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def make_cw_add_objects(logits_fn: Callable, adv_fn: Callable,
                        object_pc: Optional[np.ndarray] = None,
                        cfg: AddObjectConfig = AddObjectConfig(),
                        seed: int = 0, *, init_overrides=None):
    """CWAddObjects: rigid mini-objects with learned shape/shift/rotation.

    init_overrides: optional dict pinning every random draw for
    trajectory-parity testing against `CW/Add_Objects.py:227-241`:
      * ``"objects"`` ``[num_add, obj_num_p, 3]`` — the processed object
        subsets (replaces the shuffle at :89-92);
      * ``"centers"`` ``[B, num_add, 3]`` — the DBSCAN shift seeds;
      * ``"noise_obj"`` ``[S, B, num_add, obj_num_p, 3]`` /
        ``"noise_shift"`` ``[S, B, num_add, 3]`` — per-step 1e-7 init
        noise (:229-235);
      * ``"angles"`` ``[S, B, num_add, 3]`` — per-step uniform·π init
        (:239-240).
    """
    rng = np.random.RandomState(seed)
    if object_pc is None:
        object_pc = default_object_pc(seed=seed)
    # normalize + scale (`CW/Add_Objects.py:94-98`), then sample num_add
    # shuffled subsets of obj_num_p points
    pc = object_pc - object_pc.mean(0, keepdims=True)
    pc = pc / (np.linalg.norm(pc, axis=1).max() + 1e-9) * cfg.scaling
    objects = np.zeros((cfg.num_add, cfg.obj_num_p, 3), np.float32)
    for i in range(cfg.num_add):
        perm = rng.permutation(len(pc))
        objects[i] = pc[perm[:cfg.obj_num_p]]
    if init_overrides is not None:
        init_overrides = {k: jnp.asarray(v, jnp.float32)
                          for k, v in init_overrides.items()}
        if "objects" in init_overrides:
            objects = np.asarray(init_overrides["objects"], np.float32)
    objects_j = jnp.asarray(objects)

    def rotate_shift(objs, angles, shifts):
        """y-axis rotation + translation. Parity: `CW/Add_Objects.py:148-185`."""
        ang = angles[..., 0]                                  # [B, na]
        c, s = jnp.cos(ang), jnp.sin(ang)
        z, o = jnp.zeros_like(c), jnp.ones_like(c)
        rot = jnp.stack([c, z, s, z, o, z, -s, z, c],
                        axis=-1).reshape(*ang.shape, 3, 3)
        rotated = jnp.einsum("bapc,bacd->bapd", objs, rot,
                             preferred_element_type=jnp.float32)
        return rotated + shifts[:, :, None, :]

    @jax.jit
    def optimize(ori, labels, centers0, key) -> AttackResult:
        B = ori.shape[0]
        clean_objs = jnp.broadcast_to(
            objects_j[None], (B, cfg.num_add, cfg.obj_num_p, 3))
        A = cfg.num_add * cfg.obj_num_p

        def dist(added, objs):
            return l2_chamfer_dist(added, ori, objs, clean_objs)

        def inner_iter(carry, _):
            (objs, shifts, angles, opts, weight, best, o_best, _) = carry

            def loss_fn(objs, shifts, angles):
                placed = rotate_shift(objs, angles, shifts)
                added = placed.reshape(B, A, 3)
                cat = jnp.concatenate([ori, added], axis=1)
                logits = logits_fn(cat)
                al = jnp.mean(adv_fn(logits, labels))
                dl = jnp.mean(dist(added, objs) * weight)
                return al + dl, (logits, added)

            (_, (logits, added)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True)(
                    objs, shifts, angles)
            pred = jnp.argmax(logits, axis=-1)
            dist_val = dist(added, objs)
            ok = pred == labels
            best = update_best(best, ok, dist_val, pred, added)
            o_best = update_best(o_best, ok, dist_val, pred, added)

            op1, op2, op3 = opts
            objs, op1 = adam_update(grads[0], op1, objs, cfg.attack_lr)
            shifts, op2 = adam_update(grads[1], op2, shifts,
                                      cfg.attack_lr)
            angles, op3 = adam_update(grads[2], op3, angles,
                                      cfg.attack_lr)
            angles = jnp.mod(angles, 2.0 * jnp.pi)            # wrap (:337)
            # carry the PRE-step placement as the fallback candidate:
            # the reference's `input_val` is a fresh transpose().
            # contiguous() tensor here (`CW/Add_Objects.py:294`), so —
            # unlike Perturb/Add, where .numpy() ALIASES the optimized
            # tensor and opt.step() silently turns the fallback into the
            # post-step state — Add_Objects' failure fallback (:359) is
            # genuinely the last iteration's pre-step placed points.
            return (objs, shifts, angles, (op1, op2, op3), weight,
                    best, o_best, added), ()

        def binary_step(carry, step_in):
            step_key, step_idx = step_in
            lower, upper, weight, o_best, _ = carry
            k1, k2, k3 = jax.random.split(step_key, 3)
            if init_overrides is not None:
                objs0 = clean_objs + init_overrides["noise_obj"][step_idx]
                shifts0 = centers0 + \
                    init_overrides["noise_shift"][step_idx]
                angles0 = init_overrides["angles"][step_idx]
            else:
                objs0 = clean_objs + jax.random.normal(
                    k1, clean_objs.shape) * 1e-7
                shifts0 = centers0 + jax.random.normal(
                    k2, centers0.shape) * 1e-7
                angles0 = jax.random.uniform(
                    k3, (B, cfg.num_add, 3)) * jnp.pi
            zeros_add = jnp.zeros((B, A, 3))
            inner0 = (objs0, shifts0, angles0,
                      (adam_init(objs0), adam_init(shifts0),
                       adam_init(angles0)),
                      weight, BestState.init(zeros_add), o_best,
                      zeros_add)
            (objs, shifts, angles, _, _, best, o_best,
             last), _ = lax.scan(inner_iter, inner0, None,
                                 length=cfg.num_iter)
            found = (best.score == labels) & (best.score != -1) \
                & (best.dist <= o_best.dist)
            lower, upper, weight = binary_search_update(found, lower,
                                                        upper, weight)
            return (lower, upper, weight, o_best, last), ()

        step_keys = jax.random.split(key, cfg.binary_step)
        zeros_add = jnp.zeros((B, A, 3))
        init = (jnp.zeros((B,)), jnp.full((B,), cfg.max_weight),
                jnp.full((B,), cfg.init_weight),
                BestState.init(zeros_add), zeros_add)
        (lower, _, _, o_best, last_adv), _ = lax.scan(
            binary_step, init,
            (step_keys, jnp.arange(cfg.binary_step)))
        success = lower > 0.0
        added = jnp.where(success[:, None, None], o_best.adv, last_adv)
        adv_final = jnp.concatenate([ori, added], axis=1)
        pred = jnp.argmax(logits_fn(adv_final), axis=-1)
        return AttackResult(adv_points=adv_final, success=success,
                            pred=pred)

    def attack(points, labels, key) -> AttackResult:
        ori = points[..., :3]
        if init_overrides is not None and "centers" in init_overrides:
            centers0 = init_overrides["centers"]
        else:
            cri = get_critical_points(logits_fn, ori, labels,
                                      cfg.num_cri)
            centers = _cluster_seeds(np.asarray(cri), cfg.num_add, 1,
                                     rng, as_centers=True)
            centers0 = jnp.asarray(centers.reshape(ori.shape[0],
                                                   cfg.num_add, 3),
                                   jnp.float32)
        return optimize(ori, labels, centers0, key)

    return attack
