"""Attack-evaluation driver: ``python -m hitadv_tpu.eval``.

Parity surface: `eval.py:21-135` — build victim + dataset + attacker,
run eval_ASR. Differences by design: one typed config (config.py), a
name-indexed attack registry covering all ~20 engines (the reference
hard-wires HiT-ADV), a `--dataset synthetic` mode for data-free smoke
runs, and mesh sharding via `--n_devices`.
"""

from __future__ import annotations

import argparse
import functools
from typing import Callable, Optional



from hitadv_tpu.config import EvalConfig, add_config_flags, config_from_args


def build_model(cfg: EvalConfig):
    """Victim construction + checkpoint load (`eval.py:105-124`)."""
    import jax
    from hitadv_tpu import models
    from hitadv_tpu.utils import checkpoint as ckpt

    init, apply = models.get_model(cfg.model)
    if cfg.checkpoint:
        if cfg.checkpoint.endswith((".pkl", ".pickle")):
            params = ckpt.load_params(cfg.checkpoint)
        else:
            mod = {
                "pointnet": models.pointnet,
                "pointnet++": models.pointnet2,
                "dgcnn": models.dgcnn,
                "pct": models.pct,
                "pointconv": models.pointconv,
            }[cfg.model]
            sd = ckpt.load_torch_state_dict(cfg.checkpoint)
            params = ckpt.convert_state_dict(sd, mod.TORCH_SPEC)
    else:
        params = init(jax.random.PRNGKey(cfg.seed))

    if cfg.model == "dgcnn":
        from hitadv_tpu.models import dgcnn
        apply = dgcnn.make_apply(dgcnn.DGCNNConfig(k=cfg.k,
                                                   emb_dims=cfg.emb_dims))
    return params, (lambda x: apply(params, x))


def build_attack(cfg: EvalConfig, logits_fn: Callable,
                 ae_fn: Optional[Callable] = None,
                 params=None) -> Callable:
    """Name-indexed attack registry (SURVEY.md §2.5 table).

    Returns ``attack(points [B, N, C], labels, key) -> AttackResult``
    operating on xyz (normals consumed where the attack needs them).
    """
    from hitadv_tpu import attacks, losses
    from hitadv_tpu.attacks import base

    name = cfg.attack_type.lower().replace("_", "-")
    untargeted_margin = base.make_adv_fn("logits", cfg.kappa,
                                         targeted=False)
    targeted_margin = base.make_adv_fn("logits", cfg.kappa, targeted=True)
    ce = base.make_adv_fn(cfg.adv_func, cfg.kappa, targeted=False)

    fgm_cfg = attacks.fgm.FGMConfig(
        budget=cfg.budget, num_iter=cfg.num_iter,
        step_size=cfg.step_size, mu=cfg.mu)
    cw_cfg = attacks.CWConfig(
        attack_lr=cfg.attack_lr, init_weight=cfg.init_weight,
        max_weight=cfg.max_weight, binary_step=cfg.binary_step,
        num_iter=cfg.num_iter)

    def xyz_only(attack):
        return lambda pts, labels, key: attack(pts[..., :3], labels, key)

    if name == "hit-adv":
        hit_cfg = attacks.HiTADVConfig(
            attack_lr=cfg.attack_lr, binary_step=cfg.binary_step,
            num_iter=cfg.num_iter, cd_weight=cfg.cd_weight,
            ker_weight=cfg.ker_weight, hide_weight=cfg.hide_weight,
            curv_loss_knn=cfg.curv_loss_knn, central_num=cfg.central_num,
            total_central_num=cfg.total_central_num,
            max_sigm=cfg.max_sigm, min_sigm=cfg.min_sigm,
            budget=cfg.budget)
        return attacks.make_hit_adv(logits_fn, untargeted_margin, hit_cfg)

    if name == "fgsm":
        return xyz_only(attacks.make_fgsm(logits_fn, ce, fgm_cfg))
    if name == "ifgsm":
        return xyz_only(attacks.make_ifgsm(logits_fn, ce, fgm_cfg))
    if name == "mifgsm":
        return xyz_only(attacks.make_mifgsm(logits_fn, ce, fgm_cfg))
    if name == "pgd":
        return xyz_only(attacks.make_pgd(logits_fn, ce, fgm_cfg))
    if name == "fgsm-rs":
        return xyz_only(attacks.make_fgsm_rs(logits_fn, ce, fgm_cfg))
    if name == "fgm-l2":
        return xyz_only(attacks.make_fgm_l2(logits_fn, ce, fgm_cfg))
    if name == "ifgm-l2":
        return xyz_only(attacks.make_ifgm_l2(logits_fn, ce, fgm_cfg))

    def _cw_dist_fn():
        """CW-Perturb distance: reference L2 by default; `--dist_func
        chamfer` switches to the set distance, and `--sp_devices D`
        shards the points axis over a D-device mesh so the [B, N, N]
        term never materializes (ring-chamfer, `parallel/ring.py`) —
        the large-N scaling configuration (SURVEY.md §5)."""
        if cfg.dist_func in (None, "l2"):
            return None
        if cfg.dist_func != "chamfer":
            raise ValueError(f"dist_func {cfg.dist_func!r}")
        if cfg.sp_devices and cfg.sp_devices > 1:
            if cfg.n_devices and cfg.n_devices > 1:
                raise ValueError(
                    "--sp_devices (points sharded over a ring mesh) and"
                    " --n_devices (batch-sharded attack) are mutually"
                    " exclusive: the ring's shard_map closes over its"
                    " own mesh and cannot nest inside the dp-sharded"
                    " program — pick one axis to shard")
            from hitadv_tpu.parallel import make_mesh, ring_chamfer

            sp_mesh = make_mesh(cfg.sp_devices, axis_name="sp")
            return lambda adv, ori: ring_chamfer(adv, ori, sp_mesh)
        return losses.chamfer_dist

    if name in ("cw-perturb", "cw-perturbt"):
        tc = attacks.CWConfig(**{**cw_cfg.__dict__, "targeted": True})
        return xyz_only(attacks.make_cw_perturb(
            logits_fn, targeted_margin, dist_fn=_cw_dist_fn(), cfg=tc))
    if name == "cw-uperturb":
        uc = attacks.CWConfig(**{**cw_cfg.__dict__, "targeted": False})
        return xyz_only(attacks.make_cw_perturb(
            logits_fn, untargeted_margin, dist_fn=_cw_dist_fn(), cfg=uc))
    if name == "cw-lpips":
        # CWPerturb with the LPIPS perceptual distance on the PointNet
        # feature stack (`util/dist_utils.py:412-461` + feature model)
        if cfg.model != "pointnet" or params is None:
            raise ValueError("CW-LPIPS needs the pointnet feature model "
                             "(pass params to build_attack)")
        from hitadv_tpu.models import pointnet as pn

        def lpips_fn(adv, ori):
            return losses.lpips_distance(pn.features(params, adv),
                                         pn.features(params, ori))

        tc = attacks.CWConfig(**{**cw_cfg.__dict__, "targeted": True})
        return xyz_only(attacks.make_cw_perturb(
            logits_fn, targeted_margin, dist_fn=lpips_fn, cfg=tc))

    if name in ("cw-knn", "cw-uknn"):
        targeted = name == "cw-knn"
        adv = targeted_margin if targeted else untargeted_margin

        def clip_fn(adv_pc, ori, normal):
            return losses.project_inner_clip_linf(adv_pc, ori,
                                                  cfg.budget, normal)

        return attacks.make_cw_knn(
            logits_fn, adv,
            dist_fn=functools.partial(losses.chamfer_knn_dist),
            clip_fn=clip_fn,
            cfg=attacks.CWKNNConfig(targeted=targeted))

    linf_clip = lambda a, o: losses.clip_points_linf(a, o, cfg.budget)  # noqa: E731
    if name in ("aof", "taof", "uaeaof"):
        mode = {"aof": "untargeted", "taof": "targeted",
                "uaeaof": "ae_untargeted"}[name]
        adv = targeted_margin if mode == "targeted" else untargeted_margin
        # UAEAOF's reference default GAMMA is 0.25 (`CW/UAEAOF.py:59`),
        # vs 0.5 for AOF/TAOF (`CW/AOF.py:59`)
        aof_cfg = attacks.AOFConfig(
            attack_lr=cfg.attack_lr, num_iter=cfg.num_iter, mode=mode,
            gamma=(0.25 if mode == "ae_untargeted" else 0.5))
        if mode == "ae_untargeted" and ae_fn is None:
            ae_fn = _default_ae(cfg)
        return xyz_only(attacks.make_aof(logits_fn, adv, linf_clip,
                                         aof_cfg, ae_fn=ae_fn))
    if name in ("advpc", "uadvpc"):
        targeted = name == "advpc"
        adv = targeted_margin if targeted else untargeted_margin
        if ae_fn is None:
            ae_fn = _default_ae(cfg)
        return xyz_only(attacks.make_advpc(
            logits_fn, ae_fn, adv, linf_clip,
            attacks.AdvPCConfig(attack_lr=cfg.attack_lr,
                                num_iter=cfg.num_iter,
                                targeted=targeted)))

    if name == "add":
        # reference default num_add=512 assumes N=1024; clamp for small
        # clouds (critical-point top-k needs num_add <= N)
        return xyz_only(attacks.make_cw_add(
            logits_fn, targeted_margin,
            cfg=attacks.AddConfig(num_iter=cfg.num_iter,
                                  binary_step=cfg.binary_step,
                                  num_add=min(512, cfg.num_point))))
    if name == "add-cluster":
        return attacks.make_cw_add_clusters(
            logits_fn, targeted_margin,
            cfg=attacks.AddClusterConfig(num_iter=cfg.num_iter))
    if name == "add-object":
        return attacks.make_cw_add_objects(
            logits_fn, targeted_margin,
            cfg=attacks.AddObjectConfig(num_iter=cfg.num_iter))

    if name in ("geoa3", "geoa3-untarget"):
        return attacks.make_geoa3(
            logits_fn,
            attacks.GeoA3Config(
                attack_lr=cfg.attack_lr,
                binary_max_steps=cfg.binary_step,
                iter_max_steps=cfg.num_iter,
                curv_loss_knn=cfg.curv_loss_knn,
                targeted=(name == "geoa3")))

    if name == "drop":
        return attacks.make_saliency_drop(
            logits_fn, attacks.DropConfig(
                num_drop=min(cfg.num_drop, cfg.num_point // 2),
                k=cfg.k))

    raise ValueError(f"unknown attack_type {cfg.attack_type!r}")


def _default_ae(cfg: EvalConfig):
    """Autoencoder for AdvPC/UAEAOF (`CW/AdvPC.py:83-99,142`).

    Resolution order:
      1. ``--ae_checkpoint`` — load a pickled AE pytree;
      2. fit-and-cache: train the AE on the eval data for
         ``--ae_fit_steps`` Adam steps (chamfer reconstruction) and
         cache under HITADV_CACHE_DIR, reused on the next run;
      3. ``--ae_fit_steps 0`` — random AE, with a LOUD warning: the
         reference's attack semantics assume a trained AE, so random-AE
         results are not comparable.
    """
    import itertools
    import os

    import jax
    import numpy as np
    from hitadv_tpu.models import autoencoder
    from hitadv_tpu.utils import checkpoint as ckpt

    if cfg.ae_checkpoint:
        params = ckpt.load_params(cfg.ae_checkpoint)
        return lambda x: autoencoder.apply(params, x)

    if cfg.ae_fit_steps <= 0:
        print("WARNING: running an AE-conditioned attack with a RANDOM "
              "autoencoder (--ae_fit_steps 0). The reference assumes a "
              "pretrained AE (CW/AdvPC.py:83-99); success senses and "
              "ASR are NOT comparable. Pass --ae_checkpoint or set "
              "--ae_fit_steps > 0.")
        params = autoencoder.init(jax.random.PRNGKey(cfg.seed),
                                  num_points=cfg.num_point)
        return lambda x: autoencoder.apply(params, x)

    cache_dir = os.environ.get(
        "HITADV_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hitadv_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(
        cache_dir, f"ae_{cfg.dataset}_{cfg.num_point}p_"
                   f"{cfg.ae_fit_steps}s_{cfg.seed}.pkl")
    if os.path.exists(cache):
        print(f"loading cached fitted AE: {cache}")
        params = ckpt.load_params(cache)
        return lambda x: autoencoder.apply(params, x)

    print(f"no --ae_checkpoint given: fitting the AE on eval data "
          f"({cfg.ae_fit_steps} steps) and caching to {cache}")
    clouds = []
    for pts, _ in itertools.islice(build_batches(cfg), 8):
        clouds.append(np.asarray(pts)[..., :3])
    clouds = np.concatenate(clouds, axis=0)
    import jax.numpy as jnp

    params = autoencoder.init(jax.random.PRNGKey(cfg.seed),
                              num_points=cfg.num_point)
    params = autoencoder.fit(params, jnp.asarray(clouds),
                             jax.random.PRNGKey(cfg.seed + 1),
                             steps=cfg.ae_fit_steps,
                             batch_size=min(16, clouds.shape[0]))
    ckpt.save_params(cache, params)
    return lambda x: autoencoder.apply(params, x)


def build_batches(cfg: EvalConfig):
    from hitadv_tpu import data

    if cfg.dataset == "synthetic" or cfg.data_path is None:
        n_batches = max(1, cfg.synthetic_size // cfg.batch_size)
        return data.synthetic_batches(n_batches, cfg.batch_size,
                                      cfg.num_point, cfg.num_class,
                                      seed=cfg.seed)
    if cfg.dataset == "ModelNet":
        ds = data.ModelNetDataset(
            cfg.data_path, num_points=cfg.num_point, split="test",
            use_normals=cfg.use_normals, num_category=cfg.num_category,
            uniform=cfg.use_uniform_sample,
            process_data=cfg.process_data)
    elif cfg.dataset == "ShapeNetPart":
        ds = data.PartNormalDataset(cfg.data_path, npoints=cfg.num_point,
                                    split="test", normal_channel=True)
    else:
        raise ValueError(cfg.dataset)
    return data.batch_iterator(ds, cfg.batch_size, shuffle=False,
                               num_workers=cfg.num_workers)


def main(argv=None) -> dict:
    import itertools

    import jax

    # single shared compile-cache enabler (HITADV_COMPILE_CACHE,
    # default repo-local .jax_cache) so the CLI, bench.py, and the
    # probe scripts reuse each other's compiled programs
    from hitadv_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from hitadv_tpu.evaluation import eval_asr
    from hitadv_tpu.parallel import make_mesh, shard_attack

    parser = argparse.ArgumentParser("hitadv_tpu eval")
    add_config_flags(parser)
    parser.add_argument("--resume", default=None,
                        help="progress file for resumable sweeps")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)

    if cfg.bf16:
        import jax.numpy as jnp
        from hitadv_tpu.nn import functional as nnF

        nnF.set_compute_dtype(jnp.bfloat16)

    params, logits_fn = build_model(cfg)
    eval_logits_fn = logits_fn
    if getattr(cfg, "defense_method", None):
        # attack-time defense: the attacker differentiates THROUGH it
        # (the reference's pre_head hook position, `CW/Perturb.py:99-101`)
        from hitadv_tpu.defense import defended_logits_fn, get_defense

        logits_fn = defended_logits_fn(
            logits_fn, get_defense(cfg.defense_method,
                                   jax.random.PRNGKey(cfg.seed)))
        eval_logits_fn = logits_fn
    if getattr(cfg, "eval_defense_method", None):
        # eval-time defense: applied only when JUDGING clean/adv
        # predictions (`eval.py:65` — declared, unimplemented in the
        # reference), i.e. the attacker does not see it
        from hitadv_tpu.defense import defended_logits_fn, get_defense

        eval_logits_fn = defended_logits_fn(
            eval_logits_fn,
            get_defense(cfg.eval_defense_method,
                        jax.random.PRNGKey(cfg.seed + 1)))
    attack = build_attack(cfg, logits_fn, params=params)
    if cfg.restarts and cfg.restarts > 1:
        # population parallelism: R PRNG-independent restarts of the
        # same batch, first-success selection per example
        # (`parallel/population.py`; SURVEY.md §2.8)
        if (cfg.n_devices and cfg.n_devices > 1) or cfg.sp_devices > 1:
            raise ValueError(
                "--restarts shards the restart axis over the mesh and is"
                " mutually exclusive with --n_devices (batch sharding)"
                " and --sp_devices (points-sharded ring) — one mesh axis"
                " per attack program")
        from hitadv_tpu.parallel import population_attack

        # shard the restart axis over the LARGEST device subset whose
        # size divides R (make_mesh slices devices[:n], so any n up to
        # the device count works): R=12 on 8 devices -> 2 restarts on
        # each of 6 devices; R=3 -> 1 on each of 3. gcd would be wrong
        # here — gcd(12, 8)=4 wastes two usable devices and gcd(3, 8)=1
        # silently runs everything on one.
        n_avail = len(jax.devices())
        n_dev = max(k for k in range(1, n_avail + 1)
                    if cfg.restarts % k == 0)
        pop_mesh = make_mesh(n_dev) if n_dev > 1 else None
        attack = population_attack(attack, cfg.restarts, mesh=pop_mesh)
    elif cfg.n_devices and cfg.n_devices > 1:
        attack = shard_attack(attack, make_mesh(cfg.n_devices))

    batches = build_batches(cfg)
    if cfg.max_batches:
        batches = itertools.islice(batches, cfg.max_batches)

    progress = None
    if args.resume:
        from hitadv_tpu.utils import EvalProgress

        progress = EvalProgress(args.resume)

    metrics = eval_asr(eval_logits_fn, attack, batches,
                       key=jax.random.PRNGKey(cfg.seed),
                       uniform_k=cfg.k, log_dir=cfg.log_dir,
                       progress=progress)
    print({k: round(float(v), 6) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
