"""Typed configuration system.

Replaces the reference's five conflicting argparse modules (`config.py`,
`eval.py:21-72`, `visual.py:96-127`, `FGM/CWPert_args.py`,
`FGM/GeoA3_args.py:35-110`) with one dataclass hierarchy. Defaults are
the hyperparameters of record for the HiT-ADV eval (SURVEY.md §5
config table); per-attack namespaces live on the attack configs
themselves (`attacks/*.py`).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class EvalConfig:
    # data (`eval.py:26,41,61-63`)
    dataset: str = "ModelNet"          # ModelNet | ShapeNetPart | synthetic
    data_path: Optional[str] = None
    batch_size: int = 256
    num_point: int = 1024
    num_class: int = 40
    num_category: int = 40
    use_normals: bool = True
    use_uniform_sample: bool = False
    process_data: bool = False
    num_workers: int = 10

    # victim (`eval.py:44`)
    model: str = "pointnet"
    checkpoint: Optional[str] = None   # torch .checkpoint or pickled pytree
    emb_dims: int = 1024
    dropout: float = 0.2
    k: int = 5                         # DGCNN k AND uniform-metric k

    # attack selection (`eval.py:34,28-37`)
    attack_type: str = "HiT-ADV"
    adv_func: str = "cross_entropy"    # cross_entropy | logits
    kappa: float = 30.0
    budget: float = 0.55
    num_iter: int = 100
    mu: float = 1.0
    step_size: Optional[float] = None  # default budget*2/num_iter

    # CW loop (`FGM/CWPert_args.py:39-44`)
    attack_lr: float = 1e-2
    binary_step: int = 10
    init_weight: float = 10.0
    max_weight: float = 80.0

    # SaliencyDrop (`Saliency/Drop.py:16`): points to delete; clamped
    # to half the cloud when num_point is small
    num_drop: int = 200

    # HiT-ADV specifics (`eval.py:49-59`)
    cd_weight: float = 1e-4
    ker_weight: float = 1.0
    hide_weight: float = 1.0
    curv_loss_knn: int = 16
    central_num: int = 192
    total_central_num: int = 256
    max_sigm: float = 1.2
    min_sigm: float = 0.1

    # AdvPC / UAEAOF autoencoder. The reference assumes a PRETRAINED AE
    # (`CW/AdvPC.py:83-99`; success senses require its predictions,
    # `:142`) — running with a random AE silently changes the attack.
    # ae_checkpoint: pickled AE pytree (save_params format). When unset,
    # the driver FITS an AE on the eval data for ae_fit_steps Adam steps
    # and caches it; ae_fit_steps=0 opts into the random AE (loud
    # warning).
    ae_checkpoint: Optional[str] = None
    ae_fit_steps: int = 300

    # defenses (`eval.py:64-66`; flags exist in the reference but are
    # unimplemented there — see hitadv_tpu/defense.py)
    defense_method: Optional[str] = None
    eval_defense_method: Optional[str] = None

    # precision: bf16 activations between layers (matmul inputs are
    # bf16-rounded on TPU regardless; this halves HBM traffic. ~1.6x on
    # victim fwd+bwd, logits drift ~5e-4, argmax agreement 100%)
    bf16: bool = False

    # eval harness
    seed: int = 0
    log_dir: str = "./log"
    max_batches: Optional[int] = None  # cap for smoke runs
    n_devices: Optional[int] = None    # mesh size (None = all)
    synthetic_size: int = 64           # items when dataset == synthetic

    # CW-Perturb distance override + sequence-parallel scaling axis.
    # dist_func: None/"l2" = reference L2Dist (`eval.py` CWPerturb
    # choice); "chamfer" = set distance, which at large N is the term
    # that materializes [B, N, N] — with sp_devices > 1 it rides
    # `parallel.ring.ring_chamfer` over a points-sharded mesh (ICI
    # ppermute ring; per-device blocks [B, N/D, N/D]; SURVEY.md §5
    # long-context prescription). Mutually exclusive with n_devices
    # batch sharding (one mesh per attack program).
    dist_func: Optional[str] = None
    sp_devices: int = 0

    # Population parallelism (SURVEY.md §2.8 "optional population
    # parallelism: independent restarts across devices"): run R
    # PRNG-independent instances of the attack on the SAME batch and
    # keep, per example, the first successful restart's cloud
    # (`parallel/population.py`). The restart axis is sharded over the
    # largest device subset whose size divides R (max k <= n_devices
    # with R % k == 0 — e.g. R=12 on 8 devices runs 2 restarts on each
    # of 6 devices; R=3 runs 1 on each of 3), a pure-compute scale-out.
    # Mutually exclusive with n_devices/sp_devices (one mesh axis per
    # attack program).
    restarts: int = 0


def add_config_flags(parser: argparse.ArgumentParser,
                     cfg_cls=EvalConfig) -> None:
    """Auto-generate CLI flags from the dataclass fields."""
    for f in dataclasses.fields(cfg_cls):
        name = "--" + f.name
        ann = str(f.type)
        if f.type in ("bool", bool) or "bool" in ann:
            parser.add_argument(name, type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default)
        elif f.default is None or isinstance(f.default, (int, float, str)):
            if f.default is not None:
                typ = type(f.default)
            elif "int" in ann:                  # Optional[int]
                typ = int
            elif "float" in ann:                # Optional[float]
                typ = float
            else:
                typ = str
            parser.add_argument(name, type=typ, default=f.default)


def config_from_args(args: argparse.Namespace,
                     cfg_cls=EvalConfig) -> EvalConfig:
    kwargs = {f.name: getattr(args, f.name)
              for f in dataclasses.fields(cfg_cls)
              if hasattr(args, f.name)}
    return cfg_cls(**kwargs)
