"""Single-sample attack visualizer: ``python -m hitadv_tpu.visual``.

Parity surface: `visual.py:22-69,172-225` — load one cloud, attack it
(B=1), re-predict, dump the adversarial cloud. Headless by design: the
reference's mayavi window becomes an ``.asc`` point dump (xyz per line,
the reference's save format) plus an optional matplotlib PNG scatter;
no GUI dependencies.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from typing import Optional

import numpy as np


def save_asc(path: str, points: np.ndarray) -> None:
    """xyz-per-line dump (the `.asc` format of `visual.py:63-68`)."""
    np.savetxt(path, points, fmt="%.6f")


def save_png(path: str, points: np.ndarray,
             color: str = "#3380FF") -> bool:
    """Scatter render via matplotlib if available; returns success."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=1, c=color)
    ax.set_axis_off()
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return True


def spectral_decompose(points: np.ndarray, low_pass: int = 100,
                       k: int = 30):
    """Low/high-frequency split through the graph-Laplacian eigenbasis.

    Parity: `visual.py:130-169` (`get_Laplace_from_pc` + eigenvector
    projection) — the reference's spectral rendering path. Reuses the
    AOF attack's Laplacian (`attacks/aof.py::graph_laplacian`, itself
    the `CW/AOF.py:30-51` parity implementation).

    points: ``[N, 3]``; returns (lfc [N, 3], hfc [N, 3]) with
    ``lfc + hfc == points`` up to float error (V is orthonormal).
    """
    import jax.numpy as jnp
    from hitadv_tpu.attacks.aof import graph_laplacian

    pc = jnp.asarray(points, jnp.float32)[None]               # [1, N, 3]
    _, V = graph_laplacian(pc, k=min(k, points.shape[0]))
    projs = jnp.einsum("bnc,bnm->bmc", pc, V)                 # [1, N, 3]
    lfc = jnp.einsum("bmc,bnm->bnc", projs[:, :low_pass],
                     V[:, :, :low_pass])
    hfc = jnp.einsum("bmc,bnm->bnc", projs[:, low_pass:],
                     V[:, :, low_pass:])
    return np.asarray(lfc[0]), np.asarray(hfc[0])


def evalit(logits_fn, attack_fn, data: np.ndarray, target: int, key):
    """Attack one sample. Parity: `visual.py:22-48`.

    data: ``[N, 3|6]``; returns (adv_points [N', 3], clean_pred,
    adv_pred, success).
    """
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(data, jnp.float32)[None]                # [1, N, C]
    labels = jnp.asarray([target], jnp.int32)
    clean_pred = int(jnp.argmax(logits_fn(pts[..., :3]), -1)[0])
    res = attack_fn(pts, labels, key)
    adv = np.asarray(res.adv_points[0])
    adv_pred = int(np.asarray(res.pred)[0])
    return adv, clean_pred, adv_pred, bool(np.asarray(res.success)[0])


def main(argv=None):
    import jax
    from hitadv_tpu.config import EvalConfig, add_config_flags, \
        config_from_args
    from hitadv_tpu.data import pc_normalize, synthetic_clouds
    from hitadv_tpu.eval import build_attack, build_model

    p = argparse.ArgumentParser("hitadv_tpu visual")
    add_config_flags(p)
    p.add_argument("--input", default=None,
                   help="txt cloud (comma-sep xyz[+normal]); default: "
                        "one synthetic sample")
    p.add_argument("--target", type=int, default=0)
    p.add_argument("--out_dir", default="./visual_out")
    p.add_argument("--mode", default="attack",
                   choices=["attack", "spectral"],
                   help="attack: adversarial sample dump; spectral: "
                        "Laplacian lfc/hfc reconstructions "
                        "(`visual.py:130-169`)")
    p.add_argument("--low_pass", type=int, default=100,
                   help="spectral mode: number of low-frequency "
                        "eigenvectors")
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    if args.input:
        data = np.loadtxt(args.input, delimiter=",").astype(np.float32)
        data = data[:cfg.num_point]
        data[:, :3] = pc_normalize(data[:, :3])
        target = args.target
    else:
        clouds, labels = synthetic_clouds(1, cfg.num_point, seed=cfg.seed)
        data, target = clouds[0], int(labels[0])

    if args.mode == "spectral":
        os.makedirs(args.out_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d%H%M%S")
        xyz = np.asarray(data[:, :3], np.float32)
        lfc, hfc = spectral_decompose(xyz, low_pass=args.low_pass)
        outs = []
        for name, cloud in (("ori", xyz), ("lfc", lfc), ("hfc", hfc)):
            path = os.path.join(args.out_dir, f"{name}_{stamp}.asc")
            save_asc(path, cloud)
            outs.append(path)
            save_png(os.path.join(args.out_dir, f"{name}_{stamp}.png"),
                     cloud)
        print(f"spectral split (low_pass={args.low_pass}): saved "
              + ", ".join(outs))
        return lfc

    _, logits_fn = build_model(cfg)
    attack = build_attack(cfg, logits_fn)
    adv, clean_pred, adv_pred, success = evalit(
        logits_fn, attack, data, target, jax.random.PRNGKey(cfg.seed))

    os.makedirs(args.out_dir, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d%H%M%S")
    asc_path = os.path.join(args.out_dir, f"adv_{stamp}.asc")
    save_asc(asc_path, adv)
    png_path = os.path.join(args.out_dir, f"adv_{stamp}.png")
    has_png = save_png(png_path, adv)
    print(f"clean pred {clean_pred}, adv pred {adv_pred}, "
          f"success {success}; saved {asc_path}"
          + (f" and {png_path}" if has_png else ""))
    return adv


if __name__ == "__main__":
    main()
