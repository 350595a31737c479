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


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>hitadv_tpu viewer</title>
<style>
 body {{ margin:0; background:#111; color:#ddd;
        font:13px system-ui, sans-serif; }}
 #hud {{ position:fixed; top:8px; left:10px; user-select:none; }}
 #hud label {{ margin-right: 14px; cursor:pointer; }}
 canvas {{ display:block; }}
</style></head><body>
<div id="hud">{toggles} &nbsp;drag: rotate &middot; wheel: zoom</div>
<canvas id="c"></canvas>
<script>
const CLOUDS = {clouds_json};
const COLORS = {colors_json};
const cv = document.getElementById("c"), ctx = cv.getContext("2d");
let rx = -0.4, ry = 0.6, zoom = 1.0, drag = null;
const shown = Object.fromEntries(Object.keys(CLOUDS).map(k => [k, true]));
for (const k of Object.keys(CLOUDS)) {{
  const el = document.getElementById("t_" + k);
  if (el) el.onchange = () => {{ shown[k] = el.checked; draw(); }};
}}
function draw() {{
  const W = cv.width = innerWidth, H = cv.height = innerHeight;
  ctx.clearRect(0, 0, W, H);
  const s = Math.min(W, H) * 0.35 * zoom;
  const ca = Math.cos(ry), sa = Math.sin(ry);
  const cb = Math.cos(rx), sb = Math.sin(rx);
  for (const [name, pts] of Object.entries(CLOUDS)) {{
    if (!shown[name]) continue;
    ctx.fillStyle = COLORS[name];
    for (let i = 0; i < pts.length; i += 3) {{
      const x = pts[i], y = pts[i+1], z = pts[i+2];
      const x1 = ca*x + sa*z, z1 = -sa*x + ca*z;
      const y1 = cb*y - sb*z1, z2 = sb*y + cb*z1;
      const p = 2.2 / (2.2 + z2);
      ctx.globalAlpha = Math.max(0.25, Math.min(1, p));
      const r = Math.max(1, 2.2 * p * zoom);
      ctx.fillRect(W/2 + x1*s*p - r/2, H/2 - y1*s*p - r/2, r, r);
    }}
  }}
  ctx.globalAlpha = 1;
}}
cv.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => {{
  if (!drag) return;
  ry += (e.clientX - drag[0]) * 0.008;
  rx += (e.clientY - drag[1]) * 0.008;
  drag = [e.clientX, e.clientY]; draw();
}};
window.onwheel = e => {{ zoom *= e.deltaY < 0 ? 1.1 : 0.9; draw(); }};
window.onresize = draw;
draw();
</script></body></html>
"""

_PALETTE = ("#57a9f7", "#f7705c", "#7ed87e", "#e5c055", "#c08df0")


def save_html(path: str, clouds: dict) -> None:
    """Self-contained interactive 3-D viewer (rotate/zoom/toggle).

    The TPU-pod answer to the reference's blocking mayavi window
    (`visual.py:51-69`): a single HTML file with the clouds embedded
    as JSON and a ~50-line canvas renderer — open it in any browser,
    no GUI stack or network on the host. ``clouds`` maps name ->
    [N, 3] array; each gets a color and an on/off toggle.
    """
    import json

    names = list(clouds)
    clouds_json = json.dumps({
        n: [round(float(v), 5) for v in np.asarray(c)[:, :3].ravel()]
        for n, c in clouds.items()})
    colors_json = json.dumps({
        n: _PALETTE[i % len(_PALETTE)] for i, n in enumerate(names)})
    toggles = " ".join(
        f'<label><input type="checkbox" id="t_{n}" checked> '
        f'<span style="color:{_PALETTE[i % len(_PALETTE)]}">{n}'
        f"</span></label>" for i, n in enumerate(names))
    with open(path, "w") as f:
        f.write(_HTML_TEMPLATE.format(clouds_json=clouds_json,
                                      colors_json=colors_json,
                                      toggles=toggles))


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
        html_path = os.path.join(args.out_dir, f"spectral_{stamp}.html")
        save_html(html_path, {"ori": xyz, "lfc": lfc, "hfc": hfc})
        outs.append(html_path)
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
    html_path = os.path.join(args.out_dir, f"adv_{stamp}.html")
    save_html(html_path, {"clean": np.asarray(data[:, :3]),
                          "adv": adv})
    print(f"clean pred {clean_pred}, adv pred {adv_pred}, "
          f"success {success}; saved {asc_path}, {html_path}"
          + (f" and {png_path}" if has_png else ""))
    return adv


if __name__ == "__main__":
    main()
