"""PyTorch checkpoint → JAX pytree conversion, and orbax-style saving.

The reference distributes victim weights as torch checkpoints
(`eval.py:79,123`: ``state_dict['model_state_dict']`` or ``['last']``).
This module converts them once into the channels-last pytrees our
functional models consume:

  * Conv1d ``[Cout, Cin, 1]`` / Conv2d ``[Cout, Cin, 1, 1]`` → ``[Cin, Cout]``
  * Linear ``[Cout, Cin]`` → ``[Cin, Cout]``
  * BatchNorm ``weight/bias/running_mean/running_var`` → ``scale/bias/mean/var``

Each model module publishes a ``TORCH_SPEC`` mapping pytree paths to
(torch key prefix, kind). torch is only imported inside
`load_torch_state_dict` so the rest of the framework has no torch
dependency.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp


Kind = str  # "conv" | "linear" | "bn"


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy (handles the reference's
    'model_state_dict' / 'last' wrapper keys, `eval.py:123-124`)."""
    import torch  # local import: torch is optional at runtime

    state = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model_state_dict", "last", "state_dict"):
        if isinstance(state, dict) and wrapper in state:
            state = state[wrapper]
            break
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _convert_leaf(sd: Mapping[str, np.ndarray], prefix: str,
                  kind: Kind) -> Dict[str, jnp.ndarray]:
    if kind == "bn":
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
            "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}.running_var"]),
        }
    w = np.asarray(sd[f"{prefix}.weight"])
    if kind == "conv":
        w = w.reshape(w.shape[0], w.shape[1]).T               # drop 1(x1)
    elif kind == "conv1d":
        w = w.transpose(2, 1, 0)                              # [K, Cin, Cout]
    elif kind == "linear":
        w = w.T
    else:
        raise ValueError(kind)
    out = {"w": jnp.asarray(w)}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def convert_state_dict(sd: Mapping[str, np.ndarray],
                       spec: Mapping[str, Tuple[str, Kind]]) -> Dict:
    """Build a nested pytree from a flat spec.

    ``spec`` maps slash-separated pytree paths to (torch prefix, kind),
    e.g. ``{"stn/conv/conv0": ("feat.stn.conv1", "conv"), ...}``.
    """
    params: Dict[str, Any] = {}
    for path, (prefix, kind) in spec.items():
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _convert_leaf(sd, prefix, kind)
    return params


def save_params(path: str, params: Dict) -> None:
    """Persist a converted pytree (plain pickle of numpy arrays)."""
    import jax

    np_params = jax.tree_util.tree_map(np.asarray, params)
    with open(path, "wb") as f:
        pickle.dump(np_params, f)


def load_params(path: str) -> Dict:
    with open(path, "rb") as f:
        np_params = pickle.load(f)
    import jax

    return jax.tree_util.tree_map(jnp.asarray, np_params)


def save_params_orbax(path: str, params: Dict) -> None:
    """Orbax-backed checkpointing (multi-host-safe, async-capable) —
    the production alternative to the pickle path (SURVEY.md §5 rebuild
    note)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str) -> Dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))
