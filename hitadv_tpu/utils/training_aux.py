"""Attack/eval progress checkpointing and experiment bookkeeping.

Parity surface:
  * `FGM/GeoA3_args.py:855-930` (Training_aux: checkpoint + best-copy +
    state.txt log);
  * `util/other_utils.py:173-202` (save/load_checkpoint dicts);
  * `FGM/GeoA3_args.py:930-996` (Count_converge_iter / Count_loss_iter
    histogram recorders).

Additionally provides what the reference lacks (SURVEY.md §5 rebuild
note): resumable *eval sweeps* — `EvalProgress` persists per-batch attack
outputs so a long ModelNet40 sweep survives preemption.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


class TrainingAux:
    """Checkpoint-with-best-copy helper (GeoA3 Training_aux parity)."""

    def __init__(self, fsave: str):
        self.fsave = fsave
        os.makedirs(fsave, exist_ok=True)

    def save_checkpoint(self, state: Dict[str, Any], is_best: bool,
                        filename: str = "checkpoint.pkl") -> None:
        path = os.path.join(self.fsave, filename)
        with open(path, "wb") as f:
            pickle.dump(state, f)
        if is_best:
            shutil.copyfile(path,
                            os.path.join(self.fsave, "modelBest.pkl"))

    def load_checkpoint(self, is_best: bool = False
                        ) -> Optional[Dict[str, Any]]:
        name = "modelBest.pkl" if is_best else "checkpoint.pkl"
        path = os.path.join(self.fsave, name)
        if not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def write_err_to_file(self, info: str) -> None:
        with open(os.path.join(self.fsave, "state.txt"), "a") as f:
            f.write(info)


class ConvergenceRecorder:
    """Converged-iteration histogram (Count_converge_iter parity).

    Records per-example convergence steps; `save` dumps the raw list and
    a histogram PNG when matplotlib is available.
    """

    def __init__(self, fsave: str, bins: int = 20):
        self.fsave = fsave
        self.bins = bins
        os.makedirs(fsave, exist_ok=True)
        self.steps: List[int] = []

    def record(self, step: int) -> None:
        self.steps.append(int(step))

    def save(self, name: str = "converge_iter") -> None:
        with open(os.path.join(self.fsave, f"{name}.json"), "w") as f:
            json.dump(self.steps, f)
        self._plot(self.steps, name)

    def _plot(self, values, name):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, ax = plt.subplots()
        ax.hist(values, bins=self.bins)
        ax.set_xlabel(name)
        fig.savefig(os.path.join(self.fsave, f"{name}.png"), dpi=120)
        plt.close(fig)


class LossRecorder(ConvergenceRecorder):
    """Per-iteration loss curves (Count_loss_iter parity)."""

    def __init__(self, fsave: str):
        super().__init__(fsave)
        self.losses: List[float] = []

    def record(self, loss: float) -> None:  # type: ignore[override]
        self.losses.append(float(loss))

    def save(self, name: str = "loss_iter") -> None:  # type: ignore
        with open(os.path.join(self.fsave, f"{name}.json"), "w") as f:
            json.dump(self.losses, f)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        fig, ax = plt.subplots()
        ax.plot(self.losses)
        ax.set_xlabel("iteration")
        ax.set_ylabel("loss")
        fig.savefig(os.path.join(self.fsave, f"{name}.png"), dpi=120)
        plt.close(fig)


class EvalProgress:
    """Resumable eval sweep state (no reference equivalent).

    Persists per-batch scalar accumulators + the batch cursor so
    `eval_asr` can restart a long sweep after preemption.
    """

    def __init__(self, path: str):
        self.path = path
        self.state: Dict[str, Any] = {"next_batch": 0, "acc": {}}
        if os.path.isfile(path):
            with open(path, "rb") as f:
                self.state = pickle.load(f)

    @property
    def next_batch(self) -> int:
        return int(self.state["next_batch"])

    def accumulators(self) -> Dict[str, float]:
        return dict(self.state["acc"])

    def update(self, batch_index: int,
               acc: Dict[str, float]) -> None:
        self.state = {"next_batch": batch_index + 1, "acc": dict(acc)}
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.state, f)
        os.replace(tmp, self.path)

    def clear(self) -> None:
        if os.path.isfile(self.path):
            os.remove(self.path)
