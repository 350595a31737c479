"""Logging + metric meters.

Parity surface: `util/other_utils.py:150-170` (create_logger: stream +
optional timestamped file handler) and `util/other_utils.py:275-300`
(AvgMeter with NaN→1e6 clamping).
"""

from __future__ import annotations

import logging
import math
import os
from datetime import datetime
from typing import Optional


def create_logger(save_path: str = "", file_type: str = "",
                  level: str = "info") -> logging.Logger:
    """Stream(+file) logger; file goes to ``<save_path>/<type>_log.txt``."""
    _level = logging.DEBUG if level == "debug" else logging.INFO
    logger = logging.getLogger("hitadv_tpu")
    logger.setLevel(_level)
    logger.handlers.clear()

    cs = logging.StreamHandler()
    cs.setLevel(_level)
    logger.addHandler(cs)

    if save_path:
        os.makedirs(save_path, exist_ok=True)
        file_name = os.path.join(save_path, f"{file_type}_log.txt")
        fh = logging.FileHandler(file_name, mode="w")
        fh.setLevel(_level)
        logger.addHandler(fh)
    return logger


def timestamped_logger(save_path: str = "./log") -> logging.Logger:
    """eval_ASR's convention: a fresh %Y%m%d%H%M%S-named log file."""
    ts = datetime.now().strftime("%Y%m%d%H%M%S")
    return create_logger(save_path, ts, "info")


def topk_accuracy(logits, targets, topk=(1,)):
    """Top-k accuracy percentages (torch_accuracy parity,
    `util/other_utils.py:217-235`). Works on numpy or jax arrays."""
    import numpy as np

    logits = np.asarray(logits)
    targets = np.asarray(targets)
    maxk = max(topk)
    pred = np.argsort(-logits, axis=-1)[:, :maxk]             # [B, maxk]
    correct = pred == targets[:, None]
    return [100.0 * correct[:, :k].any(axis=1).mean() for k in topk]


class AvgMeter:
    """Running mean with NaN clamping (parity: `util/other_utils.py:275-300`)."""

    def __init__(self, name: str = "No name"):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.sum = 0.0
        self.mean = 0.0
        self.num = 0
        self.now = 0.0

    def update(self, mean_var: float, count: int = 1) -> None:
        if math.isnan(mean_var):
            mean_var = 1e6
        self.now = mean_var
        self.num += count
        self.sum += mean_var * count
        self.mean = float(self.sum) / self.num
