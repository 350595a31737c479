"""Minimal functional NN layer library (inference-mode victims).

The victim models are frozen classifiers under attack — every reference
attack constructor calls ``model.eval()`` (e.g. `CW/Perturb.py:34`). So the
layer set here is deliberately eval-only: BatchNorm consumes running
statistics, dropout is identity. Params are plain nested dicts (pytrees)
laid out channels-last for TPU-friendly pointwise matmuls and painless
PyTorch checkpoint conversion (`utils/checkpoint.py`).
"""

from hitadv_tpu.nn.functional import (  # noqa: F401
    batchnorm,
    batchnorm_init,
    conv1x1_init,
    leaky_relu,
    linear,
    linear_init,
    mlp_apply,
    mlp_init,
    relu,
)
