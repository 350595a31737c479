"""Shared utilities: logging, meters, checkpoint IO, mesh IO, profiling."""

from hitadv_tpu.utils.logging import (  # noqa: F401
    AvgMeter,
    create_logger,
    timestamped_logger,
    topk_accuracy,
)
from hitadv_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer,
    annotate,
    enable_compile_cache,
    trace,
)
from hitadv_tpu.utils.training_aux import (  # noqa: F401
    ConvergenceRecorder,
    EvalProgress,
    LossRecorder,
    TrainingAux,
)
from hitadv_tpu.utils import mesh_io  # noqa: F401
