from visual_onoma_to_wave_tpu.utils.checkpoint import (
    CheckpointManager,
    load_params,
    save_params,
)
from visual_onoma_to_wave_tpu.utils.logging import MetricsLogger, StepTimer
from visual_onoma_to_wave_tpu.utils.plotting import plot_mel

__all__ = [
    "CheckpointManager",
    "MetricsLogger",
    "StepTimer",
    "load_params",
    "plot_mel",
    "save_params",
]
