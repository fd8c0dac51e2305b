from visual_onoma_to_wave_tpu.training.loss import fastspeech2_loss
from visual_onoma_to_wave_tpu.training.schedule import make_optimizer, noam_schedule
from visual_onoma_to_wave_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_synth_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "fastspeech2_loss",
    "make_eval_step",
    "make_optimizer",
    "make_synth_step",
    "make_train_step",
    "noam_schedule",
]
