from pcss_unet_tpu.train.schedule import warmup_cosine_schedule, clip_norm_for_step
from pcss_unet_tpu.train.state import TrainState, create_train_state, make_optimizer
from pcss_unet_tpu.train.step import build_train_step, build_eval_step, standardize
from pcss_unet_tpu.train.checkpoint import CheckpointManagerWrapper
from pcss_unet_tpu.train.loop import fit

__all__ = [
    "warmup_cosine_schedule", "clip_norm_for_step", "TrainState",
    "create_train_state", "make_optimizer", "build_train_step",
    "build_eval_step", "standardize", "CheckpointManagerWrapper", "fit",
]
