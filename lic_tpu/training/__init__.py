"""Training: R-D loss, LR schedules, pjit data-parallel train loop."""

from .loss import rate_distortion_loss, ssim, ms_ssim
from .train import TrainState, make_train_step, train

__all__ = [
    "rate_distortion_loss",
    "ssim",
    "ms_ssim",
    "TrainState",
    "make_train_step",
    "train",
]
