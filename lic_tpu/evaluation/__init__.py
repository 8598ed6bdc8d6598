"""Evaluation: Kodak/CLIC harness, metrics, content-adaptive encoding."""

from .metrics import psnr_255, mse_255
from .eval import evaluate_folder, evaluate_image, content_adaptive_finetune

__all__ = [
    "psnr_255",
    "mse_255",
    "evaluate_folder",
    "evaluate_image",
    "content_adaptive_finetune",
]
