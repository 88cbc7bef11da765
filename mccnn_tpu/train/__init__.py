"""Training infrastructure: losses, optimizer schedules, train-step factory
(the reference's per-task TF1 training plumbing, factored — SURVEY §3.1)."""

from .losses import (
    accuracy,
    classh_loss,
    classification_loss,
    iou_per_class,
    masked_accuracy,
    normal_loss,
    segmentation_loss,
)
from .state import (
    TrainState,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState",
    "accuracy",
    "classh_loss",
    "classification_loss",
    "init_state",
    "iou_per_class",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "masked_accuracy",
    "normal_loss",
    "segmentation_loss",
]
