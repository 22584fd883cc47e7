"""Training runtime: trainers, checkpoints, schedules."""

from .trainer import Trainer, TrainState, XVectorModel, make_optimizer
from .trainer_mi import TrainerMultiInput

__all__ = [
    "Trainer",
    "TrainerMultiInput",
    "TrainState",
    "XVectorModel",
    "make_optimizer",
]
