"""Training: loss, SPMD train step, LR schedule, checkpoints, loop."""

from .schedule import warmup_poly_schedule
from .step import TrainState, create_train_state, train_step, eval_losses

__all__ = ["warmup_poly_schedule", "TrainState", "create_train_state",
           "train_step", "eval_losses"]
