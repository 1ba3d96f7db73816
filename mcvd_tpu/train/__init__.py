from .state import TrainState, make_optimizer, create_train_state
from .step import make_train_step, make_train_chunk, make_eval_loss_step
from . import checkpoints

__all__ = [
    "TrainState",
    "make_optimizer",
    "create_train_state",
    "make_train_step",
    "make_train_chunk",
    "make_eval_loss_step",
    "checkpoints",
]
