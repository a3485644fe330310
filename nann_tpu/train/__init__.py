from .sampler import sample_negatives, expected_count
from .objective import nann_loss, build_targets
from .step import TrainState, create_train_state, make_train_step

__all__ = [
    "sample_negatives",
    "expected_count",
    "nann_loss",
    "build_targets",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
