from gastx.train.optimizer import scale_by_amsgrad, exponential_epoch_decay
from gastx.train.loop import (
    TrainState,
    init_train_state,
    make_train_step,
    eval_step,
)
from gastx.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    restore_batcher_random_state,
)

__all__ = [
    "scale_by_amsgrad",
    "exponential_epoch_decay",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "eval_step",
    "save_checkpoint",
    "load_checkpoint",
    "restore_batcher_random_state",
]
