from tpu_unet.train.checkpoint import (
    CheckpointWriter,
    find_best_checkpoint,
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from tpu_unet.train.optim import LRScheduler, get_learning_rate, make_optimizer, set_learning_rate
from tpu_unet.train.state import TrainState, create_train_state, num_params
from tpu_unet.train.steps import (
    AnomalyLossConfig,
    AugmentConfig,
    SegLossConfig,
    make_anomaly_eval_step,
    make_anomaly_train_step,
    make_seg_eval_step,
    make_seg_train_step,
)

__all__ = [
    "CheckpointWriter",
    "find_best_checkpoint",
    "load_checkpoint",
    "load_params",
    "save_checkpoint",
    "LRScheduler",
    "get_learning_rate",
    "make_optimizer",
    "set_learning_rate",
    "TrainState",
    "create_train_state",
    "num_params",
    "AnomalyLossConfig",
    "AugmentConfig",
    "SegLossConfig",
    "make_anomaly_eval_step",
    "make_anomaly_train_step",
    "make_seg_eval_step",
    "make_seg_train_step",
]
