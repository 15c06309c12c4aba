"""Training: jitted/sharded train step and the training loop."""

from unopticalflow_tpu.training.train_step import (
    TrainState,
    create_train_state,
    loss_weights_from_config,
    make_multi_train_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "loss_weights_from_config",
    "make_multi_train_step",
    "make_train_step",
]
