from stt_tpu.train.step import (
    Batch,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    make_train_step_dp,
    make_train_step_tp,
)

__all__ = [
    "Batch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_train_step_dp",
    "make_train_step_tp",
    "make_eval_step",
]
