from stt_tpu.models.deepspeech import (
    ModelConfig,
    apply_model,
    create_overlapping_windows,
    init_params,
    num_params,
)
from stt_tpu.models.lstm import lstm_cell, lstm_init, lstm_scan

__all__ = [
    "ModelConfig",
    "apply_model",
    "create_overlapping_windows",
    "init_params",
    "num_params",
    "lstm_cell",
    "lstm_init",
    "lstm_scan",
]
