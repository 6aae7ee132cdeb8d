from stt_tpu.ctc.loss import ctc_loss
from stt_tpu.ctc.greedy import greedy_decode, collapse_best_path

__all__ = ["ctc_loss", "greedy_decode", "collapse_best_path"]
