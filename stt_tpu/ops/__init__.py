from stt_tpu.ops.lstm_kernel import fused_lstm_supported, lstm_fused

__all__ = ["lstm_fused", "fused_lstm_supported"]
