from stt_tpu.stream.streaming import StreamingRuntime, StreamState

__all__ = ["StreamingRuntime", "StreamState"]
