from stt_tpu.data.audio import read_wav

__all__ = ["read_wav"]
