from stt_tpu.data.audio import read_audio, read_wav

__all__ = ["read_audio", "read_wav"]
