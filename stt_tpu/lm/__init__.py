from stt_tpu.lm.kenlm import KenLMModel
from stt_tpu.lm.murmur import murmur_hash64a

__all__ = ["KenLMModel", "murmur_hash64a"]
