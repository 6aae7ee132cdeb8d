from stt_tpu.decode.beam import (
    DecodeResult,
    DecoderState,
    Wav2vec2DecoderState,
    ctc_beam_search_decoder,
    ctc_beam_search_decoder_batch,
    ctc_beam_search_decoder_for_wav2vec2am,
    make_decoder_state,
)
from stt_tpu.decode.trie import DictionaryTrie
from stt_tpu.decode.scorer import ScorerBase

__all__ = [
    "DecodeResult",
    "DecoderState",
    "ctc_beam_search_decoder",
    "ctc_beam_search_decoder_batch",
    "make_decoder_state",
    "DictionaryTrie",
    "ScorerBase",
]
