"""wav2vec2-AM decoder variant: custom blank index, ignored symbols, and
AM->scorer token remapping (CTCDecoderForWav2vec2AM parity)."""

import numpy as np

from stt_tpu.alphabet import Alphabet
from stt_tpu.decode import (
    ctc_beam_search_decoder,
    ctc_beam_search_decoder_for_wav2vec2am,
)

# wav2vec2-style AM layout: <pad>(=blank)=0, <s>=1, </s>=2, then letters
# at different positions than the scorer alphabet
AM_LABELS = ["<pad>", "<s>", "</s>", " ", "a", "b", "c"]
SCORER_LABELS = [" ", "a", "b", "c"]


def am_alphabet():
    a = Alphabet().init_from_labels(AM_LABELS)
    return a


def scorer_alphabet():
    return Alphabet().init_from_labels(SCORER_LABELS)


def one_hot_probs(seq, n):
    probs = np.full((len(seq), n), 1e-9)
    for t, k in enumerate(seq):
        probs[t, k] = 1.0
    return probs / probs.sum(-1, keepdims=True)


def test_custom_blank_and_remap():
    am = am_alphabet()
    sc = scorer_alphabet()
    # AM emits: a b <pad> b ' ' c  (pad=blank allows the repeated b)
    seq = [4, 5, 0, 5, 3, 6]
    probs = one_hot_probs(seq, len(AM_LABELS))
    [res] = ctc_beam_search_decoder_for_wav2vec2am(
        probs, sc, beam_size=8, blank_id=0, am_alphabet=am,
        ignored_symbols=[1, 2],
    )
    # tokens come back in SCORER alphabet space
    assert res.transcript == "abb c"
    assert res.timesteps == [0, 1, 3, 4, 5]


def test_ignored_symbols_never_emitted():
    am = am_alphabet()
    sc = scorer_alphabet()
    seq = [1, 4, 2, 5, 1, 2]  # <s> a </s> b <s> </s>
    probs = one_hot_probs(seq, len(AM_LABELS))
    [res] = ctc_beam_search_decoder_for_wav2vec2am(
        probs, sc, beam_size=8, blank_id=0, am_alphabet=am,
        ignored_symbols=[1, 2],
    )
    decoded = res.tokens
    assert sc.decode(decoded).replace(" ", "") in ("ab", "ba", "ab")
    assert all(t < sc.size for t in decoded)


def test_default_decoder_unaffected():
    """The base decoder still has blank = alphabet size."""
    sc = scorer_alphabet()
    seq = [1, 4, 2]  # a blank b  (blank = 4 = alphabet size)
    probs = one_hot_probs(seq, sc.size + 1)
    [res] = ctc_beam_search_decoder(probs, sc, beam_size=8,
                                    implementation="python")
    assert res.transcript == "ab"
