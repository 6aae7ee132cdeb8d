"""Native C++ decoder equivalence against the Python oracle: identical
tokens, timesteps and confidences with and without scorer/hot words."""

import os

import numpy as np
import pytest

from stt_tpu.alphabet import Alphabet
from stt_tpu.decode import ctc_beam_search_decoder, make_decoder_state
from stt_tpu.decode.native import (
    NativeDecoderState,
    native_available,
    validate_scorer,
)

SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native decoder not built"
)


def english():
    return Alphabet("/root/reference/data/alphabet.txt")


def random_probs(t=60, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(t, 29) * 3
    p = np.exp(logits)
    return p / p.sum(-1, keepdims=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_no_lm_equivalence(seed):
    alphabet = english()
    probs = random_probs(seed=seed)
    py = ctc_beam_search_decoder(
        probs, alphabet, 48, num_results=5, implementation="python"
    )
    nat = NativeDecoderState(alphabet, 48)
    nat.next(probs)
    for a, b in zip(py, nat.decode(5)):
        assert a.tokens == b.tokens
        assert a.timesteps == b.timesteps
        assert a.confidence == pytest.approx(b.confidence, abs=1e-6)


def test_lm_and_hotword_equivalence():
    if not os.path.isfile(SCORER):
        pytest.skip("scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    alphabet = english()
    probs = random_probs(seed=3)
    scorer = KenLMScorer(SCORER, alpha=0.75, beta=1.85)
    hot = {"she": 2.5, "water": -1.0}
    py = ctc_beam_search_decoder(
        probs, alphabet, 48, scorer=scorer, hot_words=hot, num_results=5,
        implementation="python",
    )
    nat = NativeDecoderState(
        alphabet, 48, scorer_path=SCORER, alpha=0.75, beta=1.85, hot_words=hot
    )
    nat.next(probs)
    for a, b in zip(py, nat.decode(5)):
        assert a.tokens == b.tokens
        assert a.timesteps == b.timesteps
        assert a.confidence == pytest.approx(b.confidence, abs=1e-4)


def test_cutoff_pruning_equivalence():
    alphabet = english()
    probs = random_probs(seed=4)
    py = ctc_beam_search_decoder(
        probs, alphabet, 32, cutoff_prob=0.97, cutoff_top_n=12,
        num_results=3, implementation="python",
    )
    nat = NativeDecoderState(alphabet, 32, cutoff_prob=0.97, cutoff_top_n=12)
    nat.next(probs)
    for a, b in zip(py, nat.decode(3)):
        assert a.tokens == b.tokens
        assert a.confidence == pytest.approx(b.confidence, abs=1e-6)


def test_streaming_chunks_equivalence():
    alphabet = english()
    probs = random_probs(t=50, seed=5)
    one = NativeDecoderState(alphabet, 32)
    one.next(probs)
    chunked = NativeDecoderState(alphabet, 32)
    for start in range(0, 50, 9):
        chunked.next(probs[start : start + 9])
        chunked.decode()  # non-destructive intermediate
    a = one.decode(1)[0]
    b = chunked.decode(1)[0]
    assert a.tokens == b.tokens and a.timesteps == b.timesteps


def test_factory_selects_native():
    alphabet = english()
    state = make_decoder_state(alphabet, 16)
    assert isinstance(state, NativeDecoderState)
    # non-path scorer forces the python oracle
    from stt_tpu.decode.scorer import StaticScorer
    from stt_tpu.decode import DecoderState

    state = make_decoder_state(
        alphabet, 16, scorer=StaticScorer({("a",): -1.0})
    )
    assert isinstance(state, DecoderState)


def test_validate_scorer():
    if not os.path.isfile(SCORER):
        pytest.skip("scorer missing")
    assert validate_scorer(SCORER)
    assert not validate_scorer("/dev/null")


def test_utf8_mode_native():
    if not os.path.isfile(
        "/root/reference/data/smoke_test/pruned_lm.bytes.scorer"
    ):
        pytest.skip("bytes scorer missing")
    from stt_tpu.alphabet import UTF8Alphabet

    alphabet = UTF8Alphabet()
    rng = np.random.RandomState(6)
    logits = rng.randn(20, 256) * 3
    probs = np.exp(logits)
    probs /= probs.sum(-1, keepdims=True)
    bytes_scorer = "/root/reference/data/smoke_test/pruned_lm.bytes.scorer"
    from stt_tpu.decode.scorer_package import KenLMScorer

    scorer = KenLMScorer(bytes_scorer, alpha=0.75, beta=1.85)
    py = ctc_beam_search_decoder(
        probs, alphabet, 16, scorer=scorer, implementation="python"
    )
    nat = NativeDecoderState(
        alphabet, 16, scorer_path=bytes_scorer, alpha=0.75, beta=1.85
    )
    nat.next(probs)
    nr = nat.decode(1)
    assert py[0].tokens == nr[0].tokens
    assert py[0].confidence == pytest.approx(nr[0].confidence, abs=1e-4)
