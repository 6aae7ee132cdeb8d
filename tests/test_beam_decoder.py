"""Beam-search decoder tests: brute-force CTC oracle, greedy agreement,
streaming equivalence, LM/hot-word/dictionary behaviors, timesteps."""

import itertools
import math

import numpy as np
import pytest

import jax.numpy as jnp

from stt_tpu.alphabet import Alphabet, UTF8Alphabet
from stt_tpu.ctc import ctc_loss, greedy_decode
from stt_tpu.decode import (
    DecoderState,
    ctc_beam_search_decoder,
    ctc_beam_search_decoder_batch,
)
from stt_tpu.decode.scorer import StaticScorer

LABELS = [" ", "a", "b"]


def make_alphabet():
    return Alphabet().init_from_labels(LABELS)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def sequence_log_prob(probs, labels):
    """ln P(labels | probs) via the CTC forward algorithm (our loss)."""
    t = probs.shape[0]
    logits = np.log(probs)[None]
    lab = np.asarray(labels, np.int32)[None]
    loss = ctc_loss(
        jnp.asarray(logits), jnp.asarray([t]),
        jnp.asarray(lab if lab.size else np.zeros((1, 1), np.int32)),
        jnp.asarray([len(labels)]),
    )
    return -float(loss[0])


def test_matches_brute_force_oracle():
    """With a huge beam and no scorer, the decoder must find the label
    sequence with the highest total CTC probability."""
    rng = np.random.RandomState(5)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    for trial in range(4):
        probs = softmax(rng.randn(5, n_class) * 2.0)
        best_seq, best_lp = None, -np.inf
        for length in range(0, 5):
            for seq in itertools.product(range(alphabet.size), repeat=length):
                lp = sequence_log_prob(probs, list(seq))
                if lp > best_lp:
                    best_seq, best_lp = list(seq), lp
        [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=300)
        assert res.tokens == best_seq, (trial, res.tokens, best_seq)
        assert res.confidence == pytest.approx(best_lp, abs=1e-3)


def test_agrees_with_greedy_on_sharp_probs():
    rng = np.random.RandomState(0)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = softmax(rng.randn(20, n_class) * 12.0)  # nearly one-hot
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=16)
    [(greedy_tokens, _)] = greedy_decode(jnp.asarray(np.log(probs))[None])
    assert res.tokens == greedy_tokens


def test_streaming_chunks_equal_one_shot():
    rng = np.random.RandomState(1)
    alphabet = make_alphabet()
    probs = softmax(rng.randn(30, alphabet.size + 1) * 2.0)

    one = ctc_beam_search_decoder(probs, alphabet, beam_size=32, num_results=4)

    state = DecoderState(alphabet, beam_size=32)
    for start in range(0, 30, 7):
        state.next(probs[start : start + 7])
        state.decode()  # intermediate decode must be non-destructive
    chunked = state.decode(num_results=4)

    for a, b in zip(one, chunked):
        assert a.tokens == b.tokens
        assert a.timesteps == b.timesteps
        assert a.confidence == pytest.approx(b.confidence, abs=1e-6)


def test_leading_silence_delays_timesteps():
    """Frames of near-certain blank before speech must not shift token
    timings (the 0.999 expansion gate)."""
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = np.full((8, n_class), 1e-6)
    probs[:, -1] = 1.0  # silence
    probs[5] = 1e-6
    probs[5, 1] = 1.0  # 'a' at frame 5
    probs /= probs.sum(-1, keepdims=True)
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=8)
    assert res.tokens == [1]
    assert res.timesteps == [5]


def test_scorer_rescues_ambiguous_word():
    """LM prefers 'ab' over acoustically tied 'aa'."""
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    # "a?" then space; second char evenly split between a and b
    rows = [
        [0.01, 0.97, 0.01, 0.01],   # a
        [0.01, 0.495, 0.495, 0.0],  # a/b tied (blank tiny)
        [0.97, 0.01, 0.01, 0.01],   # space
        [0.01, 0.01, 0.01, 0.97],   # blank
    ]
    probs = np.asarray(rows) / np.asarray(rows).sum(-1, keepdims=True)
    scorer = StaticScorer(
        {("ab",): math.log(0.9), ("a",): math.log(1e-4)},
        max_order=2, alpha=2.0, beta=0.0,
    )
    [res] = ctc_beam_search_decoder(
        probs, alphabet, beam_size=16, scorer=scorer
    )
    assert res.transcript == "ab "
    # acoustically, the merged single-'a' path carries the most mass
    [res_no_lm] = ctc_beam_search_decoder(probs, alphabet, beam_size=16)
    assert res_no_lm.transcript == "a "


def test_hot_word_boost_changes_winner():
    alphabet = make_alphabet()
    rows = [
        [0.01, 0.52, 0.46, 0.01],  # leans 'a'
        [0.97, 0.01, 0.01, 0.01],  # space
        [0.01, 0.01, 0.01, 0.97],  # blank
    ]
    probs = np.asarray(rows) / np.asarray(rows).sum(-1, keepdims=True)
    scorer = StaticScorer(
        {("a",): math.log(0.5), ("b",): math.log(0.5)},
        max_order=2, alpha=1.0, beta=0.0,
    )
    [plain] = ctc_beam_search_decoder(probs, alphabet, beam_size=16, scorer=scorer)
    assert plain.transcript == "a "
    [boosted] = ctc_beam_search_decoder(
        probs, alphabet, beam_size=16, scorer=scorer, hot_words={"b": 8.0}
    )
    assert boosted.transcript == "b "


def test_dictionary_constrains_expansion():
    alphabet = make_alphabet()
    rows = [
        [0.01, 0.01, 0.97, 0.01],   # b
        [0.01, 0.01, 0.97, 0.01],   # b
        [0.97, 0.01, 0.01, 0.01],   # space
        [0.01, 0.01, 0.01, 0.97],
    ]
    probs = np.asarray(rows) / np.asarray(rows).sum(-1, keepdims=True)
    scorer = StaticScorer(
        {("ab",): math.log(0.9)}, max_order=2, alpha=1.0, beta=0.0,
        vocabulary=["ab", "aa"], alphabet=alphabet,
    )
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=16, scorer=scorer)
    # 'b' can only appear as second char of 'ab' in the vocabulary
    assert "bb" not in res.transcript
    assert res.transcript.strip() in ("ab", "aa", "")


def test_utf8_bytes_mode_roundtrip():
    """Bytes-output mode: multi-byte codepoints decode correctly."""
    alphabet = UTF8Alphabet()
    text = "дa"  # 2-byte cyrillic + ascii
    byte_labels = alphabet.encode(text)
    n_class = alphabet.size + 1
    probs = np.full((len(byte_labels) + 1, n_class), 1e-9)
    for t, lab in enumerate(byte_labels):
        probs[t, lab] = 1.0
    probs[-1, -1] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=8)
    assert res.transcript == text


def test_batch_decoder():
    rng = np.random.RandomState(2)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    batch = [softmax(rng.randn(12, n_class)) for _ in range(4)]
    lens = [12, 10, 8, 12]
    serial = ctc_beam_search_decoder_batch(batch, lens, alphabet, 16)
    threaded = ctc_beam_search_decoder_batch(
        batch, lens, alphabet, 16, num_processes=4
    )
    for a, b in zip(serial, threaded):
        assert a[0].tokens == b[0].tokens


def test_top_n_results_ordered():
    rng = np.random.RandomState(3)
    alphabet = make_alphabet()
    probs = softmax(rng.randn(10, alphabet.size + 1))
    results = ctc_beam_search_decoder(probs, alphabet, 32, num_results=5)
    assert len(results) == 5
    confidences = [r.confidence for r in results]
    assert confidences == sorted(confidences, reverse=True)
    assert len({tuple(r.tokens) for r in results}) == 5
