"""Flashlight-style lexicon / lexicon-free decoder tests."""

import numpy as np
import pytest

import jax

from stt_tpu.decode.flashlight import (
    LexiconFreeDecoder,
    WordLM,
    build_lexicon_trie,
    flashlight_beam_search_decoder,
)

from conftest import SMOKE_TRANSCRIPT

SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"


@pytest.fixture(scope="module")
def smoke_logprobs(trained_smoke):
    import jax.numpy as jnp
    from stt_tpu.frontend import audio_to_mfcc
    from stt_tpu.models import apply_model

    params, config, feature_config, alphabet, audio = trained_smoke
    feats = audio_to_mfcc(jnp.asarray(audio), feature_config)[None]
    lengths = jnp.asarray([feats.shape[1]], np.int32)
    logits, _ = apply_model(params, feats, seq_len=lengths, config=config)
    return np.asarray(jax.nn.log_softmax(logits[0], axis=-1)), alphabet


@pytest.fixture(scope="module")
def scorer():
    import os

    if not os.path.isfile(SCORER):
        pytest.skip("scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    return KenLMScorer(SCORER)


def test_trie_smearing(scorer):
    from stt_tpu.alphabet import Alphabet

    alphabet = Alphabet("/root/reference/data/alphabet.txt")
    lm = WordLM(scorer.lm)
    trie, words = build_lexicon_trie(["she", "shed", "he"], alphabet, lm)
    s_node = trie.root.children[alphabet.encode_single("s")]
    sh = s_node.children[alphabet.encode_single("h")]
    she = sh.children[alphabet.encode_single("e")]
    # smeared max flows upward
    assert s_node.max_score >= she.max_score
    assert np.isfinite(she.max_score)
    assert len(words) == 3


def test_lexicon_decoder_exact_transcript(smoke_logprobs, scorer):
    log_probs, alphabet = smoke_logprobs
    results = flashlight_beam_search_decoder(
        log_probs, alphabet, scorer, decoder_type="lexicon",
        # LM scores are raw log10 (the reference's flashlight unit,
        # scorer.cpp:452-464); weights sized accordingly
        beam_size=128, lm_weight=2.0, word_score=1.0, num_results=3,
    )
    # the toy overfit model's tail confidence varies run to run; the
    # lexicon decoder must recover the transcript within one word
    from stt_tpu.text import levenshtein

    assert levenshtein(results[0].words, SMOKE_TRANSCRIPT.split()) <= 1, (
        results[0].words
    )
    assert results[0].score >= results[-1].score


def test_lexicon_decoder_restricted_vocabulary(smoke_logprobs, scorer):
    """With a vocabulary lacking some words, output stays inside it."""
    log_probs, alphabet = smoke_logprobs
    vocab = ["she", "had", "your", "dark", "suit", "in", "wash",
             "water", "all", "year"]  # no 'greasy'
    results = flashlight_beam_search_decoder(
        log_probs, alphabet, scorer, vocabulary=vocab,
        decoder_type="lexicon", beam_size=128, lm_weight=0.75,
        word_score=1.85,
    )
    assert set(results[0].words) <= set(vocab)


def test_lexicon_free_decoder(smoke_logprobs):
    log_probs, alphabet = smoke_logprobs
    decoder = LexiconFreeDecoder(alphabet, lm=None, beam_size=32)
    decoder.decode_step(log_probs)
    decoder.decode_end()
    [res] = decoder.results(1)
    text = "".join(alphabet.decode_single(t) for t in res.tokens).strip()
    assert text == SMOKE_TRANSCRIPT


def test_lexicon_free_streaming_chunks(smoke_logprobs):
    log_probs, alphabet = smoke_logprobs
    one = LexiconFreeDecoder(alphabet, lm=None, beam_size=16)
    one.decode_step(log_probs)
    one.decode_end()
    chunked = LexiconFreeDecoder(alphabet, lm=None, beam_size=16)
    for start in range(0, log_probs.shape[0], 23):
        chunked.decode_step(log_probs[start : start + 23])
    chunked.decode_end()
    assert one.results(1)[0].tokens == chunked.results(1)[0].tokens
