"""End-to-end smoke: overfit LDC93S1 and decode the exact transcript.

This is the framework's version of the reference's own v0 gate
(bin/run-ldc93s1.sh + ci_scripts/asserts.sh:189-199). The training run
itself lives in the session fixture `trained_smoke` (conftest.py).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from stt_tpu.ctc import greedy_decode
from stt_tpu.decode import ctc_beam_search_decoder
from stt_tpu.models import apply_model

from conftest import SMOKE_TRANSCRIPT


def _logits(trained_smoke):
    params, config, feature_config, alphabet, audio = trained_smoke
    from stt_tpu.frontend import audio_to_mfcc

    feats = audio_to_mfcc(jnp.asarray(audio), feature_config)[None]
    lengths = jnp.asarray([feats.shape[1]], np.int32)
    logits, _ = apply_model(params, feats, seq_len=lengths, config=config)
    return logits, lengths, alphabet


def test_greedy_decode_exact_transcript(trained_smoke):
    logits, lengths, alphabet = _logits(trained_smoke)
    [(tokens, steps)] = greedy_decode(logits, lengths)
    assert alphabet.decode(tokens) == SMOKE_TRANSCRIPT
    assert all(b > a for a, b in zip(steps, steps[1:]))


def test_beam_decode_exact_transcript(trained_smoke):
    logits, lengths, alphabet = _logits(trained_smoke)
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=64)
    assert res.transcript == SMOKE_TRANSCRIPT


def test_beam_decode_with_reference_scorer(trained_smoke):
    scorer_path = "/root/reference/data/smoke_test/pruned_lm.scorer"
    if not os.path.isfile(scorer_path):
        import pytest

        pytest.skip("scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    logits, lengths, alphabet = _logits(trained_smoke)
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    scorer = KenLMScorer(scorer_path, alpha=0.75, beta=1.85)
    [res] = ctc_beam_search_decoder(probs, alphabet, beam_size=64, scorer=scorer)
    assert res.transcript == SMOKE_TRANSCRIPT
