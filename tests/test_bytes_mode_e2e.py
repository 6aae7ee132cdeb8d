"""Bytes-output-mode end-to-end: train with the UTF-8 byte alphabet and
decode with the reference's bytes scorer
(run-ci-ldc93s1_checkpoint_bytes.sh parity)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.alphabet import UTF8Alphabet
from stt_tpu.ctc import greedy_decode
from stt_tpu.data import read_wav
from stt_tpu.decode import ctc_beam_search_decoder
from stt_tpu.frontend import FeatureConfig, audio_to_mfcc
from stt_tpu.models import ModelConfig
from stt_tpu.train import Batch, create_train_state, make_eval_step, make_train_step
from stt_tpu.train.step import create_optimizer

from conftest import SMOKE_TRANSCRIPT

BYTES_SCORER = "/root/reference/data/smoke_test/pruned_lm.bytes.scorer"


@pytest.fixture(scope="module")
def bytes_model(smoke_wav):
    audio, rate = read_wav(smoke_wav)
    feats = np.asarray(audio_to_mfcc(jnp.asarray(audio), FeatureConfig()))
    alphabet = UTF8Alphabet()
    labels = np.asarray(alphabet.encode(SMOKE_TRANSCRIPT), np.int32)
    batch = Batch(
        features=jnp.asarray(feats[None]),
        feature_lengths=jnp.asarray([feats.shape[0]], np.int32),
        labels=jnp.asarray(labels[None]),
        label_lengths=jnp.asarray([len(labels)], np.int32),
    )
    config = ModelConfig(
        n_hidden=100, n_cell_dim=100, n_out=alphabet.size + 1,  # 256 classes
        dropout_rates=(0.0,) * 6,
    )
    optimizer = create_optimizer(learning_rate=0.002)
    state = create_train_state(jax.random.PRNGKey(1), config, optimizer)
    train_step = make_train_step(config, optimizer)
    rng = jax.random.PRNGKey(7)
    loss = None
    for _ in range(700):
        state, metrics = train_step(state, batch, rng)
        loss = float(metrics.loss)
        if loss < 0.5:
            break
    assert loss < 1.5, loss
    eval_step = make_eval_step(config)
    _, logits = eval_step(state.params, batch)
    return logits, batch.feature_lengths, alphabet


def test_bytes_greedy_decode(bytes_model):
    logits, lengths, alphabet = bytes_model
    [(tokens, _)] = greedy_decode(logits, lengths)
    assert alphabet.decode(tokens) == SMOKE_TRANSCRIPT


def test_bytes_beam_decode(bytes_model):
    logits, lengths, alphabet = bytes_model
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    [res] = ctc_beam_search_decoder(
        probs, alphabet, beam_size=32, implementation="python"
    )
    assert res.transcript == SMOKE_TRANSCRIPT


def test_bytes_beam_with_reference_bytes_scorer(bytes_model):
    if not os.path.isfile(BYTES_SCORER):
        pytest.skip("bytes scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    logits, lengths, alphabet = bytes_model
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    scorer = KenLMScorer(BYTES_SCORER, alpha=0.75, beta=1.85)
    assert scorer.is_utf8_mode()
    [res] = ctc_beam_search_decoder(
        probs, alphabet, beam_size=32, scorer=scorer, implementation="python"
    )
    # this reference scorer's dictionary holds single codepoints and no
    # space token, so spaces are pruned by the vocabulary constraint —
    # identical behavior in the reference decoder (its bytes CI never
    # gates transcripts with this scorer, run-ci-ldc93s1_checkpoint_bytes.sh)
    from stt_tpu.text import levenshtein

    got = res.transcript.replace(" ", "")
    want = SMOKE_TRANSCRIPT.replace(" ", "")
    assert levenshtein(got, want) <= 2, got
