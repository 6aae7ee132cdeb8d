"""End-to-end smoke: overfit LDC93S1 and decode the exact transcript.

This is the framework's version of the reference's own v0 gate
(bin/run-ldc93s1.sh: tiny n_hidden=100 model, 1 utterance, exact decode
"she had your dark suit in greasy wash water all year",
ci_scripts/asserts.sh:189-199).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.alphabet import Alphabet
from stt_tpu.ctc import greedy_decode
from stt_tpu.data import read_wav
from stt_tpu.frontend import audio_to_mfcc
from stt_tpu.models import ModelConfig, init_params
from stt_tpu.train import Batch, create_train_state, make_eval_step, make_train_step
from stt_tpu.train.step import create_optimizer

TRANSCRIPT = "she had your dark suit in greasy wash water all year"


@pytest.fixture(scope="module")
def smoke_batch(request):
    wav = "/root/reference/data/smoke_test/LDC93S1.wav"
    if not os.path.isfile(wav):
        pytest.skip("smoke wav missing")
    audio, rate = read_wav(wav)
    assert rate == 16000
    feats = np.asarray(audio_to_mfcc(jnp.asarray(audio)))
    alphabet = Alphabet("/root/reference/data/alphabet.txt")
    labels = np.asarray(alphabet.encode(TRANSCRIPT), np.int32)
    batch = Batch(
        features=jnp.asarray(feats[None]),
        feature_lengths=jnp.asarray([feats.shape[0]], np.int32),
        labels=jnp.asarray(labels[None]),
        label_lengths=jnp.asarray([len(labels)], np.int32),
    )
    return batch, alphabet


def test_overfit_and_decode(smoke_batch):
    batch, alphabet = smoke_batch
    config = ModelConfig(
        n_hidden=100,
        n_cell_dim=100,
        n_out=alphabet.size + 1,
        dropout_rates=(0.0,) * 6,
    )
    optimizer = create_optimizer(learning_rate=0.001)
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer)
    rng = jax.random.PRNGKey(42)

    first_loss = None
    loss = None
    for i in range(600):
        state, metrics = train_step(state, batch, rng)
        if i == 0:
            first_loss = float(metrics.loss)
            assert np.isfinite(first_loss)
        loss = float(metrics.loss)
        if loss < 1.0:
            break
    assert loss < 1.0, f"failed to overfit: first {first_loss}, last {loss}"

    eval_step = make_eval_step(config)
    losses, logits = eval_step(state.params, batch)
    [(tokens, steps)] = greedy_decode(logits, batch.feature_lengths)
    decoded = alphabet.decode(tokens)
    assert decoded == TRANSCRIPT, decoded
    # timesteps are monotonically increasing frame indices
    assert all(b > a for a, b in zip(steps, steps[1:]))
    assert float(losses[0]) < 1.0

    # beam search without LM agrees
    from stt_tpu.decode import ctc_beam_search_decoder

    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    [beam_res] = ctc_beam_search_decoder(probs, alphabet, beam_size=64)
    assert beam_res.transcript == TRANSCRIPT

    # beam search with the REFERENCE .scorer package (KenLM + FST trie)
    scorer_path = "/root/reference/data/smoke_test/pruned_lm.scorer"
    if os.path.isfile(scorer_path):
        from stt_tpu.decode.scorer_package import KenLMScorer

        scorer = KenLMScorer(scorer_path, alpha=0.75, beta=1.85)
        [lm_res] = ctc_beam_search_decoder(
            probs, alphabet, beam_size=64, scorer=scorer
        )
        assert lm_res.transcript == TRANSCRIPT
