"""Streaming + serve API tests: streamed logits == batch logits, exact
transcripts through Model/Stream, intermediate decodes, metadata timings,
and the concurrent-streams isolation gate
(native_client/test/concurrent_streams.py parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.artifact import build_metadata, save_artifact
from stt_tpu.models import apply_model
from stt_tpu.serve import Model
from stt_tpu.stream.streaming import StreamingRuntime, StreamState

from conftest import SMOKE_TRANSCRIPT


@pytest.fixture(scope="module")
def smoke_model_dir(trained_smoke, tmp_path_factory):
    params, config, feature_config, alphabet, audio = trained_smoke
    meta = build_metadata(config, feature_config, alphabet, beam_width=64)
    out = save_artifact(
        str(tmp_path_factory.mktemp("artifact") / "smoke_model"),
        params, meta, alphabet,
    )
    return out


@pytest.fixture(scope="module")
def smoke_audio(trained_smoke):
    return trained_smoke[4]


def test_streamed_probs_match_batch(trained_smoke):
    params, config, feature_config, alphabet, audio = trained_smoke
    from stt_tpu.frontend import audio_to_mfcc

    feats = audio_to_mfcc(jnp.asarray(audio), feature_config)[None]
    lengths = jnp.asarray([feats.shape[1]], np.int32)
    logits, _ = apply_model(params, feats, seq_len=lengths, config=config)
    batch_probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))

    runtime = StreamingRuntime(params, config, feature_config, alphabet)
    stream = StreamState(runtime, beam_width=16)
    # feed in awkward chunk sizes (prime-ish) to stress buffer boundaries
    for start in range(0, len(audio), 1111):
        stream.feed_audio_content(audio[start : start + 1111])
    stream.finish(1)
    streamed = stream.probs_history
    assert streamed.shape == batch_probs.shape, (
        streamed.shape, batch_probs.shape,
    )
    np.testing.assert_allclose(streamed, batch_probs, rtol=1e-4, atol=1e-5)


def test_model_stt(smoke_model_dir, smoke_audio):
    model = Model(smoke_model_dir)
    assert model.sample_rate() == 16000
    assert model.stt(smoke_audio) == SMOKE_TRANSCRIPT


def test_model_stt_int16(smoke_model_dir, smoke_audio):
    model = Model(smoke_model_dir)
    pcm = np.clip(smoke_audio * 32768.0, -32768, 32767).astype(np.int16)
    assert model.stt(pcm) == SMOKE_TRANSCRIPT


def test_streaming_intermediate_and_finish(smoke_model_dir, smoke_audio):
    model = Model(smoke_model_dir)
    stream = model.create_stream()
    half = len(smoke_audio) // 2
    stream.feed_audio_content(smoke_audio[:half])
    partial = stream.intermediate_decode()
    assert SMOKE_TRANSCRIPT.startswith(partial[: len(partial) // 2])
    stream.feed_audio_content(smoke_audio[half:])
    final = stream.finish_stream()
    assert final == SMOKE_TRANSCRIPT


def test_metadata_timings(smoke_model_dir, smoke_audio):
    model = Model(smoke_model_dir)
    meta = model.stt_with_metadata(smoke_audio, num_results=2)
    assert len(meta.transcripts) >= 1
    best = meta.transcripts[0]
    assert best.transcript == SMOKE_TRANSCRIPT
    times = [t.start_time for t in best.tokens]
    assert times == sorted(times)
    assert times[0] >= 0.0
    assert times[-1] <= len(smoke_audio) / 16000
    # start_time = timestep * 20ms
    for tok in best.tokens:
        assert tok.start_time == pytest.approx(tok.timestep * 0.02)


def test_concurrent_streams_isolated(smoke_model_dir, smoke_audio):
    """Two interleaved streams on one model produce independent correct
    transcripts (concurrent_streams.py:44-54 parity)."""
    model = Model(smoke_model_dir)
    s1 = model.create_stream()
    s2 = model.create_stream()
    noise = (np.random.RandomState(0).randn(len(smoke_audio)) * 0.01).astype(
        np.float32
    )
    for start in range(0, len(smoke_audio), 4000):
        s1.feed_audio_content(smoke_audio[start : start + 4000])
        s2.feed_audio_content(noise[start : start + 4000])
    out1 = s1.finish_stream()
    out2 = s2.finish_stream()
    assert out1 == SMOKE_TRANSCRIPT
    assert out2 != SMOKE_TRANSCRIPT


def test_hot_words_surface(smoke_model_dir, smoke_audio):
    model = Model(smoke_model_dir)
    model.add_hot_word("greasy", 5.0)
    assert model.hot_words == {"greasy": 5.0}
    model.erase_hot_word("greasy")
    model.clear_hot_words()
    assert model.hot_words == {}


def test_scorer_through_serve(smoke_model_dir, smoke_audio):
    import os

    scorer_path = "/root/reference/data/smoke_test/pruned_lm.scorer"
    if not os.path.isfile(scorer_path):
        pytest.skip("scorer missing")
    model = Model(smoke_model_dir)
    model.enable_external_scorer(scorer_path)
    model.set_scorer_alpha_beta(0.75, 1.85)
    assert model.stt(smoke_audio) == SMOKE_TRANSCRIPT
    model.disable_external_scorer()
    assert model.scorer is None
