"""StreamPool: batched multi-stream serving equals independent streams."""

import numpy as np
import pytest

from stt_tpu.artifact import build_metadata, save_artifact
from stt_tpu.serve import Model
from stt_tpu.serve.pool import StreamPool

from conftest import SMOKE_TRANSCRIPT


@pytest.fixture(scope="module")
def pool_model(trained_smoke, tmp_path_factory):
    params, config, feature_config, alphabet, audio = trained_smoke
    meta = build_metadata(config, feature_config, alphabet, beam_width=32)
    out = save_artifact(
        str(tmp_path_factory.mktemp("pool") / "model"), params, meta, alphabet
    )
    return Model(out), audio


def test_pooled_equals_single(pool_model):
    model, audio = pool_model
    single = model.create_stream()
    single.feed_audio_content(audio)
    expected = single.finish_stream()
    assert expected == SMOKE_TRANSCRIPT

    pool = StreamPool(model, max_streams=4)
    s1 = pool.create_stream()
    s2 = pool.create_stream()
    noise = (np.random.RandomState(0).randn(len(audio)) * 0.01).astype(
        np.float32
    )
    # interleave feeds in awkward sizes
    for start in range(0, len(audio), 3001):
        s1.feed_audio_content(audio[start : start + 3001])
        if start < len(audio) // 2:
            s2.feed_audio_content(noise[start : start + 3001])
    out1 = s1.finish_stream()
    out2 = s2.finish_stream()
    assert out1 == SMOKE_TRANSCRIPT
    assert out2 != SMOKE_TRANSCRIPT


def test_pool_slot_reuse_and_exhaustion(pool_model):
    model, audio = pool_model
    pool = StreamPool(model, max_streams=2)
    a = pool.create_stream()
    b = pool.create_stream()
    with pytest.raises(RuntimeError, match="exhausted"):
        pool.create_stream()
    a.feed_audio_content(audio[:8000])
    a.finish_stream()  # releases the slot
    c = pool.create_stream()  # reuses it
    c.feed_audio_content(audio)
    assert c.finish_stream() == SMOKE_TRANSCRIPT


def test_pool_staggered_lifetimes(pool_model):
    """Streams created mid-flight of others stay correct."""
    model, audio = pool_model
    pool = StreamPool(model, max_streams=4)
    s1 = pool.create_stream()
    s1.feed_audio_content(audio[: len(audio) // 2])
    s2 = pool.create_stream()  # created later, fresh state
    for start in range(0, len(audio), 5000):
        s2.feed_audio_content(audio[start : start + 5000])
    s1.feed_audio_content(audio[len(audio) // 2 :])
    assert s1.finish_stream() == SMOKE_TRANSCRIPT
    assert s2.finish_stream() == SMOKE_TRANSCRIPT
