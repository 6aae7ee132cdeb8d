"""Feature-frontend parity tests against TensorFlow's audio ops — the exact
ops the reference training stack uses (util/feeding.py:51-72)."""

import os
import wave

import numpy as np
import pytest

from stt_tpu.frontend import FeatureConfig, audio_to_mfcc, num_frames, spectrogram

tf = pytest.importorskip("tensorflow")
from tensorflow.python.ops import gen_audio_ops as contrib_audio  # noqa: E402

CONFIG = FeatureConfig()


def tf_features(audio: np.ndarray, config: FeatureConfig = CONFIG):
    spec = contrib_audio.audio_spectrogram(
        audio[:, None],
        window_size=config.window_samples,
        stride=config.step_samples,
        magnitude_squared=True,
    )
    mfcc = contrib_audio.mfcc(
        spectrogram=spec,
        sample_rate=config.sample_rate,
        dct_coefficient_count=config.n_mfcc,
        upper_frequency_limit=config.sample_rate / 2,
    )
    return np.asarray(spec)[0], np.asarray(mfcc)[0]


def read_wav(path):
    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return (pcm / 32768.0).astype(np.float32)


@pytest.mark.parametrize("n_samples", [512, 16000, 16001, 47123])
def test_spectrogram_matches_tf(n_samples):
    rng = np.random.RandomState(7)
    audio = (rng.randn(n_samples) * 0.1).astype(np.float32)
    ref_spec, _ = tf_features(audio)
    got = np.asarray(spectrogram(audio))
    assert got.shape == ref_spec.shape
    np.testing.assert_allclose(got, ref_spec, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n_samples", [512, 16000, 47123])
def test_mfcc_matches_tf(n_samples):
    rng = np.random.RandomState(3)
    audio = (rng.randn(n_samples) * 0.1).astype(np.float32)
    _, ref_mfcc = tf_features(audio)
    got = np.asarray(audio_to_mfcc(audio))
    assert got.shape == ref_mfcc.shape
    np.testing.assert_allclose(got, ref_mfcc, rtol=1e-3, atol=5e-3)


def test_mfcc_matches_tf_on_ldc93s1(smoke_wav):
    audio = read_wav(smoke_wav)
    _, ref_mfcc = tf_features(audio)
    got = np.asarray(audio_to_mfcc(audio))
    np.testing.assert_allclose(got, ref_mfcc, rtol=1e-3, atol=5e-3)


def test_too_short_audio_gives_zero_frames():
    audio = np.zeros(511, np.float32)
    assert spectrogram(audio).shape[0] == 0
    assert int(num_frames(511, 512, 320)) == 0
    assert int(num_frames(512, 512, 320)) == 1


def test_batched_matches_single():
    rng = np.random.RandomState(0)
    a = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    batched = np.asarray(audio_to_mfcc(a))
    for i in range(2):
        single = np.asarray(audio_to_mfcc(a[i]))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_padding_prefix_invariance():
    """Zero-padding on the right must not change the leading valid frames."""
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    padded = np.concatenate([audio, np.zeros(4000, np.float32)])
    n_valid = int(num_frames(16000, CONFIG.window_samples, CONFIG.step_samples))
    a = np.asarray(audio_to_mfcc(audio))[:n_valid]
    b = np.asarray(audio_to_mfcc(padded))[:n_valid]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
