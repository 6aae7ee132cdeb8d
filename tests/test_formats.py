"""NIST SPHERE reader/writer and Ogg container prober."""

import os

import numpy as np
import pytest

from stt_tpu.data.ogg import probe_ogg_file, read_ogg_opus_duration
from stt_tpu.data.sph import read_sph, sph_to_wav, write_sph

SMOKE = "/root/reference/data/smoke_test"


@pytest.fixture()
def tone():
    t = np.arange(8000) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_sph_pcm_round_trip(tmp_path, tone):
    for big_endian in (False, True):
        p = str(tmp_path / f"t_{big_endian}.sph")
        write_sph(p, tone, 16000, big_endian=big_endian)
        audio, rate = read_sph(p)
        assert rate == 16000
        np.testing.assert_allclose(audio, tone, atol=1 / 32768)


def test_sph_ulaw(tmp_path, tone):
    p = str(tmp_path / "t.sph")
    write_sph(p, tone, 8000, coding="ulaw")
    audio, rate = read_sph(p)
    assert rate == 8000
    # mu-law is 8-bit log companding: ~2% amplitude accuracy
    np.testing.assert_allclose(audio, tone, atol=0.02)


def test_sph_stereo_and_to_wav(tmp_path, tone):
    from stt_tpu.data.audio import read_wav

    stereo = np.stack([tone, -tone], axis=-1)
    p = str(tmp_path / "st.sph")
    write_sph(p, stereo, 16000)
    audio, rate = read_sph(p)
    assert audio.shape == (len(tone), 2)
    np.testing.assert_allclose(audio[:, 0], tone, atol=1 / 32768)

    wav = str(tmp_path / "ch0.wav")
    sph_to_wav(p, wav, channel=0)
    out, rate = read_wav(wav)
    assert rate == 16000
    np.testing.assert_allclose(out, tone, atol=2 / 32768)


def test_sph_rejects_shorten(tmp_path, tone):
    p = str(tmp_path / "t.sph")
    write_sph(p, tone, 16000)
    data = open(p, "rb").read().replace(
        b"sample_coding -s3 pcm", b"sample_coding -s24 pcm,embedded-shorten-"
    )
    open(p, "wb").write(data)
    with pytest.raises(ValueError, match="shorten"):
        read_sph(p)


def test_ogg_probe_matches_wav_duration():
    import wave

    with wave.open(f"{SMOKE}/LDC93S1.wav") as w:
        expect = w.getnframes() / w.getframerate()

    opus = probe_ogg_file(f"{SMOKE}/LDC93S1.opus")
    assert opus.codec == "opus" and opus.channels == 1
    assert opus.duration_seconds == pytest.approx(expect, abs=1e-3)
    assert read_ogg_opus_duration(f"{SMOKE}/LDC93S1.opus") == pytest.approx(
        expect, abs=1e-3
    )

    vorbis = probe_ogg_file(f"{SMOKE}/LDC93S1.ogg")
    assert vorbis.codec == "vorbis"
    assert vorbis.duration_seconds == pytest.approx(expect, abs=1e-3)


def test_vorbis_decode_matches_source():
    """Pure-Python Vorbis decode of the smoke .ogg must reconstruct the
    (lossy-encoded) source waveform: exact sample count and >0.99
    correlation against the resampled source wav."""
    import wave

    from stt_tpu.data.audio import resample
    from stt_tpu.data.vorbis import read_vorbis

    audio, rate = read_vorbis(f"{SMOKE}/LDC93S1.ogg")
    assert rate == 8000
    with wave.open(f"{SMOKE}/LDC93S1.wav") as w:
        src = (
            np.frombuffer(w.readframes(w.getnframes()), np.int16).astype(
                np.float32
            )
            / 32768
        )
    src8 = resample(src, 16000, 8000)
    assert len(audio) == len(src8)
    corr = np.corrcoef(audio, src8)[0, 1]
    assert corr > 0.99, corr
    assert np.sqrt((audio**2).mean()) == pytest.approx(
        np.sqrt((src8**2).mean()), rel=0.02
    )


def test_read_audio_dispatch_ogg_and_sph(tmp_path, tone):
    from stt_tpu.data.audio import read_audio

    audio, rate = read_audio(f"{SMOKE}/LDC93S1.ogg", desired_rate=16000)
    assert rate == 16000 and len(audio) > 40000

    p = str(tmp_path / "t.sph")
    write_sph(p, tone, 16000)
    audio, rate = read_audio(p)
    assert rate == 16000
    np.testing.assert_allclose(audio, tone, atol=1 / 32768)

    # .opus now dispatches through libopus (tests/test_opus_mp3.py); an
    # unknown extension still raises with the supported-format list
    with pytest.raises(ValueError, match="unsupported audio format"):
        read_audio(f"{SMOKE}/LDC93S1.aiff")


def test_vorbis_stereo_44k():
    """A 44.1 kHz stereo Vorbis file (channel coupling, long/short
    blocks): decoded length must equal the container's granule count."""
    from stt_tpu.data.ogg import probe_ogg_file
    from stt_tpu.data.vorbis import read_vorbis

    path = "/root/reference/tests/Example.ogg"
    if not os.path.isfile(path):
        pytest.skip("stereo ogg fixture missing")
    audio, rate = read_vorbis(path)
    info = probe_ogg_file(path)
    assert rate == info.sample_rate == 44100
    assert audio.ndim == 2 and audio.shape[1] == info.channels == 2
    assert len(audio) == int(info.duration_seconds * rate)
    assert np.isfinite(audio).all()
    assert 0.005 < np.sqrt((audio**2).mean()) < 0.5


def test_vorbis_csv_through_data_layer():
    """The reference CI's ldc93s1_vorbis.csv (run-ci-ldc93s1 vorbis
    variant) flows through the data layer: sample loads, features have
    the training geometry."""
    import jax.numpy as jnp

    from stt_tpu.alphabet import Alphabet
    from stt_tpu.data.feeding import create_batches
    from stt_tpu.frontend import FeatureConfig

    alphabet = Alphabet("/root/reference/data/alphabet.txt")
    batches = list(
        create_batches(
            [f"{SMOKE}/ldc93s1_vorbis.csv"], alphabet, FeatureConfig(),
            batch_size=1, train_phase=False,
        )
    )
    assert len(batches) == 1
    batch, ids = batches[0]
    assert batch.features.shape[-1] == 26
    assert int(batch.feature_lengths[0]) > 100
    assert bool(jnp.isfinite(batch.features).all())
    text = alphabet.decode(
        np.asarray(batch.labels[0][: int(batch.label_lengths[0])])
    )
    assert text == "she had your dark suit in greasy wash water all year"


def test_ogg_probe_rejects_non_ogg(tmp_path):
    p = tmp_path / "x.ogg"
    p.write_bytes(b"not an ogg at all")
    with pytest.raises(ValueError):
        probe_ogg_file(str(p))
