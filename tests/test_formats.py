"""NIST SPHERE reader/writer and Ogg container prober."""

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


def test_ogg_probe_rejects_non_ogg(tmp_path):
    p = tmp_path / "x.ogg"
    p.write_bytes(b"not an ogg at all")
    with pytest.raises(ValueError):
        probe_ogg_file(str(p))
