"""Opus and MP3 codec paths (ctypes over system libopus / libmpg123).

Parity targets: the reference decodes Ogg Opus via pyogg
(util/audio.py:426-460), stores Opus-in-SDB blobs
(util/audio.py:379-423), and implements the Codec augmentation as a
lossy Opus round trip (util/augmentations.py:366-383). These tests skip
cleanly when the system libraries are absent.
"""

import ctypes
import io

import numpy as np
import pytest

from stt_tpu.data.audio import read_audio, read_wav
from stt_tpu.data.opus import opus_available

SMOKE = "/root/reference/data/smoke_test"

needs_opus = pytest.mark.skipif(not opus_available(), reason="libopus absent")


def _mp3_available():
    from stt_tpu.data.mp3 import mp3_available

    return mp3_available()


def _lame_available():
    try:
        ctypes.CDLL("libmp3lame.so.0")
        return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def wav():
    audio, rate = read_wav(f"{SMOKE}/LDC93S1.wav")
    assert rate == 16000
    return audio


@needs_opus
def test_ogg_opus_decode_matches_wav(wav):
    audio, rate = read_audio(f"{SMOKE}/LDC93S1.opus", desired_rate=16000)
    assert rate == 16000
    # RFC 7845 pre-skip/granule trimming must give the exact duration
    assert audio.shape == wav.shape
    corr = np.corrcoef(audio, wav)[0, 1]
    assert corr > 0.95, corr


@needs_opus
def test_opus_sdb_round_trip(tmp_path, wav):
    from stt_tpu.data.sources import SDBSource, SDBWriter, Sample

    path = str(tmp_path / "test.sdb")
    with SDBWriter(path, labeled=True, audio_type="opus", bitrate=64000) as w:
        w.add(Sample(sample_id="a", transcript="hello", _audio=wav, _rate=16000))
    src = SDBSource(path)
    assert len(src) == 1
    sample = src[0]
    assert sample.transcript == "hello"
    assert sample.rate == 16000
    assert len(sample.audio) == len(wav)
    # Opus adds its fixed lookahead delay (~6.5 ms = 104 samples @16k);
    # the reference's read_opus leaves it in too (audio.py:410-423)
    corr = np.corrcoef(sample.audio[104 : 104 + 20000], wav[:20000])[0, 1]
    assert corr > 0.99, corr


@needs_opus
def test_codec_augmentation_round_trip(wav):
    from stt_tpu.data.augmentations import parse_augmentations
    from stt_tpu.data.sources import Sample

    (aug,) = parse_augmentations(["codec[p=1.0,bitrate=32000]"])
    sample = Sample(sample_id="x", _audio=wav.copy(), _rate=16000)
    aug.apply(sample, clock=0.5, rng=np.random.default_rng(0))
    out = np.asarray(sample.audio)
    assert out.shape == wav.shape
    assert out.dtype == np.float32
    # lossy but recognisable at 32 kbit/s (allow the codec delay shift)
    corr = np.corrcoef(out[104 : 104 + 20000], wav[:20000])[0, 1]
    assert corr > 0.9, corr
    # and genuinely lossy — not a pass-through
    assert not np.array_equal(out, wav)


@needs_opus
def test_opus_raw_packet_encode_decode():
    from stt_tpu.data.opus import OpusDecoder, OpusEncoder

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(960) * 3000).astype(np.int16)
    enc = OpusEncoder(16000, 1, bitrate=64000)
    packet = enc.encode(pcm, 960)
    assert 0 < len(packet) < 4000
    dec = OpusDecoder(16000, 1)
    out = dec.decode(packet, max_frame=960)
    assert out.shape == (960, 1)


@pytest.mark.skipif(
    not (_mp3_available() and _lame_available()),
    reason="libmpg123/libmp3lame absent",
)
def test_mp3_decode(tmp_path, wav):
    # encode a test mp3 through libmp3lame, decode through libmpg123
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, 16000)
    lame.lame_set_num_channels(gf, 1)
    lame.lame_set_brate(gf, 64)
    lame.lame_set_mode(gf, 3)  # mono
    lame.lame_init_params(gf)
    pcm = np.clip(wav * 32768, -32768, 32767).astype(np.int16)
    out = ctypes.create_string_buffer(len(pcm) * 2 + 7200)
    lame.lame_encode_buffer.restype = ctypes.c_int
    n = lame.lame_encode_buffer(
        gf,
        pcm.ctypes.data_as(ctypes.c_void_p),
        pcm.ctypes.data_as(ctypes.c_void_p),
        len(pcm),
        out,
        len(out),
    )
    n += lame.lame_encode_flush(gf, ctypes.byref(out, n), len(out) - n)
    mp3_path = tmp_path / "test.mp3"
    mp3_path.write_bytes(out.raw[:n])

    audio, rate = read_audio(str(mp3_path), desired_rate=16000)
    assert rate == 16000
    # mp3 pads with encoder+decoder delay; correlate at the best lag
    best = max(
        np.corrcoef(audio[lag : lag + 20000], wav[:20000])[0, 1]
        for lag in range(1600, 1800)
    )
    assert best > 0.99, best
