"""FLAC decoder: bit-exact against the lossless WAV twin; CSV sources
accept .flac audio (run-ci-ldc93s1-flac.sh parity)."""

import os

import numpy as np
import pytest

SMOKE = "/root/reference/data/smoke_test"


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(SMOKE, "LDC93S1.flac")),
    reason="flac fixture missing",
)
def test_flac_bit_exact_vs_wav():
    from stt_tpu.data.audio import read_wav
    from stt_tpu.data.flac import read_flac

    fa, fr = read_flac(os.path.join(SMOKE, "LDC93S1.flac"))
    wa, wr = read_wav(os.path.join(SMOKE, "LDC93S1.wav"))
    assert fr == wr == 16000
    assert fa.shape == wa.shape
    np.testing.assert_array_equal(fa, wa)


def test_flac_csv_source():
    from stt_tpu.data.sources import CSVSource

    path = os.path.join(SMOKE, "ldc93s1_flac.csv")
    if not os.path.isfile(path):
        pytest.skip("flac csv missing")
    [sample] = list(CSVSource(path))
    assert sample.rate == 16000
    assert sample.audio.shape[0] == 46797
    assert "dark suit" in sample.transcript


def test_unsupported_format_message():
    from stt_tpu.data.audio import read_audio

    with pytest.raises(ValueError, match="unsupported audio format"):
        read_audio("x.aac")
