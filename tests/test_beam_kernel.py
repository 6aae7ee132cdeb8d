"""Equivalence gate: the fused Pallas beam kernel vs the XLA device scan.

The kernel (stt_tpu/ops/beam_kernel.py) must reproduce the XLA twin
(stt_tpu/decode/device.py::_device_beam_scan) bit-for-bit on the
backpointer tables — same expansion, same merges, same tie-breaking —
because both mirror the host oracle (decode/beam.py, itself gated
against /root/reference/native_client/ctcdecode behavior). Runs the
kernel in Pallas interpret mode so the CPU suite covers it; the same
code path compiles for TPU unchanged.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stt_tpu.decode import device  # noqa: E402
from stt_tpu.ops import beam_kernel  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(beam_kernel, "_INTERPRET", True)


def _compare(B, T, C, W, cutoff_top_n=40, cutoff_prob=1.0, seed=0,
             peaky=False, blank_id=None, ignored=()):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    if peaky:
        logits = logits * 4.0
        logits[:, ::3, -1] += 6.0  # frequent strong blanks
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    lens = np.full((B,), T, np.int32)
    lens[0] = max(1, T - 3)  # exercise masked padding frames
    s_x, src_x, char_x = jax.tree.map(
        np.asarray,
        device._device_beam_scan(
            jnp.asarray(probs), jnp.asarray(lens), W, cutoff_top_n,
            cutoff_prob, blank_id, tuple(ignored),
        ),
    )
    _, s_k, packed = beam_kernel.beam_scan(
        probs, lens, W, cutoff_top_n, cutoff_prob, blank_id, tuple(ignored)
    )
    s_k = np.asarray(s_k)
    src_k, char_k = beam_kernel.unpack_bp(np.asarray(packed))
    np.testing.assert_array_equal(src_x, src_k)
    np.testing.assert_array_equal(char_x, char_k)
    assert np.allclose(s_x, s_k, atol=1e-4, rtol=1e-4, equal_nan=True)


def test_basic_small():
    _compare(2, 12, 8, 8)


def test_alphabet_geometry_peaky():
    _compare(2, 24, 29, 16, seed=2, peaky=True)


def test_cutoff_prob_path():
    _compare(2, 16, 29, 24, cutoff_top_n=10, cutoff_prob=0.9, seed=4)


def test_sort_only_top_n_path():
    _compare(1, 16, 29, 16, cutoff_top_n=20, seed=5)


def test_wav2vec2_class_layout():
    _compare(2, 16, 32, 16, seed=6, blank_id=0, ignored=(1, 2))


def test_streaming_chunks_match_offline():
    """Chunked kernel decode (state carry) == one-shot decode."""
    from stt_tpu.alphabet import Alphabet

    rng = np.random.default_rng(7)
    C, T, W = 8, 24, 8
    labels = [chr(ord("a") + i) for i in range(C - 1)]
    alphabet = Alphabet().init_from_labels(labels)
    probs = np.asarray(
        jax.nn.softmax(jnp.asarray(rng.normal(size=(T, C)).astype(np.float32) * 3.0), -1)
    )
    offline = device.ctc_beam_search_decoder_device(
        probs[None], [T], alphabet, beam_size=W, num_results=2
    )[0]
    dec = device.DeviceStreamingDecoder(alphabet, beam_size=W)
    for i in range(0, T, 6):
        dec.next(probs[i : i + 6])
    chunked = dec.decode(num_results=2)
    assert dec._use_kernel is True
    assert [r.transcript for r in chunked] == [r.transcript for r in offline]
    assert [r.timesteps for r in chunked] == [r.timesteps for r in offline]
    np.testing.assert_allclose(
        [r.confidence for r in chunked],
        [r.confidence for r in offline],
        atol=1e-4,
    )


def test_supports_bounds():
    assert beam_kernel.supports(128, 127)
    assert not beam_kernel.supports(129, 29)
    assert not beam_kernel.supports(64, 256)  # bytes mode falls back
