"""On-device decode path tests (decode/device.py).

Gates, per VERDICT round-2 item 1:
- prune_emissions == the host oracle's per-frame pruning
  (ctc_beam_search_decoder.cpp:328-358 semantics via beam.py);
- DecoderState.next_pruned(prune_emissions(...)) == DecoderState.next(...)
  for both the Python oracle and the native C++ decoder;
- device_beam_search (full expansion/prune on device, no-LM path) matches
  the host oracle on random and smoke-model probabilities.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from stt_tpu.alphabet import Alphabet
from stt_tpu.decode import DecoderState, ctc_beam_search_decoder
from stt_tpu.decode.device import (
    ctc_beam_search_decoder_device,
    device_beam_search,
    prune_emissions,
    rebuild_results,
)

LABELS = [" ", "a", "b", "c"]


def make_alphabet():
    return Alphabet().init_from_labels(LABELS)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


# --------------------------------------------------------------------------
# prune_emissions vs host oracle
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cutoff_top_n,cutoff_prob",
    [(40, 1.0), (3, 1.0), (40, 0.8), (3, 0.9), (2, 0.5)],
)
def test_prune_emissions_matches_oracle(cutoff_top_n, cutoff_prob):
    rng = np.random.RandomState(7)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = softmax(rng.randn(12, n_class) * 2.0).astype(np.float32)

    oracle = DecoderState(
        alphabet, beam_size=8, cutoff_prob=cutoff_prob,
        cutoff_top_n=cutoff_top_n,
    )
    idx, logp, count, blank = prune_emissions(
        probs, cutoff_top_n=cutoff_top_n, cutoff_prob=cutoff_prob
    )
    idx, logp, count, blank = map(np.asarray, (idx, logp, count, blank))
    # reference truncates only via the cumulative-mass loop
    k = min(cutoff_top_n, n_class) if cutoff_prob < 1.0 else n_class
    assert idx.shape == (12, k) and logp.shape == (12, k)

    for t in range(probs.shape[0]):
        ref = oracle._pruned_emissions(probs[t])
        got = [(int(idx[t, j]), float(logp[t, j])) for j in range(count[t])]
        assert [i for i, _ in got] == [i for i, _ in ref]
        np.testing.assert_allclose(
            [p for _, p in got], [p for _, p in ref], rtol=1e-5, atol=1e-5
        )
        assert blank[t] == pytest.approx(probs[t, -1], rel=1e-6)


def _decode_with(state_cls_kwargs, probs, pruned=None):
    alphabet = state_cls_kwargs.pop("alphabet")
    state = DecoderState(alphabet, **state_cls_kwargs)
    if pruned is None:
        state.next(probs)
    else:
        state.next_pruned(*pruned)
    return state.decode(3)


@pytest.mark.parametrize("cutoff_prob,cutoff_top_n", [(1.0, 40), (0.9, 3)])
def test_next_pruned_equals_next_oracle(cutoff_prob, cutoff_top_n):
    rng = np.random.RandomState(11)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = softmax(rng.randn(25, n_class) * 2.5).astype(np.float32)

    full = _decode_with(
        dict(alphabet=alphabet, beam_size=16, cutoff_prob=cutoff_prob,
             cutoff_top_n=cutoff_top_n),
        probs,
    )
    idx, logp, count, blank = prune_emissions(
        probs, cutoff_top_n=cutoff_top_n, cutoff_prob=cutoff_prob
    )
    via_pruned = _decode_with(
        dict(alphabet=alphabet, beam_size=16, cutoff_prob=cutoff_prob,
             cutoff_top_n=cutoff_top_n),
        probs,
        pruned=(np.asarray(idx), np.asarray(logp), np.asarray(count),
                np.asarray(blank)),
    )
    for a, b in zip(full, via_pruned):
        assert a.transcript == b.transcript
        assert a.tokens == b.tokens
        assert a.timesteps == b.timesteps
        # f32 log on device vs f64 math.log on host
        assert a.confidence == pytest.approx(b.confidence, abs=1e-3)


def test_next_pruned_equals_next_native():
    from stt_tpu.decode import native

    if not native.native_available():
        pytest.skip(f"native decoder unavailable: {native.native_build_error()}")
    rng = np.random.RandomState(13)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = softmax(rng.randn(30, n_class) * 2.5).astype(np.float32)

    a = native.NativeDecoderState(alphabet, 16)
    a.next(probs)
    ra = a.decode(3)

    idx, logp, count, blank = prune_emissions(probs, cutoff_top_n=n_class)
    b = native.NativeDecoderState(alphabet, 16)
    b.next_pruned(
        np.asarray(idx), np.asarray(logp), np.asarray(count), np.asarray(blank)
    )
    rb = b.decode(3)
    for x, y in zip(ra, rb):
        assert x.transcript == y.transcript
        assert x.timesteps == y.timesteps
        assert x.confidence == pytest.approx(y.confidence, abs=1e-3)


# --------------------------------------------------------------------------
# full on-device beam search vs host oracle
# --------------------------------------------------------------------------


def _host_results(probs, alphabet, beam, n=3, **kw):
    return ctc_beam_search_decoder(
        probs, alphabet, beam_size=beam, num_results=n,
        implementation="python", **kw,
    )


def test_device_beam_matches_oracle_random():
    rng = np.random.RandomState(3)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    mismatches = 0
    for trial in range(8):
        probs = softmax(
            rng.randn(30, n_class) * (1.5 + 0.5 * trial)
        ).astype(np.float32)
        host = _host_results(probs, alphabet, beam=32, n=1)
        dev = ctc_beam_search_decoder_device(
            [probs], [probs.shape[0]], alphabet, beam_size=32, num_results=1
        )[0]
        if host[0].transcript != dev[0].transcript:
            mismatches += 1
            continue
        assert host[0].tokens == dev[0].tokens
        assert host[0].timesteps == dev[0].timesteps
        assert dev[0].confidence == pytest.approx(
            host[0].confidence, abs=1e-3
        )
    # f32-vs-f64 near-ties may rarely flip the winner; the path must agree
    # on essentially every random instance
    assert mismatches == 0, f"{mismatches}/8 top-1 mismatches"


def test_device_beam_leading_silence_gate():
    """The 0.999-blank delayed-expansion gate must hold on device: leading
    pure-blank frames claim no timesteps."""
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    T = 12
    probs = np.full((T, n_class), 1e-6, np.float32)
    probs[:, -1] = 1.0
    probs[:5, -1] = 0.9999
    # frames 5.. emit 'a' strongly
    probs[5:8, -1] = 0.01
    probs[5:8, 1] = 0.98
    probs = probs / probs.sum(-1, keepdims=True)
    host = _host_results(probs, alphabet, beam=16, n=1)
    dev = ctc_beam_search_decoder_device(
        [probs], [T], alphabet, beam_size=16
    )[0]
    assert dev[0].transcript == host[0].transcript == "a"
    assert dev[0].timesteps == host[0].timesteps


def test_device_beam_batch_with_padding():
    """Mixed-length batch: each utterance decodes as if alone."""
    rng = np.random.RandomState(21)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    lengths = [10, 25, 17]
    items = [
        softmax(rng.randn(t, n_class) * 2.0).astype(np.float32)
        for t in lengths
    ]
    batch_res = ctc_beam_search_decoder_device(
        items, lengths, alphabet, beam_size=24, num_results=2
    )
    for p, t, got in zip(items, lengths, batch_res):
        solo = ctc_beam_search_decoder_device(
            [p], [t], alphabet, beam_size=24, num_results=2
        )[0]
        host = _host_results(p, alphabet, beam=24, n=1)
        assert got[0].transcript == solo[0].transcript == host[0].transcript
        assert got[0].timesteps == host[0].timesteps


def test_device_beam_cutoffs():
    rng = np.random.RandomState(31)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    probs = softmax(rng.randn(20, n_class) * 2.0).astype(np.float32)
    host = _host_results(
        probs, alphabet, beam=16, n=1, cutoff_prob=0.9, cutoff_top_n=3
    )
    dev = ctc_beam_search_decoder_device(
        [probs], [20], alphabet, beam_size=16, cutoff_prob=0.9,
        cutoff_top_n=3,
    )[0]
    assert dev[0].transcript == host[0].transcript
    assert dev[0].timesteps == host[0].timesteps


def test_device_beam_on_trained_smoke(trained_smoke):
    """End-to-end: smoke-overfit model probs decode to the exact smoke
    transcript through the on-device path, matching the host oracle."""
    import jax
    from stt_tpu.frontend import audio_to_mfcc
    from stt_tpu.models import apply_model

    params, config, feature_config, alphabet, audio = trained_smoke
    feats = audio_to_mfcc(jnp.asarray(audio), feature_config)
    logits, _ = apply_model(
        params, feats[None], seq_len=jnp.asarray([feats.shape[0]]),
        config=config,
    )
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))
    host = _host_results(probs, alphabet, beam=64, n=1)
    dev = ctc_beam_search_decoder_device(
        [probs], [probs.shape[0]], alphabet, beam_size=64
    )[0]
    assert dev[0].transcript == host[0].transcript
    assert dev[0].transcript == (
        "she had your dark suit in greasy wash water all year"
    )
    assert dev[0].timesteps == host[0].timesteps
    assert dev[0].confidence == pytest.approx(host[0].confidence, abs=2e-3)


def test_stream_device_prune_equivalence(trained_smoke):
    """StreamState with on-device emission pruning produces the same
    transcript/timesteps as the full-probs path, for cutoffs that both
    do and don't truncate."""
    from stt_tpu.stream.streaming import StreamState, StreamingRuntime

    params, config, feature_config, alphabet, audio = trained_smoke
    runtime = StreamingRuntime(params, config, feature_config, alphabet)

    def run(device_prune, cutoff_prob, cutoff_top_n):
        stream = StreamState(
            runtime, beam_width=32, cutoff_prob=cutoff_prob,
            cutoff_top_n=cutoff_top_n, device_prune=device_prune,
        )
        for start in range(0, len(audio), 3200):
            stream.feed_audio_content(audio[start : start + 3200])
        return stream.finish(1)[0]

    for cp, tn in [(1.0, 40), (0.99, 8)]:
        full = run(False, cp, tn)
        pruned = run(True, cp, tn)
        assert pruned.transcript == full.transcript == (
            "she had your dark suit in greasy wash water all year"
        )
        assert pruned.timesteps == full.timesteps
        assert pruned.confidence == pytest.approx(full.confidence, abs=1e-3)


def test_stream_device_decode_equivalence(trained_smoke):
    """StreamState with the FULL on-device beam (device_decode=True):
    transcripts/timesteps match the host decoder; intermediate decodes
    work mid-stream; the flush path's padded chunks stay masked."""
    from stt_tpu.stream.streaming import StreamState, StreamingRuntime

    params, config, feature_config, alphabet, audio = trained_smoke
    runtime = StreamingRuntime(params, config, feature_config, alphabet)

    def run(device_decode):
        stream = StreamState(
            runtime, beam_width=32, device_decode=device_decode
        )
        mids = []
        for start in range(0, len(audio), 11000):
            stream.feed_audio_content(audio[start : start + 11000])
            mids.append(stream.intermediate_decode(1)[0].transcript)
        return mids, stream.finish(1)[0]

    mids_host, host = run(False)
    mids_dev, dev = run(True)
    assert dev.transcript == host.transcript == (
        "she had your dark suit in greasy wash water all year"
    )
    assert dev.timesteps == host.timesteps
    assert dev.confidence == pytest.approx(host.confidence, abs=2e-3)
    assert mids_dev == mids_host
    # incremental: intermediate decodes are prefixes-ish of the final
    assert mids_dev[-1] != ""


def test_device_streaming_decoder_chunked_equals_oneshot():
    """DeviceStreamingDecoder over chunks == device_beam_search one-shot
    == host oracle."""
    from stt_tpu.decode.device import DeviceStreamingDecoder

    rng = np.random.RandomState(17)
    alphabet = make_alphabet()
    n_class = alphabet.size + 1
    T = 45
    probs = softmax(rng.randn(T, n_class) * 2.0).astype(np.float32)

    dec = DeviceStreamingDecoder(alphabet, 24)
    for start in range(0, T, 16):
        chunk = probs[start : start + 16]
        n = chunk.shape[0]
        if n < 16:  # padded flush chunk, masked via n_valid
            chunk = np.concatenate(
                [chunk, np.zeros((16 - n, n_class), np.float32)]
            )
        dec.next(chunk, n_valid=n)
    streamed = dec.decode(2)

    oneshot = ctc_beam_search_decoder_device(
        [probs], [T], alphabet, beam_size=24, num_results=2
    )[0]
    host = _host_results(probs, alphabet, beam=24, n=2)
    for a, b in zip(streamed, oneshot):
        assert a.transcript == b.transcript
        assert a.timesteps == b.timesteps
        assert a.confidence == pytest.approx(b.confidence, abs=1e-5)
    assert streamed[0].transcript == host[0].transcript
    assert streamed[0].timesteps == host[0].timesteps


def test_auto_device_prune_policy():
    from stt_tpu.stream.streaming import auto_device_prune

    # default 29-class alphabet, reference-native cutoffs: stays off
    assert not auto_device_prune(29, 40, 1.0)
    # bytes mode with a truncating cutoff: on
    assert auto_device_prune(257, 40, 0.99)
    # truncation that keeps most classes: off
    assert not auto_device_prune(29, 28, 0.99)


def test_pool_device_prune_equivalence(trained_smoke):
    """StreamPool with device pruning forced on matches the plain pool."""
    from stt_tpu.artifact import build_metadata, save_artifact
    import tempfile

    from stt_tpu.serve import Model
    from stt_tpu.serve.pool import StreamPool

    params, config, feature_config, alphabet, audio = trained_smoke
    meta = build_metadata(config, feature_config, alphabet, beam_width=32)
    with tempfile.TemporaryDirectory() as tmp:
        path = save_artifact(f"{tmp}/m", params, meta, alphabet)
        model = Model(path)
        outs = []
        for kwargs in (
            {"device_prune": False, "device_decode": False},
            {"device_prune": True, "device_decode": False},
            {"device_decode": True},
        ):
            pool = StreamPool(model, max_streams=2, **kwargs)
            s = pool.create_stream()
            s.feed_audio_content(audio)
            outs.append(s.finish_stream())
        assert outs[0] == outs[1] == outs[2] == (
            "she had your dark suit in greasy wash water all year"
        )


@pytest.mark.parametrize("cutoffs", [(1.0, 40), (0.9, 4)])
def test_device_beam_wav2vec2_layout(cutoffs):
    """blank at index 0 + ignored control symbols: the device scan must
    match the host Wav2vec2DecoderState (identity token remap, no LM)."""
    from stt_tpu.decode.beam import Wav2vec2DecoderState

    cutoff_prob, cutoff_top_n = cutoffs
    rng = np.random.RandomState(41)
    labels = ["<pad>", "<s>", "</s>", " ", "a", "b", "c"]
    alphabet = Alphabet().init_from_labels(labels)
    C = alphabet.size  # blank rides INSIDE the table at index 0 here
    blank_id, ignored = 0, (1, 2)
    mismatch = 0
    for trial in range(5):
        probs = softmax(rng.randn(28, C) * 2.0).astype(np.float32)
        host_state = Wav2vec2DecoderState(
            alphabet, 16, blank_id, ignored_symbols=ignored,
            cutoff_prob=cutoff_prob, cutoff_top_n=cutoff_top_n,
        )
        host_state.next(probs)
        host = host_state.decode(1)

        scores, src, ch = device_beam_search(
            probs[None], [probs.shape[0]], beam_width=16,
            cutoff_top_n=cutoff_top_n, cutoff_prob=cutoff_prob,
            blank_id=blank_id, ignored_symbols=ignored,
        )
        [dev] = rebuild_results(scores[0], src[0], ch[0], alphabet, 1)
        if dev.transcript != host[0].transcript:
            mismatch += 1
            continue
        assert dev.timesteps == host[0].timesteps
        assert dev.confidence == pytest.approx(host[0].confidence, abs=1e-3)
        # control symbols never appear in the output
        assert not set(dev.tokens) & ({blank_id} | set(ignored))
    assert mismatch == 0, f"{mismatch}/5"


def test_rebuild_results_empty_beam():
    alphabet = make_alphabet()
    scores = np.full((4,), -np.inf, np.float32)
    src = np.zeros((5, 4), np.int32)
    char = np.full((5, 4), -1, np.int32)
    [res] = rebuild_results(scores, src, char, alphabet, 1)
    assert res.transcript == "" and res.tokens == []
