"""int8 post-training quantization (stt_tpu.ops.quant).

Reference parity: the reference's default export path quantizes
(export.py:126-150, TFLiteConverter Optimize.DEFAULT) and its CI gates
the quantized artifact on the exact LDC93S1 transcript
(ci_scripts/asserts.sh). Same gate here: the int8 path must reproduce
the f32 transcript on the overfit smoke model, and its logits must stay
close in absolute terms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stt_tpu.ctc.greedy import greedy_decode
from stt_tpu.frontend import audio_to_mfcc
from stt_tpu.models import apply_model
from stt_tpu.ops.quant import apply_model_quantized, quantize_params

SMOKE_TRANSCRIPT = "she had your dark suit in greasy wash water all year"


def _decode(alphabet, logits, lengths):
    (tokens, _), = greedy_decode(logits, lengths)
    return alphabet.decode(tokens)


def test_quantized_smoke_transcript_matches_f32(trained_smoke):
    params, config, feature_config, alphabet, audio = trained_smoke
    feats = audio_to_mfcc(jnp.asarray(audio)[None], feature_config)
    seq = jnp.asarray([feats.shape[1]], jnp.int32)

    logits_f32, state_f32 = apply_model(
        params, feats, seq_len=seq, config=config
    )
    assert _decode(alphabet, logits_f32, np.asarray(seq)) == SMOKE_TRANSCRIPT

    qparams = quantize_params(params, config, calibration_features=feats)
    logits_q, state_q = apply_model_quantized(
        qparams, feats, seq_len=seq, config=config
    )
    assert _decode(alphabet, logits_q, np.asarray(seq)) == SMOKE_TRANSCRIPT

    # logits stay close in absolute terms (pre-softmax)
    err = float(jnp.max(jnp.abs(logits_q - logits_f32)))
    assert err < 2.0, err
    # final streaming state also tracks
    np.testing.assert_allclose(
        np.asarray(state_q[1]), np.asarray(state_f32[1]), atol=0.2
    )


def test_quantized_weights_are_int8(trained_smoke):
    params, config, feature_config, _, audio = trained_smoke
    feats = audio_to_mfcc(jnp.asarray(audio)[None], feature_config)
    qparams = quantize_params(params, config, calibration_features=feats)
    for name in ("layer_1", "layer_2", "layer_3", "lstm_in", "layer_5",
                 "layer_6"):
        q = qparams[name]
        assert q.w_q.dtype == jnp.int8
        assert q.w_scale.shape == (q.w_q.shape[1],)
        # per-channel scales: dequantized weights reconstruct closely
        w_deq = q.w_q.astype(jnp.float32) * q.w_scale
        if name == "lstm_in":
            n_cell = config.n_cell_dim
            w_ref = params["lstm"]["kernel"][
                : params["lstm"]["kernel"].shape[0] - n_cell
            ]
        else:
            w_ref = params[name]["w"]
        max_err = float(jnp.max(jnp.abs(w_deq - w_ref)))
        max_w = float(jnp.max(jnp.abs(w_ref)))
        assert max_err <= max_w / 127.0 * 1.01, (name, max_err)


def test_quantized_default_calibration(trained_smoke):
    """Without calibration features the default input scale must still
    hold the transcript (conservative bound on windowed MFCCs)."""
    params, config, feature_config, alphabet, audio = trained_smoke
    feats = audio_to_mfcc(jnp.asarray(audio)[None], feature_config)
    seq = jnp.asarray([feats.shape[1]], jnp.int32)
    qparams = quantize_params(params, config)
    logits_q, _ = apply_model_quantized(
        qparams, feats, seq_len=seq, config=config
    )
    assert _decode(alphabet, logits_q, np.asarray(seq)) == SMOKE_TRANSCRIPT


def test_quantized_artifact_round_trip(trained_smoke, tmp_path):
    """export --quantize parity: int8 artifact loads back to a working
    model that still produces the exact smoke transcript, at ~4x smaller
    weight file."""
    import os

    from stt_tpu.artifact import build_metadata, load_artifact, save_artifact

    params, config, feature_config, alphabet, audio = trained_smoke
    metadata = build_metadata(config, feature_config, alphabet)

    d_f32 = str(tmp_path / "f32")
    d_q = str(tmp_path / "q")
    save_artifact(d_f32, params, metadata, alphabet)
    save_artifact(d_q, params, metadata, alphabet, quantize=True)
    size_f32 = os.path.getsize(os.path.join(d_f32, "weights.npz"))
    size_q = os.path.getsize(os.path.join(d_q, "weights.npz"))
    assert size_q < size_f32 / 2.5, (size_q, size_f32)

    qparams, qmeta, qalpha = load_artifact(d_q)
    assert qmeta["quantized"] is True
    feats = audio_to_mfcc(jnp.asarray(audio)[None], feature_config)
    seq = jnp.asarray([feats.shape[1]], jnp.int32)
    logits, _ = apply_model(qparams, feats, seq_len=seq, config=config)
    assert _decode(qalpha, logits, np.asarray(seq)) == SMOKE_TRANSCRIPT


def test_serve_model_quantized_inference(trained_smoke, tmp_path):
    """serve.Model(quantized_inference=True): infer_logits routes through
    the int8 path and still yields the exact smoke transcript."""
    from stt_tpu.artifact import build_metadata, save_artifact
    from stt_tpu.serve import Model

    params, config, feature_config, alphabet, audio = trained_smoke
    metadata = build_metadata(config, feature_config, alphabet)
    d = str(tmp_path / "model")
    save_artifact(d, params, metadata, alphabet)

    model = Model(d, quantized_inference=True)
    feats = audio_to_mfcc(jnp.asarray(audio)[None], feature_config)
    lengths = np.asarray([feats.shape[1]], np.int32)
    logits = model.infer_logits(np.asarray(feats), lengths)
    assert _decode(model.alphabet, logits, lengths) == SMOKE_TRANSCRIPT
    # streaming (float path) still works on the same instance
    assert model.stt(audio) == SMOKE_TRANSCRIPT
