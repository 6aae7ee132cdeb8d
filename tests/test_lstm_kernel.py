"""Fused Pallas LSTM kernel equivalence (interpret mode on the CPU mesh;
the same kernel compiles natively on TPU where it was verified bit-exact
against the scan)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.models import ModelConfig, apply_model, init_params
from stt_tpu.models.lstm import lstm_init, lstm_scan
from stt_tpu.ops import fused_lstm_supported, lstm_fused


def test_supported_guard():
    assert fused_lstm_supported(128, 2048, jnp.bfloat16)
    assert not fused_lstm_supported(1, 2048, jnp.bfloat16)  # batch % 8
    assert not fused_lstm_supported(8, 100, jnp.bfloat16)  # cell % 128
    assert not fused_lstm_supported(8, 8192, jnp.float32)  # VMEM


def test_fused_matches_scan():
    rng = np.random.RandomState(0)
    T, B, H = 6, 8, 128
    params = lstm_init(jax.random.PRNGKey(0), H, H)
    x = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)
    seq = jnp.asarray([3, 4, 5, 6, 6, 6, 2, 1], jnp.int32)
    ref_out, (ref_c, ref_h) = lstm_scan(
        params, x, seq_len=seq, compute_dtype=jnp.float32
    )
    out, (c, h) = lstm_fused(
        params, x, seq_len=seq, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-5)


def test_fused_with_initial_state():
    rng = np.random.RandomState(1)
    T, B, H = 4, 8, 128
    params = lstm_init(jax.random.PRNGKey(1), H, H)
    x = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    ref_out, ref_state = lstm_scan(
        params, x, initial_state=(c0, h0), compute_dtype=jnp.float32
    )
    out, state = lstm_fused(
        params, x, initial_state=(c0, h0), compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)


def test_apply_model_fused_flag_matches():
    cfg = ModelConfig(n_input=8, n_context=1, n_hidden=128, n_cell_dim=128,
                      n_out=12, dropout_rates=(0.0,) * 6)
    cfg_fused = ModelConfig(n_input=8, n_context=1, n_hidden=128,
                            n_cell_dim=128, n_out=12,
                            dropout_rates=(0.0,) * 6, fused_lstm=True)
    params = init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(8, 10, 8).astype(np.float32))
    seq = jnp.full((8,), 10, jnp.int32)
    a, _ = apply_model(params, feats, seq_len=seq, config=cfg)
    b, _ = apply_model(params, feats, seq_len=seq, config=cfg_fused)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_fused_q_matches_scan_within_quantization_error():
    """int8-recurrence kernel (quantized inference path): h quantizes to
    1/127 per step, so outputs track the f32 scan within the accumulated
    quantization budget while staying well-shaped (masking, state carry)."""
    from stt_tpu.ops.lstm_kernel import lstm_fused_q_impl
    from stt_tpu.ops.quant import _quantize_weight

    rng = np.random.RandomState(2)
    T, B, H = 6, 8, 128
    params = lstm_init(jax.random.PRNGKey(2), H, H)
    x = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)
    seq = jnp.asarray([3, 4, 5, 6, 6, 6, 2, 1], jnp.int32)
    ref_out, (ref_c, ref_h) = lstm_scan(
        params, x, seq_len=seq, compute_dtype=jnp.float32
    )

    # same x_proj precompute as the quantized model path (f32 here)
    w_x = params["kernel"][:H]
    w_h = params["kernel"][H:]
    x_proj = (
        jnp.einsum("tbi,ij->tbj", x, w_x) + params["bias"]
    ).astype(jnp.float32)
    wh_q, wh_scale = _quantize_weight(w_h)
    out, c, h = lstm_fused_q_impl(
        x_proj,
        wh_q,
        (wh_scale / 127.0).reshape(1, -1),
        jnp.zeros((B, H), jnp.float32),
        jnp.zeros((B, H), jnp.float32),
        seq.reshape(B, 1),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c), atol=0.1)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h), atol=0.05)
    # masking semantics identical: zero outputs past seq_len
    for b_i, L in enumerate([3, 4, 5, 6, 6, 6, 2, 1]):
        assert np.all(np.asarray(out)[L:, b_i] == 0.0)
