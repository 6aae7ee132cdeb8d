"""Acoustic model tests: LSTM golden-checked against torch.nn.LSTM,
windowing checked against the reference's conv1d-eye semantics, streaming
state-carry equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.models import (
    ModelConfig,
    apply_model,
    create_overlapping_windows,
    init_params,
    lstm_scan,
    num_params,
)

CFG = ModelConfig(n_input=4, n_context=2, n_hidden=32, n_cell_dim=32, n_out=11)


def test_param_count_default_geometry():
    """Reference default geometry is ~48M params (SURVEY.md §6)."""
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    n = num_params(params)
    assert 47e6 < n < 50e6, n


def test_overlapping_windows():
    b, t, n_input, n_context = 2, 7, 3, 2
    feats = np.arange(b * t * n_input, dtype=np.float32).reshape(b, t, n_input)
    out = np.asarray(create_overlapping_windows(jnp.asarray(feats), n_context))
    assert out.shape == (b, t, (2 * n_context + 1) * n_input)
    # middle frame: window = frames [t-2 .. t+2] flattened (tap, channel)
    np.testing.assert_array_equal(
        out[0, 3], feats[0, 1:6].reshape(-1)
    )
    # first frame: two zero-padded taps then frames 0..2
    expect = np.concatenate([np.zeros(2 * n_input, np.float32), feats[0, :3].reshape(-1)])
    np.testing.assert_array_equal(out[0, 0], expect)


def test_lstm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    T, B, n_in, n_cell = 5, 3, 8, 16
    x = rng.randn(T, B, n_in).astype(np.float32)
    kernel = (rng.randn(n_in + n_cell, 4 * n_cell) * 0.2).astype(np.float32)
    bias = (rng.randn(4 * n_cell) * 0.1).astype(np.float32)

    out, (c, h) = lstm_scan({"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
                            jnp.asarray(x))

    # torch gate order is (i, f, g, o); ours is (i, g, f, o).
    def remap(m):
        i, g, f, o = np.split(m, 4, axis=-1)
        return np.concatenate([i, f, g, o], axis=-1)

    lstm = torch.nn.LSTM(n_in, n_cell)
    wk = remap(kernel)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(wk[:n_in].T))
        lstm.weight_hh_l0.copy_(torch.from_numpy(wk[n_in:].T))
        lstm.bias_ih_l0.copy_(torch.from_numpy(remap(bias)))
        lstm.bias_hh_l0.zero_()
        t_out, (t_h, t_c) = lstm(torch.from_numpy(x))

    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), t_h[0].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), t_c[0].numpy(), rtol=1e-5, atol=1e-5)


def test_lstm_seq_len_masking():
    rng = np.random.RandomState(1)
    T, B, n = 6, 2, 8
    x = rng.randn(T, B, n).astype(np.float32)
    params = {
        "kernel": jnp.asarray(rng.randn(2 * n, 4 * n).astype(np.float32) * 0.2),
        "bias": jnp.zeros(4 * n, jnp.float32),
    }
    seq_len = jnp.asarray([4, 6])
    out, (c, h) = lstm_scan(params, jnp.asarray(x), seq_len=seq_len)
    out = np.asarray(out)
    # outputs past seq_len are zero
    assert np.all(out[4:, 0] == 0)
    assert np.any(out[5, 1] != 0)
    # final state for utt 0 equals state after 4 steps
    out4, (c4, h4) = lstm_scan(params, jnp.asarray(x[:4]))
    np.testing.assert_allclose(np.asarray(c)[0], np.asarray(c4)[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h)[0], np.asarray(h4)[0], rtol=1e-6)


def test_forward_shapes_and_state():
    params = init_params(jax.random.PRNGKey(0), CFG)
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 10, 4), jnp.float32)
    logits, (c, h) = apply_model(params, feats, config=CFG)
    assert logits.shape == (2, 10, 11)
    assert c.shape == (2, 32) and h.shape == (2, 32)
    assert logits.dtype == jnp.float32


def test_streaming_state_carry_equals_full():
    """Chunked forward with carried LSTM state == one-shot forward.

    The chunks must be windowed over the full feature sequence (the
    streaming runtime keeps a feature ring buffer for exactly this reason),
    so we window first and pass overlap=False.
    """
    params = init_params(jax.random.PRNGKey(1), CFG)
    feats = jnp.asarray(np.random.RandomState(2).randn(1, 12, 4), jnp.float32)
    full_logits, full_state = apply_model(params, feats, config=CFG)

    windowed = create_overlapping_windows(feats, CFG.n_context)
    state = None
    outs = []
    for start in range(0, 12, 4):
        chunk = windowed[:, start : start + 4]
        logits, state = apply_model(
            params, chunk, config=CFG, previous_state=state, overlap=False
        )
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), np.asarray(full_logits), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(state[0]), np.asarray(full_state[0]), rtol=1e-5, atol=1e-5)


def test_dropout_only_with_rng():
    params = init_params(jax.random.PRNGKey(0), CFG)
    feats = jnp.ones((1, 5, 4), jnp.float32)
    a, _ = apply_model(params, feats, config=CFG)
    b, _ = apply_model(params, feats, config=CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg_drop = ModelConfig(n_input=4, n_context=2, n_hidden=32, n_cell_dim=32,
                           n_out=11, dropout_rates=(0.5, 0.5, 0.5, 0, 0, 0.5))
    c, _ = apply_model(params, feats, config=cfg_drop, dropout_rng=jax.random.PRNGKey(3))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_relu_clip():
    params = init_params(jax.random.PRNGKey(0), CFG)
    # huge inputs should saturate hidden activations at relu_clip, not inf
    feats = jnp.ones((1, 5, 4), jnp.float32) * 1e6
    logits, _ = apply_model(params, feats, config=CFG)
    assert np.isfinite(np.asarray(logits)).all()
