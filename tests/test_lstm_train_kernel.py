"""Training-path fused LSTM (Pallas fwd+bwd under custom_vjp,
stt_tpu.ops.lstm_train) — value and gradient equivalence vs the autodiff
lax.scan reference, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.models.lstm import lstm_init, lstm_scan
from stt_tpu.ops.lstm_train import fused_lstm_train_supported, lstm_train


def _loss_scan(params, x, seq, c0h0):
    out, (c, h) = lstm_scan(
        params, x, seq_len=seq, initial_state=c0h0, compute_dtype=jnp.float32
    )
    return (
        jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        + jnp.sum(c * 0.3)
        + jnp.sum(h * 0.7)
    )


def _loss_fused(params, x, seq, c0h0):
    out, (c, h) = lstm_train(
        params, x, seq_len=seq, initial_state=c0h0,
        compute_dtype=jnp.float32, interpret=True,
    )
    return (
        jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        + jnp.sum(c * 0.3)
        + jnp.sum(h * 0.7)
    )


def test_train_guard():
    assert fused_lstm_train_supported(64, 2048, jnp.bfloat16)
    assert not fused_lstm_train_supported(3, 2048, jnp.bfloat16)
    assert not fused_lstm_train_supported(8, 100, jnp.bfloat16)


def test_values_and_grads_match_scan():
    rng = np.random.RandomState(0)
    T, B, H = 7, 8, 128
    params = lstm_init(jax.random.PRNGKey(0), H, H)
    x = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)
    seq = jnp.asarray([4, 7, 2, 7, 5, 1, 7, 3], jnp.int32)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.05)

    out_ref, (c_ref, h_ref) = lstm_scan(
        params, x, seq_len=seq, initial_state=(c0, h0),
        compute_dtype=jnp.float32,
    )
    out, (c, h) = lstm_train(
        params, x, seq_len=seq, initial_state=(c0, h0),
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(_loss_scan, argnums=(0, 1, 3))(
        params, x, seq, (c0, h0)
    )
    g = jax.grad(_loss_fused, argnums=(0, 1, 3))(params, x, seq, (c0, h0))
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_grads_no_initial_state_full_lengths():
    rng = np.random.RandomState(1)
    T, B, H = 5, 8, 128
    params = lstm_init(jax.random.PRNGKey(1), H, H)
    x = jnp.asarray(rng.randn(T, B, H).astype(np.float32) * 0.1)

    def loss_scan(p, x):
        out, _ = lstm_scan(p, x, compute_dtype=jnp.float32)
        return jnp.sum(out**2)

    def loss_fused(p, x):
        out, _ = lstm_train(
            p, x, compute_dtype=jnp.float32, interpret=True
        )
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    g = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
