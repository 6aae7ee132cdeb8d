"""Unidirectional LSTM as a time-major lax.scan.

Cell semantics mirror the reference RNN (deepspeech_model.py:92-109,
LSTMBlockFusedCell with forget_bias=0, no peepholes, no clipping):

    z = [x_t, h_{t-1}] @ W + b          W: [n_in + n_cell, 4*n_cell]
    i, g, f, o = split(z, 4)            gate order i, g(cell), f, o — the
                                        TF LSTMCell "icfo" layout, kept so
                                        reference checkpoints import 1:1
    c_t = sigmoid(f) * c_{t-1} + sigmoid(i) * tanh(g)
    h_t = sigmoid(o) * tanh(c_t)

Sequence-length masking: for t >= seq_len the emitted output is 0 and the
carried state freezes, so the final (c, h) is the state at each utterance's
last valid frame (matches fused-cell behavior the streaming runtime relies
on).

The scan carries (c, h) so streaming inference can thread state across
chunks (stt.cc:32-59 three-buffer design -> stream/ package).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lstm_init(rng: jax.Array, n_in: int, n_cell: int, dtype=jnp.float32):
    """Glorot-uniform kernel, zero bias."""
    limit = (6.0 / (n_in + n_cell + 4 * n_cell)) ** 0.5
    kernel = jax.random.uniform(
        rng, (n_in + n_cell, 4 * n_cell), dtype, minval=-limit, maxval=limit
    )
    return {"kernel": kernel, "bias": jnp.zeros((4 * n_cell,), dtype)}


def lstm_cell(params, x_t: jax.Array, c: jax.Array, h: jax.Array, precision=None):
    """One step. x_t: [B, n_in]; c, h: [B, n_cell] -> (c_new, h_new)."""
    z = (
        jnp.matmul(
            jnp.concatenate([x_t, h], axis=-1),
            params["kernel"],
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        + params["bias"]
    )
    i, g, f, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return c_new, h_new


def lstm_scan(
    params,
    x: jax.Array,
    seq_len: jax.Array | None = None,
    initial_state: Tuple[jax.Array, jax.Array] | None = None,
    precision=None,
    compute_dtype=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Time-major scan. x: [T, B, n_in] -> (outputs [T, B, n_cell], (c, h)).

    seq_len: [B] valid lengths (None = all frames valid).
    initial_state: (c, h) each [B, n_cell] (None = zeros).
    compute_dtype: matmul input dtype (bf16 for full-rate MXU); gates and
      state stay f32.

    TPU shape: the input projection x @ W_x for ALL timesteps is hoisted
    out of the scan into one large MXU-friendly matmul; the sequential
    body only computes h @ W_h (+precomputed), halving the per-step HBM
    weight traffic that bounds recurrent throughput.
    """
    T, B, n_in = x.shape
    n_cell = params["kernel"].shape[1] // 4
    if initial_state is None:
        c0 = jnp.zeros((B, n_cell), jnp.float32)
        h0 = jnp.zeros((B, n_cell), jnp.float32)
    else:
        c0, h0 = initial_state

    dtype = compute_dtype or x.dtype
    w_x = params["kernel"][:n_in].astype(dtype)
    w_h = params["kernel"][n_in:].astype(dtype)
    # keep the [T, B, 4H] projection in the compute dtype (largest temp;
    # bias is added in f32 first, gates stay f32 inside the step)
    store_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    x_proj = (
        (
            jnp.matmul(
                x.reshape(T * B, n_in).astype(dtype),
                w_x,
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            + params["bias"]
        )
        .astype(store_dtype)
        .reshape(T, B, 4 * n_cell)
    )

    def step(carry, inp):
        c, h = carry
        xp_t, t = inp
        z = xp_t + jnp.matmul(
            h.astype(dtype),
            w_h,
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        i, g, f, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        if seq_len is not None:
            valid = (t < seq_len)[:, None]
            c_new = jnp.where(valid, c_new, c)
            out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
            h_new = jnp.where(valid, h_new, h)
        else:
            out = h_new
        return (c_new, h_new), out

    ts = jnp.arange(T, dtype=jnp.int32)
    # Short sequences (streaming's 16-frame chunks) unroll fully: the
    # program then contains no XLA while-loop, which keeps dispatch on
    # the fast path (a single while op degrades every later dispatch on
    # the tunneled-chip runtime). Long sequences scan with a rematted
    # step: backward recomputes the per-step gates instead of saving four
    # [T, B, 4H] activation tensors — the difference between batch 128
    # and batch 256+ fitting in HBM at the 2048 geometry, for ~1.3x
    # recurrence FLOPs on the backward pass.
    if T <= 32:
        (c, h), outputs = jax.lax.scan(
            step, (c0, h0), (x_proj, ts), unroll=True
        )
    else:
        (c, h), outputs = jax.lax.scan(
            jax.checkpoint(step), (c0, h0), (x_proj, ts)
        )
    return outputs, (c, h)
