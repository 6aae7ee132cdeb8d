"""Tensor-parallel model forward for the explicit shard_map train step.

The GSPMD path (train.step.make_train_step) supports model-axis sharding
but silently drops to the unfused lax.scan recurrence, because
pallas_call has no GSPMD partitioning rule. This module is the
fused-kernel TP answer, built from two TPU-native decisions:

1. **Column-parallel projections.** Every dense layer and the LSTM gate
   matmul x @ W_x run on the local [., D/K] weight shard (the layout
   `parallel.mesh.model_partition_spec` defines) — the model-axis FLOPs
   split SURVEY §2.5 asks for. Activations all_gather at layer
   boundaries.

2. **Batch-resharded recurrence — no per-timestep collectives.** A
   cell-sharded LSTM recurrence would need an all_gather of h_t on every
   timestep (500+ latency-bound ICI hops per utterance, the worst
   possible pattern for a sequential loop). Instead the gate-sharded
   projection [T, B, 4H/K] all_to_alls into batch-sharded full-width
   [T, B/K, 4H]; each model shard then runs the SAME fused Pallas
   recurrence (ops.lstm_train custom_vjp fwd+bwd kernels) on its batch
   slice with W_h all_gathered once per step, and the outputs
   all_gather back. Two bulk collectives per layer instead of 2T.
   The 'model' axis thus accelerates the projections (column split) and
   the recurrence (extra batch split) simultaneously, and every matmul
   stays a full-size local MXU op — exactly the shape the fused kernels
   want.

W_h ([H, 4H]) is materialized per-device for the recurrence (34 MB bf16
at the 2048 geometry — VMEM-resident in the kernel anyway); the stored
param stays sharded, so param/optimizer memory still scales 1/K.

Autodiff runs straight through shard_map: the all_gather/all_to_all
transposes (psum_scatter / reverse all_to_all) are inserted by JAX, and
the recurrence backward is the Pallas reverse-sweep kernel.

Reference parity note: semantics equal apply_model (deepspeech.py) with
dropout drawn on full-width activations after the gather; per-data-shard
dropout masks fold the 'data' axis index (independent masks per shard,
same policy as make_train_step_dp).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stt_tpu.models.deepspeech import (
    ModelConfig,
    Params,
    _layer_norm,
    create_overlapping_windows,
)


def _axis_size(name: str) -> int:
    return jax.lax.psum(1, name)


def _gather_cols(x, full_dim: int):
    """all_gather a [..., D/K]-sharded activation to full width (no-op
    when the producing weight was replicated)."""
    if x.shape[-1] == full_dim:
        return x
    return jax.lax.all_gather(x, "model", axis=x.ndim - 1, tiled=True)


def _dense_tp(layer, x, config: ModelConfig, full_dim: int,
              relu: bool = True, dropout_rate=None, rng=None):
    """Column-parallel twin of deepspeech._dense: local matmul on the
    [n_in, D/K] weight shard, gather, then the elementwise tail on full
    width (relu/clip order commutes with the gather; layer_norm and
    dropout need full rows)."""
    w = layer["w"].astype(config.dtype)
    out = jnp.matmul(x.astype(config.dtype), w,
                     preferred_element_type=jnp.float32)
    out = out + layer["b"]
    out = _gather_cols(out, full_dim)
    if relu:
        out = jnp.minimum(jax.nn.relu(out), config.relu_clip)
    if "ln_scale" in layer:
        scale = _gather_cols(layer["ln_scale"], full_dim)
        bias = _gather_cols(layer["ln_bias"], full_dim)
        out = _layer_norm(out, scale, bias)
    if dropout_rate is not None and rng is not None and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(rng, keep, out.shape)
        out = jnp.where(mask, out / keep, 0.0)
    return out


def _recurrence_scan(x_proj, w_h, c0, h0, seq, compute_dtype):
    """lax.scan recurrence over a precomputed gate projection — the same
    (x_proj, w_h, c0, h0, seq) -> (hs, cT, hT) contract as the fused
    ops.lstm_train recurrence, used on CPU meshes where interpreting the
    Pallas kernels would dominate test time. Math mirrors
    models.lstm.lstm_scan's step (icfo gates, masked freeze/zero)."""
    T = x_proj.shape[0]
    dtype = jnp.dtype(compute_dtype)
    w_h = w_h.astype(dtype)
    seq1 = seq.reshape(-1)

    def step(carry, inp):
        c, h = carry
        xp_t, t = inp
        z = xp_t.astype(jnp.float32) + jnp.matmul(
            h.astype(dtype), w_h, preferred_element_type=jnp.float32
        )
        i, g, f, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        valid = (t < seq1)[:, None]
        c_new = jnp.where(valid, c_new, c)
        out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        h_new = jnp.where(valid, h_new, h)
        return (c_new, h_new), out

    ts = jnp.arange(T, dtype=jnp.int32)
    (c, h), outputs = jax.lax.scan(
        jax.checkpoint(step), (c0, h0), (x_proj, ts)
    )
    return outputs, c, h


def _lstm_tp(lstm, x, seq_len, config: ModelConfig):
    """Gate-sharded projection + batch-resharded full-width recurrence.

    x: [T, B, n_cell] full-width activations (replicated over 'model').
    Returns (outputs [T, B, n_cell] full, (c, h) [B, n_cell] full).
    """
    T, B, n_in = x.shape
    n_cell = config.n_cell_dim
    K = _axis_size("model")
    dtype = config.dtype
    kernel = lstm["kernel"]  # [n_in + H, 4H/K] local shard
    w_x = kernel[:n_in]
    w_h_loc = kernel[n_in:]

    # column-parallel gate projection: [T*B, n_in] @ [n_in, 4H/K]
    store_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    x_proj_loc = (
        (
            jnp.matmul(
                x.reshape(T * B, n_in).astype(dtype),
                w_x.astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + lstm["bias"]
        )
        .astype(store_dtype)
        .reshape(T, B, -1)
    )
    w_h = jax.lax.all_gather(w_h_loc, "model", axis=1, tiled=True)  # [H, 4H]
    seq = (
        jnp.full((B,), T, jnp.int32) if seq_len is None
        else seq_len.astype(jnp.int32)
    )
    reshard_batch = B % K == 0
    if reshard_batch:
        # reshard: gate-sharded -> batch-sharded full-width (one bulk
        # all_to_all instead of a per-timestep h gather)
        x_proj = jax.lax.all_to_all(
            x_proj_loc, "model", split_axis=1, concat_axis=2, tiled=True
        )  # [T, B/K, 4H]
        b_loc = B // K
        k = jax.lax.axis_index("model")
        seq_k = jax.lax.dynamic_slice_in_dim(seq, k * b_loc, b_loc).reshape(
            b_loc, 1
        )
    else:
        # local batch smaller than the model axis: gather the gate
        # projection instead and run the recurrence replicated — the
        # column-parallel projections still split the FLOPs, only the
        # (batch-bound) recurrence is redundant
        x_proj = jax.lax.all_gather(
            x_proj_loc, "model", axis=2, tiled=True
        )  # [T, B, 4H]
        b_loc = B
        seq_k = seq.reshape(B, 1)
    c0 = jnp.zeros((b_loc, n_cell), jnp.float32)
    h0 = jnp.zeros((b_loc, n_cell), jnp.float32)

    # STT_TPU_TP_FUSED=1 forces the fused Pallas recurrence even on CPU
    # meshes (Mosaic interpret mode) so tests and the multichip dryrun
    # execute the real kernel branch, not only its scan twin
    import os as _os

    force_fused = bool(_os.environ.get("STT_TPU_TP_FUSED"))
    use_fused = interpret = False
    if jax.devices()[0].platform != "cpu" or force_fused:
        from stt_tpu.ops.lstm_train import fused_lstm_train_supported

        use_fused = fused_lstm_train_supported(b_loc, n_cell, dtype)
        interpret = jax.devices()[0].platform == "cpu"
    if use_fused:
        from stt_tpu.ops.lstm_train import _make_recurrence

        rec = _make_recurrence(dtype.name, interpret)
        hs, cT, hT = rec(x_proj, w_h, c0, h0, seq_k)
    else:
        hs, cT, hT = _recurrence_scan(x_proj, w_h, c0, h0, seq_k, dtype)

    if not reshard_batch:
        return hs, (cT, hT)
    # batch-sharded results -> full batch, still one bulk collective each
    outputs = jax.lax.all_gather(hs, "model", axis=1, tiled=True)
    c = jax.lax.all_gather(cT, "model", axis=0, tiled=True)
    h = jax.lax.all_gather(hT, "model", axis=0, tiled=True)
    return outputs, (c, h)


def apply_model_tp(
    params: Params,
    features: jax.Array,
    seq_len: Optional[jax.Array] = None,
    config: ModelConfig = ModelConfig(),
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Tensor-parallel forward over local param shards — runs inside a
    shard_map region with mesh axes ('data', 'model'). Same outputs as
    deepspeech.apply_model on the gathered params (logits [B, T, n_out]
    f32, final LSTM state)."""
    b, t = features.shape[:2]
    x = create_overlapping_windows(features, config.n_context)
    rates = config.dropout_rates
    rngs = (
        jax.random.split(dropout_rng, 4)
        if dropout_rng is not None else [None] * 4
    )
    x = x.reshape(b * t, -1)
    x = _dense_tp(params["layer_1"], x, config, config.n_hidden,
                  dropout_rate=rates[0], rng=rngs[0])
    x = _dense_tp(params["layer_2"], x, config, config.n_hidden,
                  dropout_rate=rates[1], rng=rngs[1])
    x = _dense_tp(params["layer_3"], x, config, config.n_cell_dim,
                  dropout_rate=rates[2], rng=rngs[2])

    x = x.reshape(b, t, -1).transpose(1, 0, 2)  # [T, B, n_cell]
    if params["lstm"]["kernel"].shape[1] == 4 * config.n_cell_dim:
        # replicated LSTM (mesh without real model sharding): plain scan
        from stt_tpu.models.lstm import lstm_scan

        outputs, state = lstm_scan(
            params["lstm"], x, seq_len=seq_len, compute_dtype=config.dtype
        )
    else:
        outputs, state = _lstm_tp(params["lstm"], x, seq_len, config)
    x = outputs.transpose(1, 0, 2).reshape(b * t, -1)

    x = _dense_tp(params["layer_5"], x, config, config.n_hidden,
                  dropout_rate=rates[5], rng=rngs[3])
    logits = _dense_tp(params["layer_6"], x, config, config.n_out, relu=False)
    logits = logits.reshape(b, t, config.n_out).astype(jnp.float32)
    return logits, state
