"""DeepSpeech-style LSTM acoustic model as a pure-pytree JAX module.

Architecture (parity surface: deepspeech_model.py:171-263):
  context window (2*n_context+1 frames of n_input MFCCs)
  -> dense x3 with clipped ReLU (min(relu(x), relu_clip)) + dropout
  -> unidirectional LSTM (n_cell_dim), stateful for streaming
  -> dense with clipped ReLU + dropout
  -> linear dense to n_alphabet+1 logits (blank = last index)

TPU-first notes:
- Dense layers run as one [B*T, .] x [., H] matmul per layer — large,
  batched MXU work; dtype policy is configurable (bf16 compute keeps the
  MXU at full rate; params stay f32).
- The LSTM is a time-major lax.scan (stt_tpu.models.lstm); its per-step
  gate matmul is the hot op and has a Pallas fused path planned.
- No TF-style "tower" replication: data parallelism is expressed by
  sharding the batch axis of `features` over the mesh (stt_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stt_tpu.models.lstm import lstm_init, lstm_scan


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    n_input: int = 26  # MFCC coefficients per frame
    n_context: int = 9  # frames of context on each side
    n_hidden: int = 2048  # width of dense layers 1-3 and 5
    n_cell_dim: int = 2048  # LSTM cell width
    n_out: int = 29  # alphabet size + 1 (CTC blank, last index)
    relu_clip: float = 20.0
    layer_norm: bool = False
    # dropout rates for layers [1, 2, 3, lstm(unused), unused, 5]
    dropout_rates: Tuple[float, ...] = (0.05, 0.05, 0.05, 0.0, 0.0, 0.05)
    compute_dtype: str = "float32"  # "bfloat16" for full-rate MXU
    # inference-only Pallas recurrence with W_h resident in VMEM; falls
    # back to the lax.scan when shapes don't qualify or when training
    fused_lstm: bool = False
    # inside shard_map each device sees a single-device program, so the
    # per-device fused kernels are safe even on a multi-device mesh;
    # the shard_map train step sets this to skip the device_count gate
    force_fused: bool = False

    @property
    def window_width(self) -> int:
        return 2 * self.n_context + 1

    @property
    def window_input(self) -> int:
        return self.window_width * self.n_input

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


Params = Dict[str, Dict[str, jax.Array]]


def _dense_init(rng: jax.Array, n_in: int, n_out: int, dtype=jnp.float32):
    """VarianceScaling(scale=1.0, fan_avg, uniform) kernel + zero bias,
    matching the reference dense initializer (deepspeech_model.py:66-76)."""
    limit = (3.0 * 2.0 / (n_in + n_out)) ** 0.5
    w = jax.random.uniform(rng, (n_in, n_out), dtype, minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def init_params(rng: jax.Array, config: ModelConfig) -> Params:
    keys = jax.random.split(rng, 6)
    params = {
        "layer_1": _dense_init(keys[0], config.window_input, config.n_hidden),
        "layer_2": _dense_init(keys[1], config.n_hidden, config.n_hidden),
        "layer_3": _dense_init(keys[2], config.n_hidden, config.n_cell_dim),
        "lstm": lstm_init(keys[3], config.n_cell_dim, config.n_cell_dim),
        "layer_5": _dense_init(keys[4], config.n_cell_dim, config.n_hidden),
        "layer_6": _dense_init(keys[5], config.n_hidden, config.n_out),
    }
    if config.layer_norm:
        for name in ("layer_1", "layer_2", "layer_3", "layer_5"):
            dim = params[name]["w"].shape[1]
            params[name]["ln_scale"] = jnp.ones((dim,), jnp.float32)
            params[name]["ln_bias"] = jnp.zeros((dim,), jnp.float32)
    return params


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def create_overlapping_windows(features: jax.Array, n_context: int) -> jax.Array:
    """[B, T, n_input] -> [B, T, (2*n_context+1)*n_input].

    Frame t sees frames [t-n_context, t+n_context], zero-padded at the
    edges; the window flattens as (tap, channel) — same layout as the
    reference's identity-eye conv1d trick (deepspeech_model.py:42-63) so
    layer_1 weights are interchangeable.
    """
    b, t, n_input = features.shape
    width = 2 * n_context + 1
    padded = jnp.pad(features, ((0, 0), (n_context, n_context), (0, 0)))
    # gather [T, width] window indices; static shapes keep XLA happy
    import numpy as np

    idx = np.arange(t)[:, None] + np.arange(width)[None, :]
    windows = padded[:, idx, :]  # [B, T, width, n_input]
    return windows.reshape(b, t, width * n_input)


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dense(
    layer, x, config: ModelConfig, relu: bool = True, dropout_rate=None, rng=None
):
    w = layer["w"].astype(config.dtype)
    out = jnp.matmul(x.astype(config.dtype), w, preferred_element_type=jnp.float32)
    out = out + layer["b"]
    if relu:
        out = jnp.minimum(jax.nn.relu(out), config.relu_clip)
    if "ln_scale" in layer:
        out = _layer_norm(out, layer["ln_scale"], layer["ln_bias"])
    if dropout_rate is not None and rng is not None and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(rng, keep, out.shape)
        out = jnp.where(mask, out / keep, 0.0)
    return out


def apply_model(
    params: Params,
    features: jax.Array,
    seq_len: Optional[jax.Array] = None,
    config: ModelConfig = ModelConfig(),
    previous_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    dropout_rng: Optional[jax.Array] = None,
    overlap: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Forward pass.

    features: [B, T, n_input] MFCCs (or [B, T, window_input] if overlap=False,
      e.g. the streaming path that windows incrementally).
    seq_len: [B] valid frame counts (None = all valid).
    previous_state: (c, h) each [B, n_cell_dim] for streaming; None = zeros.
    dropout_rng: enables dropout (training) when not None.

    Returns (logits [B, T, n_out] float32 — time dim batch-major — and the
    final LSTM state). Softmax/CTC stay outside: training wants raw logits,
    decoding applies log_softmax itself.
    """
    b, t = features.shape[:2]
    if overlap:
        x = create_overlapping_windows(features, config.n_context)
    else:
        x = features

    rates = config.dropout_rates
    rngs = (
        jax.random.split(dropout_rng, 4) if dropout_rng is not None else [None] * 4
    )
    x = x.reshape(b * t, -1)
    x = _dense(params["layer_1"], x, config, dropout_rate=rates[0], rng=rngs[0])
    x = _dense(params["layer_2"], x, config, dropout_rate=rates[1], rng=rngs[1])
    x = _dense(params["layer_3"], x, config, dropout_rate=rates[2], rng=rngs[2])

    # LSTM is time-major: [T, B, n_cell]
    x = x.reshape(b, t, -1).transpose(1, 0, 2)
    use_fused = config.fused_lstm and dropout_rng is None
    use_fused_train = config.fused_lstm and dropout_rng is not None
    if use_fused:
        from stt_tpu.ops import fused_lstm_supported, lstm_fused

        # pallas_call has no GSPMD partitioning rule: engage the fused
        # kernels only in single-device programs (multi-chip runs use
        # the scan, which XLA shards; a shard_map wrapper is the path
        # to fused-kernel multi-chip)
        use_fused = (
            fused_lstm_supported(b, config.n_cell_dim, config.dtype)
            and jax.devices()[0].platform != "cpu"
            and (config.force_fused or jax.device_count() == 1)
        )
    if use_fused_train:
        # differentiable Pallas fwd+bwd (custom_vjp) — avoids autodiff's
        # per-step dW_h carry; interpret mode on CPU is too slow, keep
        # the scan there
        from stt_tpu.ops.lstm_train import fused_lstm_train_supported

        use_fused_train = (
            fused_lstm_train_supported(b, config.n_cell_dim, config.dtype)
            and jax.devices()[0].platform != "cpu"
            and (config.force_fused or jax.device_count() == 1)
        )
    if use_fused:
        outputs, state = lstm_fused(
            params["lstm"],
            x,
            seq_len=seq_len,
            initial_state=previous_state,
            compute_dtype=config.dtype,
        )
    elif use_fused_train:
        from stt_tpu.ops.lstm_train import lstm_train

        outputs, state = lstm_train(
            params["lstm"],
            x,
            seq_len=seq_len,
            initial_state=previous_state,
            compute_dtype=config.dtype,
        )
    else:
        outputs, state = lstm_scan(
            params["lstm"],
            x,
            seq_len=seq_len,
            initial_state=previous_state,
            compute_dtype=config.dtype,
        )
    x = outputs.transpose(1, 0, 2).reshape(b * t, -1)

    x = _dense(params["layer_5"], x, config, dropout_rate=rates[5], rng=rngs[3])
    logits = _dense(params["layer_6"], x, config, relu=False)
    return logits.reshape(b, t, config.n_out).astype(jnp.float32), state
