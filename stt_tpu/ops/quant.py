"""Post-training int8 quantization for the deploy/inference path.

Reference parity: the reference's default export is a quantized TFLite
artifact (training/coqui_stt_training/export.py:126-150 uses
TFLiteConverter with Optimize.DEFAULT); this is the TPU-native
counterpart. The MXU runs int8 at twice the bf16 rate (v5e: 394 TOPS vs
197 TFLOPS), and the DeepSpeech geometry is unusually
quantization-friendly: every hidden activation is range-bounded by
construction — clipped ReLU outputs live in [0, relu_clip]
(deepspeech_model.py relu_clip=20) and LSTM hidden outputs in (-1, 1) —
so activation scales are static; only the windowed-MFCC input scale
needs calibration.

Scheme: symmetric int8, per-output-channel weight scales, per-tensor
activation scales. y = (x_q @ W_q) * (s_x * s_w) + b computed in int32
on the MXU, dequantized and biased in f32 on the VPU. The LSTM
recurrence also runs int8: h is bounded in (-1, 1) so h_q = round(h*127)
quantizes without calibration, and the fused Pallas kernel
(lstm_kernel.lstm_fused_q_impl) does the per-step h_q @ W_h_q matmul in
int8 with the gate math in f32 — validated transcript-equal on the
smoke gate (tests/test_quant.py). The lax.scan fallback mirrors the
same quantization so CPU and TPU agree bit-for-bit on gate inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stt_tpu.models.deepspeech import (
    ModelConfig,
    Params,
    create_overlapping_windows,
)


@dataclasses.dataclass
class QuantizedDense:
    w_q: jax.Array  # [n_in, n_out] int8
    w_scale: jax.Array  # [n_out] f32, per output channel
    b: jax.Array  # [n_out] f32
    x_scale: float  # static activation scale of this layer's input


# pytree: arrays are children, the static activation scale is aux data —
# quantized params pass straight through jax.jit like regular params
jax.tree_util.register_pytree_node(
    QuantizedDense,
    lambda q: ((q.w_q, q.w_scale, q.b), q.x_scale),
    lambda x_scale, children: QuantizedDense(*children, x_scale=x_scale),
)


QuantizedParams = Dict[str, object]


def _quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: scale[j] = max_i |W[i,j]| / 127."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_params(
    params: Params,
    config: ModelConfig,
    calibration_features: Optional[jax.Array] = None,
) -> QuantizedParams:
    """Quantize trained f32 params for int8 inference.

    calibration_features: [B, T, n_input] MFCCs used only to pick the
    input scale of layer_1 (the one unbounded activation). Defaults to a
    conservative |x| <= 64 bound on MFCC magnitudes when omitted.
    """
    ln_layers = [
        name
        for name in ("layer_1", "layer_2", "layer_3", "layer_5", "layer_6")
        if isinstance(params.get(name), dict) and "ln_scale" in params[name]
    ]
    if ln_layers:
        # _qdense_apply has no layer-norm step and the static
        # relu_clip-derived activation scales assume no post-matmul
        # renormalization; quantizing would silently change logits.
        raise ValueError(
            "int8 activation quantization does not support layer_norm "
            f"models (ln params on {ln_layers}); use the weight-only "
            "artifact (flatten_weight_only) instead"
        )
    if calibration_features is not None:
        x = create_overlapping_windows(
            jnp.asarray(calibration_features, jnp.float32), config.n_context
        )
        in_scale = float(jnp.max(jnp.abs(x))) / 127.0
    else:
        # MFCC c0 is the dominant coefficient (log frame energy); for
        # full-scale 16-bit audio it tops out near 60, so 64 bounds any
        # real input without clipping (LDC93S1 peaks at ~52)
        in_scale = 64.0 / 127.0
    in_scale = max(in_scale, 1e-6)

    clip_scale = float(config.relu_clip) / 127.0
    h_scale = 1.0 / 127.0  # LSTM h = sigmoid * tanh in (-1, 1)

    def qdense(name: str, x_scale: float) -> QuantizedDense:
        w_q, w_scale = _quantize_weight(params[name]["w"])
        return QuantizedDense(
            w_q=w_q,
            w_scale=w_scale,
            b=jnp.asarray(params[name]["b"], jnp.float32),
            x_scale=x_scale,
        )

    # LSTM kernel splits into input projection (quantized) and the
    # recurrent half. The recurrence also quantizes: h is bounded in
    # (-1, 1), so inside the fused kernel h_q = round(h*127) int8 and
    # the per-step matmul runs int8; step_scale folds w_h's per-channel
    # scale with the 1/127 h scale. The lax.scan fallback (CPU) uses the
    # dequantized w_h so both paths share semantics.
    n_in = params["lstm"]["kernel"].shape[1] // 4  # n_cell == n_in here
    kernel = params["lstm"]["kernel"]
    w_x = kernel[: kernel.shape[0] - n_in]
    w_h = kernel[kernel.shape[0] - n_in :]
    wx_q, wx_scale = _quantize_weight(w_x)
    wh_q, wh_scale = _quantize_weight(w_h)

    return {
        "layer_1": qdense("layer_1", in_scale),
        "layer_2": qdense("layer_2", clip_scale),
        "layer_3": qdense("layer_3", clip_scale),
        "lstm_in": QuantizedDense(
            w_q=wx_q,
            w_scale=wx_scale,
            b=jnp.asarray(params["lstm"]["bias"], jnp.float32),
            x_scale=clip_scale,
        ),
        "lstm": params["lstm"],  # full kernel (scan fallback)
        "lstm_rec": {
            "w_h_q": wh_q,
            "step_scale": (wh_scale / 127.0).reshape(1, -1),
        },
        "layer_5": qdense("layer_5", h_scale),
        "layer_6": qdense("layer_6", clip_scale),
    }


def _qdense_apply(
    q: QuantizedDense, x: jax.Array, relu_clip: Optional[float]
) -> jax.Array:
    """x f32 [M, n_in] -> f32 [M, n_out] via int8 MXU matmul."""
    x_q = jnp.clip(jnp.round(x / q.x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x_q, q.w_q, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (q.x_scale * q.w_scale) + q.b
    if relu_clip is not None:
        out = jnp.minimum(jax.nn.relu(out), relu_clip)
    return out


def apply_model_quantized(
    qparams: QuantizedParams,
    features: jax.Array,
    seq_len: Optional[jax.Array] = None,
    config: ModelConfig = ModelConfig(),
    previous_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    overlap: bool = True,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """int8 forward pass; same signature/returns as apply_model (minus
    dropout — this is inference-only)."""
    b, t = features.shape[:2]
    x = (
        create_overlapping_windows(features, config.n_context)
        if overlap
        else features
    )
    x = x.reshape(b * t, -1).astype(jnp.float32)
    x = _qdense_apply(qparams["layer_1"], x, config.relu_clip)
    x = _qdense_apply(qparams["layer_2"], x, config.relu_clip)
    x = _qdense_apply(qparams["layer_3"], x, config.relu_clip)

    # LSTM input projection in int8 (same FLOPs as the recurrence), then
    # the recurrence itself in the bf16 fused kernel / scan
    q_in = qparams["lstm_in"]
    x_proj = _qdense_apply(q_in, x, None)  # bias added here (f32)
    x_proj = x_proj.reshape(b, t, -1).transpose(1, 0, 2)

    n_cell = config.n_cell_dim
    if previous_state is None:
        c0 = jnp.zeros((b, n_cell), jnp.float32)
        h0 = jnp.zeros((b, n_cell), jnp.float32)
    else:
        c0 = previous_state[0].astype(jnp.float32)
        h0 = previous_state[1].astype(jnp.float32)

    use_fused = config.fused_lstm
    if use_fused:
        from stt_tpu.ops.lstm_kernel import fused_lstm_supported

        # pallas_call has no GSPMD partitioning rule: single-device only
        use_fused = (
            fused_lstm_supported(b, n_cell, config.dtype)
            and jax.device_count() == 1
        )
    if use_fused:
        from stt_tpu.ops.lstm_kernel import lstm_fused_q_impl

        store_dtype = (
            jnp.float32 if config.dtype == jnp.float32 else config.dtype
        )
        seq = (
            jnp.full((b, 1), t, jnp.int32)
            if seq_len is None
            else seq_len.astype(jnp.int32).reshape(b, 1)
        )
        interpret = jax.devices()[0].platform == "cpu"
        outputs, c, h = lstm_fused_q_impl(
            x_proj.astype(store_dtype),
            qparams["lstm_rec"]["w_h_q"],
            qparams["lstm_rec"]["step_scale"],
            c0,
            h0,
            seq,
            interpret=interpret,
        )
        state = (c, h)
    else:
        outputs, state = _lstm_recurrence_scan(
            x_proj,
            qparams["lstm_rec"]["w_h_q"],
            qparams["lstm_rec"]["step_scale"],
            c0,
            h0,
            seq_len,
        )
    x = outputs.transpose(1, 0, 2).reshape(b * t, -1)

    x = _qdense_apply(qparams["layer_5"], x, config.relu_clip)
    logits = _qdense_apply(qparams["layer_6"], x, None)
    return logits.reshape(b, t, config.n_out).astype(jnp.float32), state


def _lstm_recurrence_scan(x_proj, w_h_q, step_scale, c0, h0, seq_len):
    """Recurrence-only scan over a precomputed (biased) input projection —
    the lax.scan twin of the int8 fused kernel (same quantization of h
    and w_h each step, so CPU and TPU paths produce the same numbers)."""
    T = x_proj.shape[0]

    def step(carry, inp):
        c, h = carry
        xp_t, t = inp
        h_q = jnp.round(h * 127.0).astype(jnp.int8)
        acc = jnp.matmul(h_q, w_h_q, preferred_element_type=jnp.int32)
        z = xp_t.astype(jnp.float32) + acc.astype(jnp.float32) * step_scale
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
    (c, h), outputs = jax.lax.scan(step, (c0, h0), (x_proj, ts))
    return outputs, (c, h)


# --- weight-only quantized artifact (dynamic-range semantics) ----------
#
# The reference's exported .tflite (Optimize.DEFAULT) stores int8 weights
# and dequantizes at load ("dynamic range quantization") — ~4x smaller
# artifact, float compute. These helpers give the artifact bundle the
# same option: flatten_weight_only() -> npz-ready dict of int8 weights +
# scales; dequantize_flat() -> regular f32 params for the runtime.

def flatten_weight_only(params: Params, n_cell: int) -> Dict[str, "jnp.ndarray"]:
    import numpy as np

    flat: Dict[str, object] = {}
    for name in ("layer_1", "layer_2", "layer_3", "layer_5", "layer_6"):
        w_q, w_scale = _quantize_weight(params[name]["w"])
        flat[f"{name}/w_q"] = np.asarray(w_q)
        flat[f"{name}/w_scale"] = np.asarray(w_scale, np.float32)
        flat[f"{name}/b"] = np.asarray(params[name]["b"], np.float32)
        if "ln_scale" in params[name]:
            flat[f"{name}/ln_scale"] = np.asarray(
                params[name]["ln_scale"], np.float32
            )
            flat[f"{name}/ln_bias"] = np.asarray(
                params[name]["ln_bias"], np.float32
            )
    kernel = params["lstm"]["kernel"]
    w_x = kernel[: kernel.shape[0] - n_cell]
    w_h = kernel[kernel.shape[0] - n_cell :]
    wx_q, wx_scale = _quantize_weight(w_x)
    flat["lstm/w_x_q"] = np.asarray(wx_q)
    flat["lstm/w_x_scale"] = np.asarray(wx_scale, np.float32)
    # the recurrence half feeds the carry chain — keep 16-bit mantissa
    flat["lstm/w_h_f16"] = np.asarray(w_h, np.float16)
    flat["lstm/bias"] = np.asarray(params["lstm"]["bias"], np.float32)
    return flat


def dequantize_flat(flat: Dict[str, object]) -> Params:
    import numpy as np

    params: Params = {}
    for name in ("layer_1", "layer_2", "layer_3", "layer_5", "layer_6"):
        layer = {
            "w": flat[f"{name}/w_q"].astype(np.float32)
            * flat[f"{name}/w_scale"],
            "b": flat[f"{name}/b"],
        }
        if f"{name}/ln_scale" in flat:
            layer["ln_scale"] = flat[f"{name}/ln_scale"]
            layer["ln_bias"] = flat[f"{name}/ln_bias"]
        params[name] = layer
    w_x = flat["lstm/w_x_q"].astype(np.float32) * flat["lstm/w_x_scale"]
    w_h = flat["lstm/w_h_f16"].astype(np.float32)
    params["lstm"] = {
        "kernel": np.concatenate([w_x, w_h], axis=0),
        "bias": flat["lstm/bias"],
    }
    return params
