"""Pallas TPU kernel: fused LSTM recurrence with the recurrent weight
matrix resident in VMEM.

Why: the LSTM scan is the model's bottleneck and XLA's lax.scan lowering
re-reads W_h [H, 4H] from HBM every timestep (~33 MB/step in bf16 at the
2048 geometry). v5e has 128 MB of VMEM, so this kernel loads W_h once,
double-buffers the precomputed input projections x_proj[t] in and the
hidden outputs out[t] back to HBM, and runs the per-step
[B,H]x[H,4H] gate matmul on the MXU with everything hot. The only
steady-state HBM traffic is 2*B*4H values/step instead of H*4H.

Inference path only (the training step keeps the autodiff-friendly
lax.scan; CTC training gradients never hit this kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_lstm_supported(batch: int, n_cell: int, w_dtype) -> bool:
    """Shape/capacity guard: W_h + buffers must fit VMEM and tile onto
    the MXU cleanly."""
    itemsize = jnp.dtype(w_dtype).itemsize
    vmem_needed = (
        n_cell * 4 * n_cell * itemsize  # W_h
        + 2 * batch * 4 * n_cell * itemsize  # x_proj double buffer
        + 2 * batch * n_cell * 4  # out double buffer
        + 4 * batch * n_cell * 4  # c/h carry + outputs
    )
    return (
        n_cell % 128 == 0
        and batch % 8 == 0
        and vmem_needed < 110 * 1024 * 1024
    )


def _kernel(xp_hbm, w_h_ref, c0_ref, h0_ref, seq_ref, out_hbm, c_ref, h_ref,
            xbuf, obuf, xsems, osems):
    T = xp_hbm.shape[0]

    def x_dma(slot, t):
        return pltpu.make_async_copy(xp_hbm.at[t], xbuf.at[slot], xsems.at[slot])

    def o_dma(slot, t):
        return pltpu.make_async_copy(obuf.at[slot], out_hbm.at[t], osems.at[slot])

    c_ref[:] = c0_ref[:]
    h_ref[:] = h0_ref[:]
    x_dma(0, 0).start()

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < T)
        def _():
            x_dma((t + 1) % 2, t + 1).start()

        x_dma(slot, t).wait()
        c = c_ref[:]
        h = h_ref[:]
        z = xbuf[slot].astype(jnp.float32) + jnp.dot(
            h.astype(w_h_ref.dtype), w_h_ref[:],
            preferred_element_type=jnp.float32,
        )
        n_cell = h.shape[-1]
        i = z[:, :n_cell]
        g = z[:, n_cell : 2 * n_cell]
        f = z[:, 2 * n_cell : 3 * n_cell]
        o = z[:, 3 * n_cell :]
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

        valid = t < seq_ref[:]  # [B, 1] mask broadcasts over [B, H]
        c_ref[:] = jnp.where(valid, c_new, c)
        h_ref[:] = jnp.where(valid, h_new, h)

        # emit h (zeros past seq end), double-buffered back to HBM
        @pl.when(t >= 2)
        def _():
            o_dma(slot, t - 2).wait()

        obuf[slot] = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        o_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    # drain the last (up to two) output DMAs
    @pl.when(T >= 2)
    def _():
        o_dma((T - 2) % 2, T - 2).wait()

    o_dma((T - 1) % 2, T - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_fused_impl(x_proj, w_h, c0, h0, seq_len, interpret=False):
    T, B, four_h = x_proj.shape
    n_cell = four_h // 4
    out, c, h = pl.pallas_call(
        _kernel,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, n_cell), jnp.float32),
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_proj stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_h resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, four_h), x_proj.dtype),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x_proj, w_h, c0, h0, seq_len)
    return out, c, h


def lstm_fused(
    params,
    x: jax.Array,
    seq_len: Optional[jax.Array] = None,
    initial_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Drop-in for stt_tpu.models.lstm.lstm_scan (inference).

    x: [T, B, n_in] -> (outputs [T, B, n_cell] f32, (c, h))."""
    T, B, n_in = x.shape
    n_cell = params["kernel"].shape[1] // 4
    dtype = jnp.dtype(compute_dtype)
    w_x = params["kernel"][:n_in].astype(dtype)
    w_h = params["kernel"][n_in:].astype(dtype)
    # x_proj is the program's largest temp ([T, B, 4H]); storing it in the
    # compute dtype halves both its HBM footprint and the per-step DMA
    # stream into the kernel. Accumulation stays f32 (bias added in f32
    # before the down-cast; gates are computed in f32 inside the kernel).
    store_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    x_proj = (
        (
            jnp.matmul(
                x.reshape(T * B, n_in).astype(dtype), w_x,
                preferred_element_type=jnp.float32,
            )
            + params["bias"]
        )
        .astype(store_dtype)
        .reshape(T, B, 4 * n_cell)
    )
    if initial_state is None:
        c0 = jnp.zeros((B, n_cell), jnp.float32)
        h0 = jnp.zeros((B, n_cell), jnp.float32)
    else:
        c0 = initial_state[0].astype(jnp.float32)
        h0 = initial_state[1].astype(jnp.float32)
    if seq_len is None:
        seq = jnp.full((B, 1), T, jnp.int32)
    else:
        seq = seq_len.astype(jnp.int32).reshape(B, 1)
    interpret = jax.devices()[0].platform == "cpu"
    out, c, h = _lstm_fused_impl(x_proj, w_h, c0, h0, seq, interpret=interpret)
    return out, (c, h)


# --- int8 recurrence variant -------------------------------------------
#
# For the quantized inference path (stt_tpu.ops.quant): h is bounded in
# (-1, 1) by construction (sigmoid*tanh), so it quantizes to int8 with a
# fixed scale 1/127 each step and the per-step [B,H]x[H,4H] gate matmul
# runs on the MXU's int8 path (2x the bf16 rate on v5e). W_h is int8
# with per-output-channel scales; the accumulator dequantizes to f32
# before the bias/x_proj add, so gate math and the (c, h) carry stay
# f32 — only the matmul operands are quantized.


def _kernel_q(xp_hbm, w_hq_ref, ws_ref, c0_ref, h0_ref, seq_ref, out_hbm,
              c_ref, h_ref, xbuf, obuf, xsems, osems):
    T = xp_hbm.shape[0]

    def x_dma(slot, t):
        return pltpu.make_async_copy(xp_hbm.at[t], xbuf.at[slot], xsems.at[slot])

    def o_dma(slot, t):
        return pltpu.make_async_copy(obuf.at[slot], out_hbm.at[t], osems.at[slot])

    c_ref[:] = c0_ref[:]
    h_ref[:] = h0_ref[:]
    x_dma(0, 0).start()

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < T)
        def _():
            x_dma((t + 1) % 2, t + 1).start()

        x_dma(slot, t).wait()
        c = c_ref[:]
        h = h_ref[:]
        h_q = jnp.round(h * 127.0).astype(jnp.int8)
        acc = jnp.dot(h_q, w_hq_ref[:], preferred_element_type=jnp.int32)
        z = (
            xbuf[slot].astype(jnp.float32)
            + acc.astype(jnp.float32) * ws_ref[:]
        )
        n_cell = h.shape[-1]
        i = z[:, :n_cell]
        g = z[:, n_cell : 2 * n_cell]
        f = z[:, 2 * n_cell : 3 * n_cell]
        o = z[:, 3 * n_cell :]
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

        valid = t < seq_ref[:]
        c_ref[:] = jnp.where(valid, c_new, c)
        h_ref[:] = jnp.where(valid, h_new, h)

        @pl.when(t >= 2)
        def _():
            o_dma(slot, t - 2).wait()

        obuf[slot] = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        o_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)

    @pl.when(T >= 2)
    def _():
        o_dma((T - 2) % 2, T - 2).wait()

    o_dma((T - 1) % 2, T - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_fused_q_impl(x_proj, w_h_q, wh_step_scale, c0, h0, seq_len,
                      interpret=False):
    """x_proj: [T, B, 4H] (bf16/f32, bias included); w_h_q: [H, 4H] int8;
    wh_step_scale: [1, 4H] f32 = per-channel w_h scale / 127 (folds the
    h quantization scale)."""
    T, B, four_h = x_proj.shape
    n_cell = four_h // 4
    out, c, h = pl.pallas_call(
        _kernel_q,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, n_cell), jnp.float32),
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_proj stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_h int8 resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scales
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, four_h), x_proj.dtype),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x_proj, w_h_q, wh_step_scale, c0, h0, seq_len)
    return out, c, h
