"""Fused LSTM recurrence for TRAINING: Pallas forward + backward kernels
under a jax.custom_vjp.

Why autodiff-of-scan is slow here: XLA differentiates the recurrence by
carrying the dW_h accumulator ([H, 4H], 67 MB f32 at the 2048 geometry)
through every backward step — ~67 GB of HBM carry traffic over a 500-step
utterance, an order of magnitude more than the matmul FLOPs need. The
classic decomposition avoids it:

  forward:  run the recurrence once, stashing per-step pre-activations
            z_t (bf16) and cell states c_t; h_t is the output anyway.
  backward: reverse sweep carrying only (dc, dh) [B, H]; per step the
            gate grads dz_t come from stashed z_t/c_t (elementwise) and
            dh_{t-1} = dz_t @ W_h^T is the only matmul (W_h^T stays
            resident in VMEM). dz is written to HBM.
  outside:  dW_h = h_prev^T @ dz and dx_proj = dz are two large
            MXU-friendly matmuls — no per-step weight-gradient carry.

Semantics match stt_tpu.models.lstm.lstm_scan (icfo gate order,
forget_bias=0, seq-length masking freezes state and zeroes outputs).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_lstm_train_supported(batch: int, n_cell: int, w_dtype) -> bool:
    """VMEM guard for the training kernels (fwd holds W_h + 3 output
    streams; bwd holds W_h^T + 4 input streams)."""
    itemsize = jnp.dtype(w_dtype).itemsize
    vmem_needed = (
        n_cell * 4 * n_cell * itemsize  # W_h (or W_h^T)
        + 2 * batch * 4 * n_cell * itemsize  # z double buffer
        + 2 * batch * 4 * n_cell * 4  # dz double buffer (f32)
        + 6 * batch * n_cell * 4  # h/c buffers + carries
    )
    return (
        n_cell % 128 == 0
        and batch % 8 == 0
        and vmem_needed < 100 * 1024 * 1024
    )


# --- forward kernel: recurrence + stash (hs, cs, zs) --------------------


def _fwd_kernel(xp_hbm, w_h_ref, c0_ref, h0_ref, seq_ref,
                hs_hbm, cs_hbm, zs_hbm, c_out, h_out,
                xbuf, hbuf, cbuf, zbuf, xsems, hsems, csems, zsems):
    T = xp_hbm.shape[0]

    def x_dma(slot, t):
        return pltpu.make_async_copy(xp_hbm.at[t], xbuf.at[slot], xsems.at[slot])

    def h_dma(slot, t):
        return pltpu.make_async_copy(hbuf.at[slot], hs_hbm.at[t], hsems.at[slot])

    def c_dma(slot, t):
        return pltpu.make_async_copy(cbuf.at[slot], cs_hbm.at[t], csems.at[slot])

    def z_dma(slot, t):
        return pltpu.make_async_copy(zbuf.at[slot], zs_hbm.at[t], zsems.at[slot])

    c_out[:] = c0_ref[:]
    h_out[:] = h0_ref[:]
    x_dma(0, 0).start()

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < T)
        def _():
            x_dma((t + 1) % 2, t + 1).start()

        x_dma(slot, t).wait()
        c = c_out[:]
        h = h_out[:]
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

        valid = t < seq_ref[:]
        c_out[:] = jnp.where(valid, c_new, c)
        h_out[:] = jnp.where(valid, h_new, h)

        @pl.when(t >= 2)
        def _():
            h_dma(slot, t - 2).wait()
            c_dma(slot, t - 2).wait()
            z_dma(slot, t - 2).wait()

        hbuf[slot] = jnp.where(valid, h_new, jnp.zeros_like(h_new))
        cbuf[slot] = c_out[:]
        zbuf[slot] = z.astype(zbuf.dtype)
        h_dma(slot, t).start()
        c_dma(slot, t).start()
        z_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)

    @pl.when(T >= 2)
    def _():
        h_dma((T - 2) % 2, T - 2).wait()
        c_dma((T - 2) % 2, T - 2).wait()
        z_dma((T - 2) % 2, T - 2).wait()

    h_dma((T - 1) % 2, T - 1).wait()
    c_dma((T - 1) % 2, T - 1).wait()
    z_dma((T - 1) % 2, T - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_train_fwd_impl(x_proj, w_h, c0, h0, seq, interpret=False):
    T, B, four_h = x_proj.shape
    n_cell = four_h // 4
    return pl.pallas_call(
        _fwd_kernel,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, n_cell), jnp.float32),  # hs
            jax.ShapeDtypeStruct((T, B, n_cell), jnp.float32),  # cs
            jax.ShapeDtypeStruct((T, B, four_h), jnp.bfloat16),  # zs
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),  # c_T
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),  # h_T
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, four_h), x_proj.dtype),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.VMEM((2, B, four_h), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(x_proj, w_h, c0, h0, seq)


# --- backward kernel: reverse sweep -> dz, dc0, dh0 ---------------------


def _bwd_kernel(zs_hbm, cs_hbm, csprev_hbm, dout_hbm, w_ht_ref, seq_ref,
                dcT_ref, dhT_ref, dz_hbm, dc0_out, dh0_out,
                zbuf, cbuf, cprevbuf, dobuf, dzbuf,
                zsems, csems, cpsems, dosems, dzsems):
    T = zs_hbm.shape[0]
    B, n_cell = dc0_out.shape

    def z_dma(slot, t):
        return pltpu.make_async_copy(zs_hbm.at[t], zbuf.at[slot], zsems.at[slot])

    def c_dma(slot, t):
        return pltpu.make_async_copy(cs_hbm.at[t], cbuf.at[slot], csems.at[slot])

    def cp_dma(slot, t):
        return pltpu.make_async_copy(
            csprev_hbm.at[t], cprevbuf.at[slot], cpsems.at[slot]
        )

    def do_dma(slot, t):
        return pltpu.make_async_copy(
            dout_hbm.at[t], dobuf.at[slot], dosems.at[slot]
        )

    def dz_dma(slot, t):
        return pltpu.make_async_copy(dzbuf.at[slot], dz_hbm.at[t], dzsems.at[slot])

    dc0_out[:] = dcT_ref[:]
    dh0_out[:] = dhT_ref[:]

    def start_loads(slot, t):
        z_dma(slot, t).start()
        c_dma(slot, t).start()
        cp_dma(slot, t).start()
        do_dma(slot, t).start()

    start_loads((T - 1) % 2, T - 1)

    def body(k, _):
        t = T - 1 - k
        slot = t % 2

        @pl.when(t - 1 >= 0)
        def _():
            start_loads((t - 1) % 2, t - 1)

        z_dma(slot, t).wait()
        c_dma(slot, t).wait()
        cp_dma(slot, t).wait()
        do_dma(slot, t).wait()

        z = zbuf[slot].astype(jnp.float32)
        c_t = cbuf[slot]
        c_prev = cprevbuf[slot]
        i = jax.nn.sigmoid(z[:, :n_cell])
        g = jnp.tanh(z[:, n_cell : 2 * n_cell])
        f = jax.nn.sigmoid(z[:, 2 * n_cell : 3 * n_cell])
        o = jax.nn.sigmoid(z[:, 3 * n_cell :])
        tanh_c = jnp.tanh(c_t)

        dc = dc0_out[:]
        dh = dh0_out[:]
        dh_total = dobuf[slot] + dh
        dc_total = dc + dh_total * o * (1.0 - tanh_c * tanh_c)

        di = dc_total * g * i * (1.0 - i)
        dg = dc_total * i * (1.0 - g * g)
        df = dc_total * c_prev * f * (1.0 - f)
        do = dh_total * tanh_c * o * (1.0 - o)
        dz = jnp.concatenate([di, dg, df, do], axis=-1)

        valid = t < seq_ref[:]
        dz = jnp.where(valid, dz, jnp.zeros_like(dz))
        dh_prev = jnp.dot(
            dz.astype(w_ht_ref.dtype), w_ht_ref[:],
            preferred_element_type=jnp.float32,
        )
        dc_prev = dc_total * f
        dc0_out[:] = jnp.where(valid, dc_prev, dc)
        dh0_out[:] = jnp.where(valid, dh_prev, dh)

        # reverse order: at reverse-step k we emit t; the t+2 write (from
        # reverse-step k-2, same slot) must land before reusing the slot
        @pl.when(k >= 2)
        def _():
            dz_dma(slot, t + 2).wait()

        dzbuf[slot] = dz.astype(dzbuf.dtype)
        dz_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)

    # drain the last (up to two) dz writes: t = 0 and t = 1
    @pl.when(T >= 2)
    def _():
        dz_dma(1, 1).wait()

    dz_dma(0, 0).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_train_bwd_impl(zs, cs, cs_prev, dout, w_ht, seq, dcT, dhT,
                         interpret=False):
    T, B, four_h = zs.shape
    n_cell = four_h // 4
    return pl.pallas_call(
        _bwd_kernel,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, four_h), jnp.float32),  # dz
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),  # dc0
            jax.ShapeDtypeStruct((B, n_cell), jnp.float32),  # dh0
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zs
            pl.BlockSpec(memory_space=pl.ANY),  # cs
            pl.BlockSpec(memory_space=pl.ANY),  # cs_prev
            pl.BlockSpec(memory_space=pl.ANY),  # dout
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_h^T
            pl.BlockSpec(memory_space=pltpu.VMEM),  # seq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dcT
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dhT
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, four_h), zs.dtype),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.VMEM((2, B, n_cell), jnp.float32),
            pltpu.VMEM((2, B, four_h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(zs, cs, cs_prev, dout, w_ht, seq, dcT, dhT)


# --- custom_vjp recurrence ----------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_recurrence(dtype_name: str, interpret: bool):
    """custom_vjp factory: compute dtype / interpret are static (closed
    over) because custom_vjp arguments must be JAX types."""
    compute_dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def rec(x_proj, w_h, c0, h0, seq):
        hs, _, _, cT, hT = _lstm_train_fwd_impl(
            x_proj, w_h.astype(compute_dtype), c0, h0, seq,
            interpret=interpret,
        )
        return hs, cT, hT

    def rec_fwd(x_proj, w_h, c0, h0, seq):
        hs, cs, zs, cT, hT = _lstm_train_fwd_impl(
            x_proj, w_h.astype(compute_dtype), c0, h0, seq,
            interpret=interpret,
        )
        return (hs, cT, hT), (w_h, c0, h0, seq, hs, cs, zs)

    def rec_bwd(residuals, cotangents):
        w_h, c0, h0, seq, hs, cs, zs = residuals
        d_hs, d_cT, d_hT = cotangents
        w_ht = w_h.astype(compute_dtype).T
        cs_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
        dz, dc0, dh0 = _lstm_train_bwd_impl(
            zs, cs, cs_prev, d_hs.astype(jnp.float32), w_ht, seq,
            d_cT.astype(jnp.float32), d_hT.astype(jnp.float32),
            interpret=interpret,
        )
        # weight grad as one large MXU matmul (no per-step accumulator)
        h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
        dw_h = jnp.einsum(
            "tbh,tbz->hz",
            h_prev.astype(compute_dtype),
            dz.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        # x_proj is stored in the compute dtype (see lstm_train), so its
        # cotangent is too
        return (dz.astype(compute_dtype), dw_h.astype(w_h.dtype), dc0,
                dh0, None)

    rec.defvjp(rec_fwd, rec_bwd)
    return rec


def lstm_train(
    params,
    x: jax.Array,
    seq_len: Optional[jax.Array] = None,
    initial_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    compute_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Drop-in for stt_tpu.models.lstm.lstm_scan on the training path.

    x: [T, B, n_in] -> (outputs [T, B, n_cell] f32, (c, h)); fully
    differentiable w.r.t. params, x, and initial_state."""
    T, B, n_in = x.shape
    n_cell = params["kernel"].shape[1] // 4
    dtype = jnp.dtype(compute_dtype)
    w_x = params["kernel"][:n_in]
    w_h = params["kernel"][n_in:]
    store_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    x_proj = (
        (
            jnp.matmul(
                x.reshape(T * B, n_in).astype(dtype),
                w_x.astype(dtype),
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
    seq = (
        jnp.full((B, 1), T, jnp.int32)
        if seq_len is None
        else seq_len.astype(jnp.int32).reshape(B, 1)
    )
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    rec = _make_recurrence(dtype.name, bool(interpret))
    hs, cT, hT = rec(x_proj, w_h, c0, h0, seq)
    return hs, (cT, hT)
