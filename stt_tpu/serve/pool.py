"""StreamPool: many concurrent streams, one batched device program.

The reference streaming engine is hard-wired to BATCH_SIZE=1
(modelstate.h:16) — each stream pays a full model invocation. On TPU the
chip is wildly underutilized at batch 1, so the pool packs every live
stream's 16-frame chunk step into ONE batched call:

  mfcc:  [S, chunk_samples] -> [S, 16, n_mfcc]      (S = pool slots)
  infer: ([S,16,window_input], seq_len[S], c[S,H], h[S,H]) -> probs + state

Slots with no ready audio tick with seq_len=0 — the LSTM masking freezes
their state and emits nothing, so stragglers cost no correctness. Per
stream the math is identical to the single-stream path (equivalence
test); decoders stay host-side per stream.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stt_tpu.models import apply_model
from stt_tpu.stream.streaming import N_STEPS


class PooledStream:
    """Handle for one slot. Interface mirrors serve.Stream."""

    def __init__(self, pool: "StreamPool", slot: int):
        self._pool = pool
        self._slot = slot

    def feed_audio_content(self, audio) -> None:
        self._pool._feed(self._slot, audio)

    def intermediate_decode(self) -> str:
        self._pool._tick(force=False)
        self._pool._drain()
        return self._pool._decoders[self._slot].decode(1)[0].transcript

    def finish_stream(self) -> str:
        return self._pool._finish(self._slot).transcript

    def finish_stream_with_metadata(self, num_results: int = 1):
        self._pool._flush_slot(self._slot)
        results = self._pool._decoders[self._slot].decode(num_results)
        self._pool._release(self._slot)
        return self._pool._model._to_metadata(results)


class StreamPool:
    def __init__(self, model, max_streams: int = 8,
                 device_prune: Optional[bool] = None,
                 device_decode: Optional[bool] = None):
        self._model = model
        self.max_streams = max_streams
        runtime = model._runtime
        self._runtime = runtime
        mc = runtime.model_config
        fc = runtime.feature_config
        # device_decode: per-slot stateful on-device beam decoders
        # (decode/device.DeviceStreamingDecoder) consume their row of
        # the batched probs without any host transfer while feeding.
        # OPT-IN (see stream/streaming.py: the sequential per-chunk
        # beam scan costs more than the host pull on a single stream;
        # it pays when host decode CPU is saturated by many streams).
        self.device_decode = bool(device_decode) and model.scorer is None
        if device_prune is None:
            from stt_tpu.stream.streaming import auto_device_prune

            device_prune = auto_device_prune(
                mc.n_out, model._cutoff_top_n, model._cutoff_prob
            )
        self.device_prune = bool(device_prune) and not self.device_decode
        self._chunk_samples = runtime.chunk_samples
        n = mc.n_cell_dim
        self._c = jnp.zeros((max_streams, n), jnp.float32)
        self._h = jnp.zeros((max_streams, n), jnp.float32)
        self._audio: List[np.ndarray] = [
            np.zeros((0,), np.float32) for _ in range(max_streams)
        ]
        self._pending: List[List[np.ndarray]] = [[] for _ in range(max_streams)]
        self._left_ctx = [
            np.zeros((mc.n_context, mc.n_input), np.float32)
            for _ in range(max_streams)
        ]
        self._decoders: List = [None] * max_streams
        self._live = [False] * max_streams

        def batched_mfcc(audio):
            from stt_tpu.frontend import audio_to_mfcc

            return audio_to_mfcc(audio, fc)

        def batched_infer(params, windowed, seq_len, c, h):
            logits, (c2, h2) = apply_model(
                params, windowed, seq_len=seq_len, config=mc,
                previous_state=(c, h), overlap=False,
            )
            probs = jax.nn.softmax(logits, axis=-1)
            if self.device_prune:
                from stt_tpu.decode.device import prune_emissions

                return prune_emissions(
                    probs,
                    cutoff_top_n=model._cutoff_top_n,
                    cutoff_prob=model._cutoff_prob,
                ), c2, h2
            return probs, c2, h2

        self._mfcc = jax.jit(batched_mfcc)
        self._infer = jax.jit(batched_infer)

        # fused steady-state round: MFCC + context stacking + windowing +
        # acoustic step for EVERY slot in one dispatch (the per-dispatch
        # tunnel round-trip is what bounds pool throughput, exactly as in
        # the single-stream fused chunk step, stream/streaming.py).
        # mode per slot: 0 = idle (masked), 1 = prime (first chunk fills
        # the frame carry, nothing emits), 2 = emit.
        n_ctx = mc.n_context

        def fused_round(params, chunks, left, pend, c, h, mode):
            from stt_tpu.frontend import audio_to_mfcc

            new16 = jax.vmap(lambda a: audio_to_mfcc(a, fc))(chunks)
            stacked = jnp.concatenate(
                [left, pend, new16[:, :n_ctx]], axis=1
            )  # [S, N_STEPS + 2*n_ctx, n_input]
            width = mc.window_width
            windowed = jnp.stack(
                [
                    stacked[:, i : i + width].reshape(stacked.shape[0], -1)
                    for i in range(N_STEPS)
                ],
                axis=1,
            )
            seq_len = jnp.where(mode == 2, N_STEPS, 0).astype(jnp.int32)
            logits, (c2, h2) = apply_model(
                params, windowed, seq_len=seq_len, config=mc,
                previous_state=(c, h), overlap=False,
            )
            probs = jax.nn.softmax(logits, axis=-1)
            has = (mode >= 1)[:, None, None]
            emit = (mode == 2)[:, None, None]
            left2 = jnp.where(emit, stacked[:, N_STEPS : N_STEPS + n_ctx], left)
            pend2 = jnp.where(has, new16, pend)
            if self.device_prune:
                from stt_tpu.decode.device import prune_emissions

                out = prune_emissions(
                    probs,
                    cutoff_top_n=model._cutoff_top_n,
                    cutoff_prob=model._cutoff_prob,
                )
            else:
                out = probs
            return out, left2, pend2, c2, h2

        self._fused_round = jax.jit(fused_round)
        # device-resident frame carries (authoritative for primed slots;
        # host _pending/_left_ctx take over only at flush)
        self._left_dev = jnp.zeros(
            (max_streams, mc.n_context, mc.n_input), jnp.float32
        )
        self._pend_dev = jnp.zeros(
            (max_streams, N_STEPS, mc.n_input), jnp.float32
        )
        self._primed = np.zeros((max_streams,), bool)
        self._inflight = None  # (out_device, {slot: valid})

    # -- slot management ---------------------------------------------------

    def create_stream(self) -> PooledStream:
        from stt_tpu.decode.beam import make_decoder_state

        for slot in range(self.max_streams):
            if not self._live[slot]:
                self._live[slot] = True
                self._audio[slot] = np.zeros((0,), np.float32)
                self._pending[slot] = []
                mc = self._runtime.model_config
                self._left_ctx[slot] = np.zeros(
                    (mc.n_context, mc.n_input), np.float32
                )
                self._c = self._c.at[slot].set(0.0)
                self._h = self._h.at[slot].set(0.0)
                self._left_dev = self._left_dev.at[slot].set(0.0)
                self._pend_dev = self._pend_dev.at[slot].set(0.0)
                self._primed[slot] = False
                if self.device_decode:
                    from stt_tpu.decode.device import DeviceStreamingDecoder

                    self._decoders[slot] = DeviceStreamingDecoder(
                        self._runtime.alphabet,
                        self._model._beam_width,
                        cutoff_prob=self._model._cutoff_prob,
                        cutoff_top_n=self._model._cutoff_top_n,
                    )
                else:
                    self._decoders[slot] = make_decoder_state(
                        self._runtime.alphabet,
                        self._model._beam_width,
                        cutoff_prob=self._model._cutoff_prob,
                        cutoff_top_n=self._model._cutoff_top_n,
                        scorer=self._model.scorer,
                        hot_words=self._model.hot_words or None,
                    )
                return PooledStream(self, slot)
        raise RuntimeError(f"stream pool exhausted ({self.max_streams} slots)")

    def _release(self, slot: int) -> None:
        self._live[slot] = False
        self._decoders[slot] = None
        self._primed[slot] = False
        self._pending[slot] = []

    # -- feeding / ticking -------------------------------------------------

    def _feed(self, slot: int, audio) -> None:
        audio = np.asarray(audio)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        self._audio[slot] = np.concatenate(
            [self._audio[slot], audio.astype(np.float32)]
        )
        self._tick(force=False)

    def _mfcc_ready(self, slot: int) -> bool:
        return len(self._audio[slot]) >= self._chunk_samples

    def _tick(self, force: bool) -> None:
        """Advance the pool in fused batched rounds.

        A round fires when every live slot is chunk-ready (the
        round-robin serving pattern: one round per 320 ms across the
        whole pool) or as soon as any slot is 2+ chunks deep (laggards
        must not stall the pool). Slots without audio tick masked
        (mode 0); a slot's first chunk only fills its frame carry
        (mode 1, priming); steady slots emit (mode 2)."""
        fc = self._runtime.feature_config
        step = N_STEPS * fc.step_samples
        while True:
            live = [s for s in range(self.max_streams) if self._live[s]]
            ready = [s for s in live if self._mfcc_ready(s)]
            if not ready:
                break
            if not force:
                all_ready = len(ready) == len(live)
                deep = any(
                    len(self._audio[s]) >= self._chunk_samples + step
                    for s in ready
                )
                if not (all_ready or deep):
                    break
            chunks = np.zeros(
                (self.max_streams, self._chunk_samples), np.float32
            )
            mode = np.zeros((self.max_streams,), np.int32)
            for s in ready:
                chunks[s] = self._audio[s][: self._chunk_samples]
                self._audio[s] = self._audio[s][step:]
                mode[s] = 2 if self._primed[s] else 1
            out, self._left_dev, self._pend_dev, self._c, self._h = (
                self._fused_round(
                    self._runtime.params, jnp.asarray(chunks),
                    self._left_dev, self._pend_dev, self._c, self._h,
                    jnp.asarray(mode),
                )
            )
            emits = {s: N_STEPS for s in ready if self._primed[s]}
            for s in ready:
                self._primed[s] = True
            if emits:
                self._dispatch_out(out, emits)

    def _dispatch_out(self, out, valid_by_slot: Dict[int, int]) -> None:
        """Send one round's emissions toward the decoders: device beams
        consume rows in place; host decoders get the batch async with a
        one-round drain lag (transfer hides behind the next round)."""
        if self.device_decode:
            for s, valid in valid_by_slot.items():
                if valid > 0:
                    self._decoders[s].next(out[s], n_valid=valid)
            return
        for arr in jax.tree.leaves(out):
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        self._drain()
        self._inflight = (out, dict(valid_by_slot))

    def _drain(self) -> None:
        if self._inflight is None:
            return
        out, valid_by_slot = self._inflight
        self._inflight = None
        if self.device_prune:
            idx, logp, cnt, blank = (np.asarray(a) for a in out)
            for s, valid in valid_by_slot.items():
                if valid > 0 and self._live[s]:
                    self._decoders[s].next_pruned(
                        idx[s, :valid], logp[s, :valid],
                        cnt[s, :valid], blank[s, :valid],
                    )
        else:
            probs = np.asarray(out)
            for s, valid in valid_by_slot.items():
                if valid > 0 and self._live[s]:
                    self._decoders[s].next(probs[s, :valid])

    def _run_infer(self, valid_by_slot: Dict[int, int]) -> None:
        mc = self._runtime.model_config
        n_ctx = mc.n_context
        S = self.max_streams
        windowed = np.zeros((S, N_STEPS, mc.window_input), np.float32)
        seq_len = np.zeros((S,), np.int32)
        for s, valid in valid_by_slot.items():
            pending = (
                np.asarray(self._pending[s])
                if self._pending[s]
                else np.zeros((0, mc.n_input), np.float32)
            )
            block = pending[: N_STEPS + n_ctx]
            pad = N_STEPS + n_ctx - len(block)
            if pad > 0:
                block = np.concatenate(
                    [block, np.zeros((pad, mc.n_input), np.float32)]
                )
            stacked = np.concatenate([self._left_ctx[s], block])
            width = mc.window_width
            windowed[s] = np.stack(
                [stacked[i : i + width].reshape(-1) for i in range(N_STEPS)]
            )
            seq_len[s] = valid
            self._left_ctx[s] = stacked[valid : valid + n_ctx]
            self._pending[s] = self._pending[s][valid:]
        out, self._c, self._h = self._infer(
            self._runtime.params, jnp.asarray(windowed),
            jnp.asarray(seq_len), self._c, self._h,
        )
        if self.device_decode:
            # each slot's device beam consumes its row of the device
            # probs — fixed [16, C] shape, padded frames masked
            for s, valid in valid_by_slot.items():
                if valid > 0:
                    self._decoders[s].next(out[s], n_valid=valid)
        elif self.device_prune:
            idx, logp, cnt, blank = (np.asarray(a) for a in out)
            for s, valid in valid_by_slot.items():
                if valid > 0:
                    self._decoders[s].next_pruned(
                        idx[s, :valid], logp[s, :valid],
                        cnt[s, :valid], blank[s, :valid],
                    )
        else:
            probs = np.asarray(out)
            for s, valid in valid_by_slot.items():
                if valid > 0:
                    self._decoders[s].next(probs[s, :valid])

    # -- finishing ---------------------------------------------------------

    def _flush_slot(self, slot: int) -> None:
        fc = self._runtime.feature_config
        mc = self._runtime.model_config
        # push buffered full chunks through the fused path, then hand the
        # device frame carry to the host flush machinery below
        self._tick(force=True)
        self._drain()
        if self._primed[slot]:
            self._left_ctx[slot] = np.asarray(self._left_dev[slot])
            self._pending[slot] = list(np.asarray(self._pend_dev[slot]))
        # leftover full windows
        n_full = max(
            0,
            (len(self._audio[slot]) - fc.window_samples) // fc.step_samples + 1,
        )
        if n_full > 0:
            take = (n_full - 1) * fc.step_samples + fc.window_samples
            from stt_tpu.frontend import audio_to_mfcc_numpy

            self._pending[slot].extend(
                audio_to_mfcc_numpy(self._audio[slot][:take], fc)
            )
        self._audio[slot] = np.zeros((0,), np.float32)
        real = len(self._pending[slot])
        self._pending[slot].extend(
            np.zeros((mc.n_context, mc.n_input), np.float32)
        )
        while real > 0:
            valid = min(N_STEPS, real)
            self._run_infer({slot: valid})
            real -= valid
        self._pending[slot] = []

    def _finish(self, slot: int):
        self._flush_slot(slot)
        result = self._decoders[slot].decode(1)[0]
        self._release(slot)
        return result
