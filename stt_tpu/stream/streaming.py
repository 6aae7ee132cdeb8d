"""Streaming inference runtime: chunked audio -> incremental transcripts.

TPU-native re-design of the reference's three-buffer StreamingState
(stt.cc:32-59,105-334):

  audio buffer  -- residual samples until a full batch of MFCC windows
                   exists (16 frames = (16-1)*step + window samples)
  mfcc buffer   -- frames awaiting their full +/-n_context window
  device state  -- LSTM (c, h) carried across chunks ON DEVICE; the only
                   per-chunk host<->device traffic is the audio in and the
                   16xC logits out

Two jitted programs are shared by every stream of a model (compiled once):
  mfcc_chunk:  [chunk_samples] audio -> [16, n_mfcc]
  infer_chunk: ([1,16,window_input] windowed feats, seq_len, c, h)
               -> (probs [16, C], c', h')
Windowing 26-float frames is trivial host work and stays off-device.

Behavior parity with the reference pipeline:
- a frame is inferred only once its full right context exists (output
  lags input by n_context frames);
- finish pads n_context zero-MFCC frames (stt.cc:242-247) and drops a
  trailing partial audio window;
- int16 audio scales by 1/32768 (stt.cc:113);
- seq-length masking freezes (c, h) past the last real frame of a padded
  flush chunk, so a resumed stream would continue from the right state.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stt_tpu.alphabet import Alphabet
from stt_tpu.decode import DecoderState
from stt_tpu.decode.scorer import ScorerBase
from stt_tpu.frontend import FeatureConfig, audio_to_mfcc
from stt_tpu.models import ModelConfig, apply_model

N_STEPS = 16  # timesteps per inference step (config.py:627-632 parity)


def auto_device_prune(n_out: int, cutoff_top_n: int, cutoff_prob: float) -> bool:
    """Should emission pruning run on device for this decoder geometry?

    Pruning pays when the pruned (idx, logp, count, blank) tensors are
    smaller than the full [T, C] probabilities — i.e. when the reference
    semantics actually truncate (cutoff_prob < 1, see
    device.prune_emissions) and the kept top-k is well under C (bytes
    mode C=256, wav2vec2-style vocabularies). For the default 29-class
    alphabet with cutoff_prob=1.0 the full probs are smaller; stay off.
    """
    if cutoff_prob >= 1.0:
        return False
    k = min(cutoff_top_n, n_out)
    return 2 * k + 2 < n_out


class StreamingRuntime:
    """Shared, stateless-per-stream compiled programs + config."""

    def __init__(
        self,
        params,
        model_config: ModelConfig,
        feature_config: FeatureConfig,
        alphabet: Alphabet,
    ):
        self.params = params
        self.model_config = model_config
        self.feature_config = feature_config
        self.alphabet = alphabet
        fc = feature_config
        self.chunk_samples = (N_STEPS - 1) * fc.step_samples + fc.window_samples

        def mfcc_chunk(audio):
            return audio_to_mfcc(audio, fc)

        def window_infer(params, stacked, seq_len, c, h):
            """Context-windowing + acoustic step fused on device: MFCC
            frames stay device-resident between chunks, so the only
            per-chunk device->host transfer is the probs (the
            "donated-buffer chunk step" design — host round-trips per
            chunk dominate streaming latency on remote-attached chips).
            stacked: [n_context + N_STEPS + 2*n_context, n_input]."""
            width = model_config.window_width
            windowed = jnp.stack(
                [
                    stacked[i : i + width].reshape(-1)
                    for i in range(N_STEPS)
                ]
            )
            logits, (c2, h2) = apply_model(
                params,
                windowed[None],
                seq_len=seq_len[None],
                config=model_config,
                previous_state=(c[None], h[None]),
                overlap=False,
            )
            probs = jax.nn.softmax(logits[0], axis=-1)
            return probs, c2[0], h2[0]

        self._mfcc_chunk = jax.jit(mfcc_chunk)
        self._window_infer = jax.jit(window_infer)
        self._pruned_infer_cache = {}

        n_ctx = model_config.n_context

        def fused_chunk_step(params, audio, left_ctx, pend, c, h):
            """Steady-state chunk step as ONE dispatch: MFCC of the new
            320 ms of audio, context stacking with the carried frames,
            windowing, the acoustic step, and the state rollover all in
            a single jitted program. The per-chunk dispatch count is
            what bounds single-stream RTF on a remote-attached chip
            (each tiny device op pays the tunnel round-trip), so the
            previous mfcc + concat + slice + infer chain is fused.

            left_ctx: [n_ctx, n_input] frames before the emission block;
            pend: [N_STEPS, n_input] carried frames (the block being
            emitted); audio: [chunk_samples] producing the next N_STEPS
            frames. Exactly reproduces the generic path's
            _emit_chunk(N_STEPS) on stacked = left_ctx ++ pend ++
            new[:n_ctx] (equivalence-gated in tests/test_streaming_serve).
            """
            new16 = audio_to_mfcc(audio, fc)  # [N_STEPS, n_input]
            stacked = jnp.concatenate([left_ctx, pend, new16[:n_ctx]])
            seq_len = jnp.asarray(N_STEPS, jnp.int32)
            probs, c2, h2 = window_infer(params, stacked, seq_len, c, h)
            left2 = stacked[N_STEPS : N_STEPS + n_ctx]
            return probs, left2, new16, c2, h2

        self._fused_chunk_step = jax.jit(fused_chunk_step)
        self._fused_pruned_cache = {}

    def fused_chunk_step_pruned(self, cutoff_top_n: int, cutoff_prob: float):
        """Fused steady-state chunk step + on-device emission pruning
        (one dispatch, [N_STEPS, K] transfers). Cached per cutoff."""
        key = (int(cutoff_top_n), float(cutoff_prob))
        fn = self._fused_pruned_cache.get(key)
        if fn is None:
            from stt_tpu.decode.device import prune_emissions

            base = self._fused_chunk_step.__wrapped__

            def fused_pruned(params, audio, left_ctx, pend, c, h):
                probs, left2, pend2, c2, h2 = base(
                    params, audio, left_ctx, pend, c, h
                )
                pruned = prune_emissions(
                    probs, cutoff_top_n=key[0], cutoff_prob=key[1]
                )
                return pruned, left2, pend2, c2, h2

            fn = jax.jit(fused_pruned)
            self._fused_pruned_cache[key] = fn
        return fn

    def window_infer_pruned(self, cutoff_top_n: int, cutoff_prob: float):
        """Compiled chunk step that also prunes emissions on device, so
        only [16, K] (idx, logp) + counts + blank cross to the host
        (decode/device.py prune_emissions). Cached per cutoff config."""
        key = (int(cutoff_top_n), float(cutoff_prob))
        fn = self._pruned_infer_cache.get(key)
        if fn is None:
            from stt_tpu.decode.device import prune_emissions

            base = self._window_infer.__wrapped__

            def infer_pruned(params, stacked, seq_len, c, h):
                probs, c2, h2 = base(params, stacked, seq_len, c, h)
                idx, logp, cnt, blank = prune_emissions(
                    probs, cutoff_top_n=key[0], cutoff_prob=key[1]
                )
                return (idx, logp, cnt, blank), c2, h2

            fn = jax.jit(infer_pruned)
            self._pruned_infer_cache[key] = fn
        return fn

    def zero_state(self):
        n = self.model_config.n_cell_dim
        return (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))


class StreamState:
    """One live stream: host buffers + on-device LSTM state + decoder."""

    def __init__(
        self,
        runtime: StreamingRuntime,
        beam_width: int = 500,
        cutoff_prob: float = 1.0,
        cutoff_top_n: int = 40,
        scorer: Optional[ScorerBase] = None,
        hot_words: Optional[Dict[str, float]] = None,
        device_prune: Optional[bool] = None,
        device_decode: Optional[bool] = None,
    ):
        self.runtime = runtime
        mc = runtime.model_config
        # device_decode: run the WHOLE per-frame beam expansion/prune on
        # device (no-LM only) — nothing decode-related crosses to the
        # host while feeding; backpointers pull lazily at decode().
        # OPT-IN: measured on the tunneled v5e, the 16-frame sequential
        # beam scan costs ~3 ms/chunk, more than the host pull it
        # replaces (RTF 0.16 vs 0.07 single-stream), so it pays only
        # when host decode CPU is the scarce resource (many-stream
        # servers) or host<->device transfer must be zero.
        self.device_decode = bool(device_decode) and scorer is None
        # None = auto: prune on device when it shrinks the chunk transfer;
        # pruning disables probs_history (the emissions surface never
        # materializes full-width probabilities on the host)
        if device_prune is None:
            device_prune = auto_device_prune(
                mc.n_out, cutoff_top_n, cutoff_prob
            )
        self.device_prune = bool(device_prune) and not self.device_decode
        self._cutoff_top_n = cutoff_top_n
        self._cutoff_prob = cutoff_prob
        self._audio: np.ndarray = np.zeros((0,), np.float32)
        # MFCC frames stay on device until their probs are computed
        self._pending = jnp.zeros((0, mc.n_input), jnp.float32)
        self._left_ctx = jnp.zeros((mc.n_context, mc.n_input), jnp.float32)
        self._c, self._h = runtime.zero_state()
        self._probs_history: List[np.ndarray] = []
        if self.device_decode:
            from stt_tpu.decode.device import DeviceStreamingDecoder

            self.decoder = DeviceStreamingDecoder(
                runtime.alphabet, beam_width, cutoff_prob, cutoff_top_n
            )
        else:
            from stt_tpu.decode.beam import make_decoder_state

            self.decoder = make_decoder_state(
                runtime.alphabet, beam_width, cutoff_prob, cutoff_top_n,
                scorer, hot_words,
            )
        # one in-flight (device_probs, valid): its host copy overlaps the
        # next chunk's compute + the beam step, hiding the transfer RTT
        self._inflight = None
        self._finished = False

    # -- feeding -----------------------------------------------------------

    def feed_audio_content(self, audio) -> None:
        """Accept int16 PCM (scaled by 1/32768) or float32 in [-1, 1]."""
        assert not self._finished, "stream already finished"
        audio = np.asarray(audio)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        else:
            audio = audio.astype(np.float32)
        self._audio = np.concatenate([self._audio, audio])
        self._process_audio()
        self._process_frames(flush=False)

    def _process_audio(self) -> None:
        rt = self.runtime
        fc = rt.feature_config
        while len(self._audio) >= rt.chunk_samples:
            chunk = self._audio[: rt.chunk_samples]
            if self._pending.shape[0] == N_STEPS:
                # steady state: the whole chunk (MFCC + stacking +
                # windowing + acoustic step + rollover) is ONE dispatch
                if self.device_prune:
                    step = rt.fused_chunk_step_pruned(
                        self._cutoff_top_n, self._cutoff_prob
                    )
                else:
                    step = rt._fused_chunk_step
                out, self._left_ctx, self._pending, self._c, self._h = step(
                    rt.params, jnp.asarray(chunk), self._left_ctx,
                    self._pending, self._c, self._h,
                )
                self._handle_out(out, N_STEPS)
            else:
                frames = rt._mfcc_chunk(jnp.asarray(chunk))  # on device
                self._pending = jnp.concatenate([self._pending, frames])
            self._audio = self._audio[N_STEPS * fc.step_samples :]

    def _emit_chunk(self, valid: int) -> None:
        """Run one inference step over the first `valid` pending frames
        (zero-padded to N_STEPS); consume them. All feature plumbing is
        device-side — the probs pull is the chunk's only transfer."""
        rt = self.runtime
        mc = rt.model_config
        n_ctx = mc.n_context
        block = self._pending[: N_STEPS + n_ctx]
        pad = N_STEPS + n_ctx - block.shape[0]
        if pad > 0:
            block = jnp.concatenate(
                [block, jnp.zeros((pad, mc.n_input), jnp.float32)]
            )
        stacked = jnp.concatenate([self._left_ctx, block])
        if self.device_prune:
            infer = rt.window_infer_pruned(
                self._cutoff_top_n, self._cutoff_prob
            )
            out, self._c, self._h = infer(
                rt.params, stacked, jnp.asarray(valid, jnp.int32),
                self._c, self._h,
            )
        else:
            out, self._c, self._h = rt._window_infer(
                rt.params,
                stacked,
                jnp.asarray(valid, jnp.int32),
                self._c,
                self._h,
            )
        self._handle_out(out, valid)
        # left context for the next chunk = last n_ctx frames before it
        self._left_ctx = stacked[valid : valid + n_ctx]
        self._pending = self._pending[valid:]

    def _handle_out(self, out, valid: int) -> None:
        """Route one chunk's emissions: device beam, or async host pull
        feeding the host decoder one chunk behind (hides transfer RTT)."""
        if self.device_decode:
            # the beam step consumes the device probs directly; nothing
            # decode-related crosses to the host while feeding
            self.decoder.next(out, n_valid=valid)
        else:
            for arr in jax.tree.leaves(out):
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    pass
            self._drain()  # previous transfer had a chunk to finish
            self._inflight = (out, valid)

    def _drain(self) -> None:
        """Feed the in-flight probs to the beam decoder (called before any
        decode and when the next chunk lands)."""
        if self._inflight is None:
            return
        out, valid = self._inflight
        self._inflight = None
        if self.device_prune:
            idx, logp, cnt, blank = (np.asarray(a) for a in out)
            self.decoder.next_pruned(
                idx[:valid], logp[:valid], cnt[:valid], blank[:valid]
            )
        else:
            host = np.asarray(out)[:valid]
            self._probs_history.append(host)
            self.decoder.next(host)

    def _process_frames(self, flush: bool) -> None:
        n_ctx = self.runtime.model_config.n_context
        while self._pending.shape[0] >= N_STEPS + n_ctx:
            self._emit_chunk(N_STEPS)

    # -- decoding ----------------------------------------------------------

    def intermediate_decode(self, num_results: int = 1):
        self._drain()
        return self.decoder.decode(num_results)

    def intermediate_decode_flush_buffers(self, num_results: int = 1):
        """Decode after flushing buffered audio through the model — the
        stream cannot be fed afterwards (STT_IntermediateDecodeWithBufferFlush)."""
        self._flush()
        self._drain()
        return self.decoder.decode(num_results)

    def finish(self, num_results: int = 1):
        self._flush()
        self._drain()
        self._finished = True
        return self.decoder.decode(num_results)

    def _flush(self) -> None:
        if self._finished:
            return
        mc = self.runtime.model_config
        # trailing partial audio window is dropped; compute any full windows
        fc = self.runtime.feature_config
        n_full = max(0, (len(self._audio) - fc.window_samples) // fc.step_samples + 1)
        if n_full > 0:
            take = (n_full - 1) * fc.step_samples + fc.window_samples
            frames = audio_to_mfcc(jnp.asarray(self._audio[:take]), fc)
            self._pending = jnp.concatenate([self._pending, frames])
            self._audio = np.zeros((0,), np.float32)
        # zero-MFCC padding for the right context (stt.cc:242-247); the pad
        # frames are window context only, never emitted centers
        real = int(self._pending.shape[0])
        self._pending = jnp.concatenate(
            [
                self._pending,
                jnp.zeros((mc.n_context, mc.n_input), jnp.float32),
            ]
        )
        while real > 0:
            valid = min(N_STEPS, real)
            self._emit_chunk(valid)
            real -= valid
        self._pending = self._pending[:0]

    @property
    def probs_history(self) -> np.ndarray:
        """All emitted softmax probabilities (emissions API surface)."""
        if not self._probs_history:
            n_out = self.runtime.model_config.n_out
            return np.zeros((0, n_out), np.float32)
        return np.concatenate(self._probs_history)
