"""stt_tpu — a TPU-native speech-to-text framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Coqui STT
(reference: coqui-ai/STT): MFCC feature frontend, DeepSpeech-style LSTM
acoustic model trained with CTC loss, CTC prefix beam-search decoding with
external LM scoring, streaming inference with on-device state, and
data-parallel training over a `jax.sharding.Mesh`.

Package layout:
  stt_tpu.alphabet   — token<->index maps (text + binary formats)
  stt_tpu.text       — levenshtein / WER / CER
  stt_tpu.frontend   — framing + spectrogram + MFCC (jnp + Pallas)
  stt_tpu.models     — acoustic models (DeepSpeech LSTM) as pure pytrees
  stt_tpu.ctc        — CTC loss (log-semiring scan) + greedy decode
  stt_tpu.decode     — CTC prefix beam search + external scorer
  stt_tpu.data       — audio IO, dataset sources, batching, augmentation
  stt_tpu.train      — pjit train/eval loops, checkpoints, config
  stt_tpu.parallel   — mesh + sharding helpers
  stt_tpu.stream     — stateful streaming inference
  stt_tpu.serve      — user-facing Model/Stream API
"""

__version__ = "0.1.0"

GRAPH_VERSION = 6  # artifact-format generation, mirrors reference GRAPH_VERSION
