"""Multi-metric benchmark: batch inference throughput, streaming RTF and
per-chunk latency, and training-step throughput, on whatever hardware
jax.devices() provides (repo-root bench.py stays the driver's single-line
batch metric).

Run: python -m stt_tpu.tools.benchmark [--batch 128] [--seconds 10]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("STT_TPU_COMPILE_CACHE", "/tmp/stt_tpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_batch_inference(batch: int, seconds: float) -> dict:
    from stt_tpu.ctc.greedy import best_path
    from stt_tpu.frontend import FeatureConfig, audio_to_mfcc
    from stt_tpu.models import ModelConfig, apply_model, init_params

    fc = FeatureConfig()
    config = ModelConfig(compute_dtype="bfloat16", fused_lstm=True)
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(
        rng.randn(batch, int(seconds * fc.sample_rate)) * 0.1, jnp.float32
    )

    def run(params, audio):
        feats = audio_to_mfcc(audio, fc)
        seq = jnp.full((audio.shape[0],), feats.shape[1], jnp.int32)
        logits, _ = apply_model(params, feats, seq_len=seq, config=config)
        return best_path(logits)

    step = jax.jit(run)
    np.asarray(step(params, audio))
    # pipelined dispatch (see bench.py): enqueue all, sync once via the
    # in-order device queue
    inputs = [audio + jnp.float32(i * 1e-6) for i in range(5)]
    jax.block_until_ready(inputs)
    wall = None
    for _ in range(2):
        t0 = time.time()
        outs = [step(params, a) for a in inputs]
        np.asarray(outs[-1][:1])
        w = (time.time() - t0) / len(inputs)
        wall = w if wall is None else min(wall, w)
    return {
        "metric": "batch_inference",
        "audio_seconds_per_second": round(batch * seconds / wall, 1),
        "batch": batch,
        "wall_ms": round(wall * 1e3, 2),
    }


def bench_streaming_rtf() -> dict:
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.frontend import FeatureConfig
    from stt_tpu.models import ModelConfig, init_params
    from stt_tpu.stream.streaming import StreamingRuntime, StreamState

    alphabet = Alphabet().init_from_labels(
        [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["'"]
    )
    config = ModelConfig(dropout_rates=(0.0,) * 6)  # full 2048 geometry
    params = init_params(jax.random.PRNGKey(0), config)
    runtime = StreamingRuntime(params, config, FeatureConfig(), alphabet)

    rng = np.random.RandomState(0)
    audio = (rng.randn(16000 * 10) * 0.1).astype(np.float32)
    # warm the compiles
    warm = StreamState(runtime, beam_width=64)
    warm.feed_audio_content(audio[: 16000 * 2])
    warm.finish(1)

    stream = StreamState(runtime, beam_width=64)
    chunk = 320 * 16  # 320 ms feed granularity
    chunk_times = []
    t0 = time.time()
    for start in range(0, len(audio), chunk):
        c0 = time.time()
        stream.feed_audio_content(audio[start : start + chunk])
        chunk_times.append(time.time() - c0)
    stream.finish(1)
    wall = time.time() - t0
    rtf = wall / 10.0
    return {
        "metric": "streaming",
        "rtf": round(rtf, 4),
        "x_realtime": round(1.0 / rtf, 1),
        "p50_chunk_latency_ms": round(float(np.median(chunk_times)) * 1e3, 1),
        "max_chunk_latency_ms": round(float(np.max(chunk_times)) * 1e3, 1),
    }


def bench_train_step(batch: int, seconds: float) -> dict:
    from stt_tpu.models import ModelConfig
    from stt_tpu.train import Batch, create_train_state, make_train_step
    from stt_tpu.train.step import create_optimizer

    # fused_lstm routes training through the Pallas fwd+bwd custom_vjp
    # (stt_tpu.ops.lstm_train) on TPU; scan elsewhere
    config = ModelConfig(compute_dtype="bfloat16", fused_lstm=True)
    optimizer = create_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer)
    t_frames = int(seconds * 50)
    rng = np.random.RandomState(0)
    b = Batch(
        features=jnp.asarray(rng.randn(batch, t_frames, 26), jnp.float32),
        feature_lengths=jnp.full((batch,), t_frames, jnp.int32),
        labels=jnp.asarray(rng.randint(0, 28, (batch, 80)), np.int32),
        label_lengths=jnp.full((batch,), 80, jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    state, metrics = train_step(state, b, key)
    float(metrics.loss)  # force host materialization (block_until_ready is
    # not reliable over remote-dispatch backends)
    times = []
    for _ in range(4):
        t0 = time.time()
        state, metrics = train_step(state, b, key)
        float(metrics.loss)
        times.append(time.time() - t0)
    wall = min(times)
    return {
        "metric": "train_step",
        "audio_seconds_per_second": round(batch * seconds / wall, 1),
        "step_ms": round(wall * 1e3, 1),
        "batch": batch,
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--skip", default="", help="comma list: batch,stream,train")
    args = parser.parse_args(argv)
    skip = set(args.skip.split(","))
    results = []
    if "batch" not in skip:
        results.append(bench_batch_inference(args.batch, args.seconds))
    if "stream" not in skip:
        results.append(bench_streaming_rtf())
    if "train" not in skip:
        results.append(bench_train_step(args.batch // 2, args.seconds))
    for r in results:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
