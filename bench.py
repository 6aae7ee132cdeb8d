"""Benchmark: the BASELINE.md metric set on real hardware.

Prints one JSON line per metric — beam+scorer decode, streaming RTF,
train-step throughput — and LAST the headline batch-inference line:
  {"metric": ..., "value": N, "unit": "audio_seconds_per_second",
   "vs_baseline": N}

Headline metric: audio-seconds of 16 kHz speech transcribed per
wall-clock second by the full single-chip inference compute path (MFCC
frontend + flagship DeepSpeech acoustic model forward + greedy best-path
reduction) at the reference's default geometry (n_hidden=2048, ~48M
params). The model runs the int8 deploy path (stt_tpu.ops.quant) — the
counterpart of the reference's *default* quantized-TFLite export
(export.py:126-150 Optimize.DEFAULT) — accuracy-gated in
tests/test_quant.py on exact transcript equality vs f32. Set
STT_TPU_BENCH_PATH=bf16 for the unquantized path.

The other three (VERDICT r2 item 4 — BASELINE.md gates them all):
- beam_scorer_decode_throughput: CTC beam search (beam 500, the export
  default) + the reference's own pruned_lm.scorer KenLM package over
  LibriSpeech-geometry emission batches, through the native C++ decoder
  with on-device emission pruning (decode/device.py).
- streaming_rtf_x_realtime: single stream, 320 ms chunks, full 2048
  geometry, on-device (c, h) carry; value = 1/RTF.
- train_step_throughput: audio-seconds/s through the jitted train step
  (fwd+bwd+Adam) at batch 256.

vs_baseline: the reference publishes no numbers (BASELINE.md); its
headline claim is "real-time inference" on edge CPUs, i.e. 1.0
audio-second/s per stream. vs_baseline is therefore the real-time factor.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# the axon sitecustomize hook overrides JAX_PLATFORMS at interpreter
# start; honor an explicit env request (local CPU test runs) while the
# driver's bare invocation keeps the TPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent compile cache: repeated bench runs skip the (slow) XLA
# compilation instead of paying it every process
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("STT_TPU_COMPILE_CACHE", "/tmp/stt_tpu_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"
ALPHABET_TXT = "/root/reference/data/alphabet.txt"


def emit(metric, value):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "audio_seconds_per_second",
                "vs_baseline": round(value / 1.0, 1),
            }
        ),
        flush=True,
    )


def speechlike_probs(rng, batch, frames, n_class):
    """Blank-dominated emissions with letter bursts — the shape real CTC
    posteriors take, which is what beam-search cost depends on."""
    probs = np.full((batch, frames, n_class), 1e-4, np.float32)
    probs[..., -1] = 1.0  # blank
    for b in range(batch):
        t = 0
        while t < frames:
            t += int(rng.randint(2, 6))
            if t >= frames:
                break
            c = int(rng.randint(0, n_class - 1))
            dom = rng.uniform(0.5, 0.95)
            probs[b, t, -1] = 1.0 - dom
            probs[b, t, c] = dom
            # a second candidate keeps the beam busy
            c2 = int(rng.randint(0, n_class - 1))
            probs[b, t, c2] += (1.0 - dom) * 0.5
    return probs / probs.sum(-1, keepdims=True)


def bench_beam_scorer_decode():
    """Beam+scorer decode throughput (BASELINE config: beam decode with
    the reference's KenLM package at export_beam_width=500)."""
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.decode.device import ctc_beam_search_decoder_batch_pruned
    from stt_tpu.decode.scorer_package import KenLMScorer

    alphabet = Alphabet(ALPHABET_TXT)
    scorer = KenLMScorer(SCORER)
    rng = np.random.RandomState(0)
    batch, seconds = 16, 10.0
    frames = int(seconds / 0.02)  # 20 ms steps
    probs = speechlike_probs(rng, batch, frames, alphabet.size + 1)
    # device-resident emissions, as the acoustic model produces them:
    # the decode path prunes on device in time-chunks and overlaps each
    # chunk's device->host transfer with host decode of the previous one
    dprobs = jnp.asarray(probs)
    jax.block_until_ready(dprobs)
    lengths = [frames] * batch
    workers = min(batch, os.cpu_count() or 1)

    def run(nproc):
        return ctc_beam_search_decoder_batch_pruned(
            dprobs, lengths, alphabet, beam_size=500,
            num_processes=nproc, cutoff_prob=1.0, cutoff_top_n=40,
            scorer=scorer,
        )

    run(workers)  # warm (compile the prune program, fault in the scorer)
    best = None
    for _ in range(3):
        t0 = time.time()
        run(workers)
        w = time.time() - t0
        best = w if best is None else min(best, w)
    emit("beam_scorer_decode_throughput", batch * seconds / best)
    # core-scaling breakdown (not a headline metric): 1 thread vs all
    t0 = time.time()
    run(1)
    one = time.time() - t0
    print(
        f"# beam_scorer core scaling: 1 thread {batch * seconds / one:.1f} "
        f"-> {workers} threads {batch * seconds / best:.1f} audio-s/s "
        f"({one / best:.2f}x on {os.cpu_count()} cores)",
        flush=True,
    )


def bench_decoder_head_to_head():
    """Per-core speed head-to-head: our native decoder
    (stt_tpu/native/ctc_decoder.cpp) vs the REFERENCE's own C++ decoder
    compiled from its vendored sources (tools/reference_decoder_oracle).
    Same emissions, beam 500 / cutoff_top_n 40 / reference scorer —
    the BASELINE decode config — both single-threaded on the host.
    Parity of the outputs themselves is gated in
    tests/test_reference_decoder_oracle.py."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from reference_decoder_oracle import build_oracle, run_oracle

    from stt_tpu.alphabet import Alphabet
    from stt_tpu.decode.native import NativeDecoderState, native_available
    from stt_tpu.decode.scorer_package import KenLMScorer

    if not native_available():
        print("# decoder head-to-head skipped: native decoder not built",
              flush=True)
        return
    binary = build_oracle()
    if binary is None:
        print("# decoder head-to-head skipped: reference oracle build "
              "failed", flush=True)
        return
    alphabet = Alphabet(ALPHABET_TXT)
    scorer = KenLMScorer(SCORER)
    alpha, beta = scorer.alpha, scorer.beta
    rng = np.random.RandomState(0)
    batch, seconds = 8, 10.0
    frames = int(seconds / 0.02)
    probs = speechlike_probs(rng, batch, frames, alphabet.size + 1)
    utts = [np.ascontiguousarray(probs[b], np.float64) for b in range(batch)]
    audio_seconds = batch * seconds

    # reference: its own elapsed excludes process startup + scorer load
    ref = run_oracle(
        utts, alphabet_path=ALPHABET_TXT, scorer_path=SCORER,
        alpha=alpha, beta=beta, beam=500, cutoff_top_n=40, reps=1,
        binary=binary,
    )  # warm (page in the binary + scorer)
    ref = run_oracle(
        utts, alphabet_path=ALPHABET_TXT, scorer_path=SCORER,
        alpha=alpha, beta=beta, beam=500, cutoff_top_n=40, reps=2,
        binary=binary,
    )
    ref_rate = audio_seconds * ref["reps"] / ref["elapsed"]

    def ours_once():
        for u in utts:
            st = NativeDecoderState(
                alphabet, 500, cutoff_top_n=40, scorer_path=SCORER,
                alpha=alpha, beta=beta,
            )
            st.next(u)
            st.decode(1)

    ours_once()  # warm (shared scorer cache)
    best = None
    for _ in range(2):
        t0 = time.time()
        ours_once()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    our_rate = audio_seconds / best
    ratio = our_rate / ref_rate
    print(
        f"# decoder head-to-head (1 core, beam 500, reference scorer): "
        f"reference {ref_rate:.1f} vs stt_tpu {our_rate:.1f} audio-s/s "
        f"({ratio:.2f}x reference)",
        flush=True,
    )

    # full-host (2-core) comparison: the reference decodes its batch on a
    # ThreadPool (ctc_beam_search_decoder.cpp:625-652) — equivalently,
    # two oracle processes on disjoint halves; ours runs the same split
    # on a 2-thread pool (the GIL-releasing native calls)
    import subprocess as _sp
    import threading

    def ref_half(half, out):
        r = run_oracle(
            half, alphabet_path=ALPHABET_TXT, scorer_path=SCORER,
            alpha=alpha, beta=beta, beam=500, cutoff_top_n=40, reps=1,
            binary=binary,
        )
        out.append(r["elapsed"])

    halves = [utts[: batch // 2], utts[batch // 2 :]]
    t0 = time.time()
    outs = [[], []]
    threads = [
        threading.Thread(target=ref_half, args=(h, o))
        for h, o in zip(halves, outs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ref2_wall = time.time() - t0
    ref2_rate = audio_seconds / ref2_wall

    from concurrent.futures import ThreadPoolExecutor

    def ours_one(u):
        st = NativeDecoderState(
            alphabet, 500, cutoff_top_n=40, scorer_path=SCORER,
            alpha=alpha, beta=beta,
        )
        st.next(u)
        st.decode(1)

    with ThreadPoolExecutor(2) as pool:
        list(pool.map(ours_one, utts))  # warm
        t0 = time.time()
        list(pool.map(ours_one, utts))
        ours2_rate = audio_seconds / (time.time() - t0)
    print(
        f"# decoder head-to-head (2 cores): reference {ref2_rate:.1f} "
        f"(2 processes incl. spawn+scorer-load overhead) vs stt_tpu "
        f"{ours2_rate:.1f} audio-s/s ({ours2_rate / ref2_rate:.2f}x)",
        flush=True,
    )
    print(
        json.dumps({
            "metric": "decoder_head_to_head_per_core",
            "value": round(ratio, 3),
            "unit": "x_reference_decoder",
            "vs_baseline": round(ratio, 3),
        }),
        flush=True,
    )


def bench_device_beam_decode():
    """No-LM beam decode with the fused Pallas expansion/prune kernel
    (ops/beam_kernel.py): the whole per-frame beam step runs on the
    chip, the host only walks one int16 backpointer plane. The
    reference has no device-side decode at all — its decoder is
    host-C++ whose per-frame work scales with n_alphabet x beam."""
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.decode.device import ctc_beam_search_decoder_device

    alphabet = Alphabet(ALPHABET_TXT)
    rng = np.random.RandomState(0)
    batch, seconds = 16, 10.0
    frames = int(seconds / 0.02)
    probs = speechlike_probs(rng, batch, frames, alphabet.size + 1)
    lengths = [frames] * batch

    def run():
        return ctc_beam_search_decoder_device(
            probs, lengths, alphabet, beam_size=128,
            cutoff_prob=1.0, cutoff_top_n=40,
        )

    run()  # compile
    best = None
    for _ in range(3):
        t0 = time.time()
        run()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    emit("device_beam_decode_throughput", batch * seconds / best)


def bench_streaming_rtf():
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.frontend import FeatureConfig
    from stt_tpu.models import ModelConfig, init_params
    from stt_tpu.stream.streaming import StreamState, StreamingRuntime

    alphabet = Alphabet(ALPHABET_TXT)
    config = ModelConfig(dropout_rates=(0.0,) * 6)  # full 2048 geometry
    params = init_params(jax.random.PRNGKey(0), config)
    runtime = StreamingRuntime(params, config, FeatureConfig(), alphabet)

    rng = np.random.RandomState(0)
    seconds = 10.0
    audio = (rng.randn(int(16000 * seconds)) * 0.1).astype(np.float32)
    warm = StreamState(runtime, beam_width=64)
    warm.feed_audio_content(audio[: 16000 * 2])
    warm.finish(1)

    stream = StreamState(runtime, beam_width=64)
    chunk = 320 * 16  # 320 ms feed granularity (n_steps parity)
    t0 = time.time()
    for start in range(0, len(audio), chunk):
        stream.feed_audio_content(audio[start : start + chunk])
    stream.finish(1)
    rtf = (time.time() - t0) / seconds
    emit("streaming_rtf_x_realtime", 1.0 / rtf)


def bench_stream_pool_capacity():
    """Max concurrent streams sustained at RTF >= 1.0 through the
    batched StreamPool (serve/pool.py) — the number a serving deployment
    actually provisions by. Streams are fed round-robin in 320 ms
    chunks; a pool size N counts as sustained when decoding N x 10 s of
    audio takes <= 10 s of wall clock."""
    import tempfile

    from stt_tpu.alphabet import Alphabet
    from stt_tpu.artifact import build_metadata, save_artifact
    from stt_tpu.frontend import FeatureConfig
    from stt_tpu.models import ModelConfig, init_params
    from stt_tpu.serve import Model
    from stt_tpu.serve.pool import StreamPool

    alphabet = Alphabet(ALPHABET_TXT)
    config = ModelConfig(dropout_rates=(0.0,) * 6)  # full 2048 geometry
    # host-built params: device->host of ~190 MB costs minutes on the
    # tunneled runtime (~2 MB/s), so never materialize weights on device
    # just to save them
    shapes = jax.eval_shape(
        lambda: init_params(jax.random.PRNGKey(0), config)
    )
    hrng = np.random.RandomState(0)
    params = jax.tree.map(
        lambda s: (hrng.randn(*s.shape) * 0.05).astype(s.dtype), shapes
    )
    feature_config = FeatureConfig()
    with tempfile.TemporaryDirectory() as tmp:
        meta = build_metadata(config, feature_config, alphabet, beam_width=64)
        path = save_artifact(os.path.join(tmp, "model"), params, meta, alphabet)
        model = Model(path)
        rng = np.random.RandomState(0)
        seconds = 10.0
        audio = (rng.randn(int(16000 * seconds)) * 0.1).astype(np.float32)
        chunk = 320 * 16
        max_slots = 64
        # ONE pool at the provisioned capacity: the batched device
        # programs compile once for the [max_slots, ...] shapes and the
        # device cost per tick is constant; what scales with the number
        # of ACTIVE streams is host decode — exactly the serving-time
        # trade-off being measured
        pool = StreamPool(model, max_streams=max_slots)

        def run(n):
            streams = [pool.create_stream() for _ in range(n)]
            lat = []
            t0 = time.time()
            for start in range(0, len(audio), chunk):
                piece = audio[start : start + chunk]
                for s in streams:
                    f0 = time.time()
                    s.feed_audio_content(piece)
                    lat.append(time.time() - f0)
            for s in streams:
                s.finish_stream()
            return time.time() - t0, np.asarray(lat)

        run(2)  # compile the batched programs
        capacity, best_rate = 0, 0.0
        cap_p50 = cap_p99 = float("nan")
        chunk_s = chunk / 16000.0
        for n in (4, 8, 16, 32, 64):
            wall, lat = run(n)
            rate = n * seconds / wall
            p50 = float(np.percentile(lat, 50) * 1e3)
            p99 = float(np.percentile(lat, 99) * 1e3)
            # SLO: a stream is real-time when its p99 per-chunk feed
            # latency stays under the 320 ms chunk cadence AND the run
            # keeps up in aggregate
            if wall <= seconds and p99 < chunk_s * 1e3:
                capacity, best_rate = n, rate
                cap_p50, cap_p99 = p50, p99
            else:
                if capacity == 0:
                    capacity, best_rate = 0, rate
                    cap_p50, cap_p99 = p50, p99
                break
        emit("stream_pool_capacity", float(capacity))
        print(
            f"# stream pool at capacity: {best_rate:.1f} audio-s/s "
            f"({capacity} concurrent streams sustained at per-chunk "
            f"p99 {cap_p99:.0f} ms < {chunk_s * 1e3:.0f} ms cadence)",
            flush=True,
        )
        for metric, value in (
            ("stream_chunk_latency_p50_ms", cap_p50),
            ("stream_chunk_latency_p99_ms", cap_p99),
        ):
            print(
                json.dumps({
                    "metric": metric, "value": round(value, 1),
                    "unit": "milliseconds",
                    "vs_baseline": round(chunk_s * 1e3 / max(value, 1e-9), 2),
                }),
                flush=True,
            )


def bench_e2e_train_epoch():
    """End-to-end epoch throughput with the input pipeline INCLUDED:
    CSV -> wav decode -> featurize pool -> prefetch -> jitted train step,
    at the flagship geometry and the same 10 s utterance length as
    train_step_throughput (so the two are directly comparable)."""
    import tempfile
    import wave

    from stt_tpu.alphabet import Alphabet
    from stt_tpu.data.feeding import create_batches
    from stt_tpu.frontend import FeatureConfig
    from stt_tpu.models import ModelConfig
    from stt_tpu.train import create_train_state, make_train_step
    from stt_tpu.train.step import create_optimizer

    from stt_tpu.train.step import make_train_step_audio

    alphabet = Alphabet(ALPHABET_TXT)
    src = "/root/reference/data/smoke_test/LDC93S1.wav"
    rows, seconds_per_row, batch_size = 384, 10.0, 128
    config = ModelConfig(compute_dtype="bfloat16", fused_lstm=True)
    optimizer = create_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    feature_config = FeatureConfig()
    step_host = make_train_step(config, optimizer)
    step_audio = make_train_step_audio(config, optimizer, feature_config)
    key = jax.random.PRNGKey(0)

    with tempfile.TemporaryDirectory() as tmp:
        # a real 10 s wav (the smoke utterance tiled): wav decode,
        # featurize and upload all do full-length honest work
        with wave.open(src) as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        wav = os.path.join(tmp, "u10.wav")
        with wave.open(wav, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.tile(pcm, 4)[:160000].tobytes())
        size = os.path.getsize(wav)
        txt = " ".join(
            ["she had your dark suit in greasy wash water all year"] * 3
        )
        csv = os.path.join(tmp, "train.csv")
        with open(csv, "w") as f:
            f.write("wav_filename,wav_filesize,transcript\n")
            for _ in range(rows):
                f.write(f"{wav},{size},{txt}\n")

        from stt_tpu.data.feature_cache import FeatureCache

        def epoch(e, device_featurize, cache=None, bf16_upload=True):
            nonlocal state
            step = step_audio if device_featurize else step_host
            t0 = time.time()
            for batch, _ids in create_batches(
                [csv], alphabet, feature_config, batch_size=batch_size,
                train_phase=True, epoch=e, total_epochs=8,
                num_workers=os.cpu_count() or 2, prefetch=4,
                device_featurize=device_featurize,
                feature_cache=cache,
                feature_dtype=(
                    jnp.bfloat16
                    if bf16_upload and not device_featurize else None
                ),
            ):
                state, metrics = step(state, batch, key)
            float(metrics.loss)  # sync
            return time.time() - t0

        # three input designs, all production paths:
        # - feature cache + bf16 upload (the trainer's default bf16-step
        #   config; cache = the reference's own CI training flag
        #   --feature_cache, run-ci-ldc93s1_new.sh:23): epoch 1 fills,
        #   later epochs skip audio decode + featurize; the bf16-compute
        #   step casts features at its first op, so bf16 upload is
        #   bit-identical at half the host->device bytes.
        # - host featurize uncached: numpy MFCC on the worker pool every
        #   epoch (augmentation-fresh); featurize-bound on few-core hosts.
        # - device_featurize: raw audio up, MFCC inside the jitted step.
        #   Wins where host CPUs are scarce and host->device bandwidth is
        #   real (direct-attached hosts); on THIS tunneled runtime the
        #   ~12x larger uploads lose to host featurize, so it is a
        #   breakdown line, not a candidate for the headline.
        epoch(0, True)  # compile audio-step
        dev_rate = rows * seconds_per_row / min(epoch(1, True), epoch(2, True))
        epoch(3, False)  # compile host-step
        host_rate = rows * seconds_per_row / min(
            epoch(4, False), epoch(5, False)
        )
        cache = FeatureCache()
        epoch(0, False, cache)  # fill epoch (uncached speed)
        cached_rate = rows * seconds_per_row / min(
            epoch(1, False, cache), epoch(2, False, cache)
        )
        # featurize capacity of this host (the uncached ceiling)
        from concurrent.futures import ThreadPoolExecutor

        from stt_tpu.data.feeding import featurize_sample
        from stt_tpu.data.sources import samples_from_sources

        samples = list(samples_from_sources([csv], labeled=True))
        with ThreadPoolExecutor(os.cpu_count() or 2) as pool:
            t0 = time.time()
            list(pool.map(lambda s: featurize_sample(s, feature_config),
                          samples))
            feat_rate = rows * seconds_per_row / (time.time() - t0)
        print(
            f"# e2e epoch (10s utts, batch {batch_size}): cached+bf16 "
            f"{cached_rate:.1f} / host-featurize {host_rate:.1f} / "
            f"device-featurize {dev_rate:.1f} audio-s/s; host featurize "
            f"capacity {feat_rate:.1f} audio-s/s ({os.cpu_count()} cores) "
            f"-> uncached path at {100 * host_rate / feat_rate:.0f}% of "
            f"its featurize ceiling",
            flush=True,
        )
        emit("e2e_train_epoch_throughput", max(cached_rate, host_rate))


def bench_train_step():
    from stt_tpu.models import ModelConfig
    from stt_tpu.train import Batch, create_train_state, make_train_step
    from stt_tpu.train.step import create_optimizer

    config = ModelConfig(compute_dtype="bfloat16", fused_lstm=True)
    optimizer = create_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer)
    batch, seconds = 256, 10.0
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
    float(metrics.loss)  # compile + materialize
    # pipelined: enqueue several steps, sync once (the trainer's hot loop
    # defers metric fetches the same way)
    reps = 4
    best = None
    for _ in range(2):
        t0 = time.time()
        for _ in range(reps):
            state, metrics = train_step(state, b, key)
        float(metrics.loss)
        w = (time.time() - t0) / reps
        best = w if best is None else min(best, w)
    emit("train_step_throughput", batch * seconds / best)


def bench_batch_inference():
    from stt_tpu.ctc.greedy import best_path
    from stt_tpu.frontend import FeatureConfig, audio_to_mfcc
    from stt_tpu.models import ModelConfig, apply_model, init_params
    from stt_tpu.ops.quant import apply_model_quantized, quantize_params

    feature_config = FeatureConfig()
    # bf16 compute + fused Pallas recurrence: TPU-native MXU rate.
    config = ModelConfig(compute_dtype="bfloat16", fused_lstm=True)
    params = init_params(jax.random.PRNGKey(0), config)
    quantized = os.environ.get("STT_TPU_BENCH_PATH", "int8") != "bf16"
    qparams = quantize_params(params, config) if quantized else None

    # batch 512 amortizes the per-dispatch overhead of the tunneled chip
    # and saturates the MXU on the recurrence matmul; the fused-LSTM
    # VMEM guard holds up to 768 at this geometry
    batch, seconds = 512, 10.0
    n_samples = int(seconds * feature_config.sample_rate)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, n_samples) * 0.1, jnp.float32)

    def transcribe(params, audio):
        feats = audio_to_mfcc(audio, feature_config)
        t = feats.shape[1]
        seq_len = jnp.full((audio.shape[0],), t, jnp.int32)
        if quantized:
            logits, _ = apply_model_quantized(
                params, feats, seq_len=seq_len, config=config
            )
        else:
            logits, _ = apply_model(
                params, feats, seq_len=seq_len, config=config
            )
        return best_path(logits)

    step = jax.jit(transcribe)
    model_params = qparams if quantized else params
    np.asarray(step(model_params, audio))  # compile + materialize

    # Throughput timing pipelines dispatches the way a production batch
    # server does: enqueue every step, synchronize once. Per-dispatch
    # round-trip latency to the chip (~28 ms on a tunneled runtime)
    # overlaps with device execution instead of serializing after it.
    reps = 5
    inputs = [audio + jnp.float32(i * 1e-6) for i in range(reps)]
    jax.block_until_ready(inputs)
    best = None
    for _ in range(2):
        t0 = time.time()
        outs = [step(model_params, a) for a in inputs]
        # the device queue is in-order: materializing the last output
        # guarantees every step completed
        np.asarray(outs[-1][:1])
        wall = (time.time() - t0) / reps
        best = wall if best is None else min(best, wall)
    audio_seconds = batch * seconds
    emit("single_chip_batch_inference_throughput", audio_seconds / best)


def main():
    only = os.environ.get("STT_TPU_BENCH_ONLY", "")
    benches = [
        ("beam", bench_beam_scorer_decode),
        ("h2h", bench_decoder_head_to_head),
        ("devbeam", bench_device_beam_decode),
        ("stream", bench_streaming_rtf),
        ("pool", bench_stream_pool_capacity),
        ("e2e", bench_e2e_train_epoch),
        ("train", bench_train_step),
        ("batch", bench_batch_inference),  # headline: LAST json line
    ]
    for name, fn in benches:
        if only and name not in only.split(","):
            continue
        try:
            fn()
        except Exception as exc:  # a broken sub-bench must not eat the rest
            print(f"# bench {name} failed: {exc!r}", flush=True)


if __name__ == "__main__":
    main()
