"""Sample stream -> padded Batch stream (the tf.data pipeline replacement).

Parity surface: util/feeding.py create_dataset — per-sample feature
extraction with optional signal/spectrogram/features augmentation, label
encoding with contextual errors (util/text.py text_to_char_array),
duration-sorted length bucketing, epoch-seeded batch shuffling, padded
batches.

TPU-first notes: features are computed on the host (numpy — identical
math to the jnp frontend, gated by tests) so the accelerator only ever
sees fixed-shape padded batches; time is padded to a multiple of
`pad_time_to` and labels to `pad_labels_to` to keep the number of XLA
compilations tiny across an epoch.
"""

from __future__ import annotations

import random
from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from stt_tpu.alphabet import Alphabet
from stt_tpu.data.augmentations import (
    Augmentation,
    apply_graph_augmentations,
    apply_sample_augmentations,
)
from stt_tpu.data.sources import Sample, samples_from_sources
from stt_tpu.frontend import (
    FeatureConfig,
    mfcc_from_spectrogram_numpy,
    spectrogram_numpy,
)
from stt_tpu.train.step import Batch


def text_to_char_array(transcript: str, alphabet: Alphabet, context: str = ""):
    """Encode with a helpful error naming the offending sample
    (util/text.py:8-31)."""
    if not alphabet.can_encode(transcript):
        missing = [ch for ch in transcript if not alphabet.can_encode_single(ch)]
        raise ValueError(
            f'Alphabet cannot encode transcript "{transcript}" while '
            f'processing sample "{context}", check that your alphabet '
            f"contains all characters in the training corpus. "
            f"Missing characters are: {missing}."
        )
    encoded = alphabet.encode(transcript)
    if len(encoded) == 0:
        raise ValueError(
            f"While processing {context}: Found an empty transcript! "
            f"You must include a transcript for all training data."
        )
    return np.asarray(encoded, np.int32)


def featurize_sample(
    sample: Sample,
    feature_config: FeatureConfig,
    augmentations: Sequence[Augmentation] = (),
    train_phase: bool = False,
    clock: float = 0.0,
) -> np.ndarray:
    """One utterance -> [T, n_mfcc] features (with augmentation when
    training). Audio at a different rate than the feature frontend's is
    resampled first (the reference normalizes rate at import/augment
    time; sources like the vorbis smoke CSV arrive at 8 kHz)."""
    if sample.rate != feature_config.sample_rate:
        from stt_tpu.data.audio import resample

        sample = Sample(
            sample_id=sample.sample_id,
            transcript=sample.transcript,
            duration_hint=sample.duration_hint,
            _audio=resample(
                np.asarray(sample.audio, np.float32),
                sample.rate,
                feature_config.sample_rate,
            ),
            _rate=feature_config.sample_rate,
        )
    if train_phase and augmentations:
        sample = apply_sample_augmentations(
            sample, augmentations, clock=clock
        )
        audio = np.asarray(sample.audio, np.float32)
        audio = apply_graph_augmentations(
            "signal", audio, augmentations, clock=clock
        )
        spec = spectrogram_numpy(audio, feature_config)
        spec = apply_graph_augmentations(
            "spectrogram", spec, augmentations, clock=clock
        )
        feats = mfcc_from_spectrogram_numpy(
            np.maximum(spec, 0.0), feature_config
        )
        feats = apply_graph_augmentations(
            "features", feats, augmentations, clock=clock
        )
        return np.asarray(feats, np.float32)
    spec = spectrogram_numpy(np.asarray(sample.audio, np.float32), feature_config)
    return mfcc_from_spectrogram_numpy(spec, feature_config)


def prepare_sample_audio(
    sample: Sample,
    feature_config: FeatureConfig,
    augmentations: Sequence[Augmentation] = (),
    train_phase: bool = False,
    clock: float = 0.0,
) -> np.ndarray:
    """Host half of the device-featurize path: rate normalization +
    sample-domain + signal-domain augmentations only; the STFT/mel/MFCC
    run on device inside the train step."""
    if sample.rate != feature_config.sample_rate:
        from stt_tpu.data.audio import resample

        sample = Sample(
            sample_id=sample.sample_id,
            transcript=sample.transcript,
            duration_hint=sample.duration_hint,
            _audio=resample(
                np.asarray(sample.audio, np.float32),
                sample.rate,
                feature_config.sample_rate,
            ),
            _rate=feature_config.sample_rate,
        )
    if train_phase and augmentations:
        sample = apply_sample_augmentations(
            sample, augmentations, clock=clock
        )
        audio = np.asarray(sample.audio, np.float32)
        return apply_graph_augmentations(
            "signal", audio, augmentations, clock=clock
        )
    return np.asarray(sample.audio, np.float32)


def featurize_sample_spectrogram(
    sample: Sample,
    feature_config: FeatureConfig,
    augmentations: Sequence[Augmentation] = (),
    clock: float = 0.0,
) -> np.ndarray:
    """Host half of the on-device augmentation path: sample augs +
    signal-domain graph augs + framing/STFT on the host; the
    spectrogram/features-domain transforms and the MFCC projection run
    on device (data/device_augment.py)."""
    if sample.rate != feature_config.sample_rate:
        from stt_tpu.data.audio import resample

        sample = Sample(
            sample_id=sample.sample_id,
            transcript=sample.transcript,
            duration_hint=sample.duration_hint,
            _audio=resample(
                np.asarray(sample.audio, np.float32),
                sample.rate,
                feature_config.sample_rate,
            ),
            _rate=feature_config.sample_rate,
        )
    sample = apply_sample_augmentations(sample, augmentations, clock=clock)
    audio = np.asarray(sample.audio, np.float32)
    audio = apply_graph_augmentations(
        "signal", audio, augmentations, clock=clock
    )
    return spectrogram_numpy(audio, feature_config)


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


def create_batches(
    sources: Iterable[str] | List[Sample],
    alphabet: Alphabet,
    feature_config: FeatureConfig = FeatureConfig(),
    batch_size: int = 1,
    augmentations: Sequence[Augmentation] = (),
    train_phase: bool = False,
    epoch: int = 0,
    total_epochs: int = 1,
    reverse: bool = False,
    limit: int = 0,
    drop_remainder: bool = False,
    pad_time_to: int = 16,
    pad_labels_to: int = 8,
    shuffle_batches: bool = True,
    row_range: Optional[tuple] = None,
    num_workers: int = 0,
    prefetch: int = 0,
    device_augment=None,
    device_featurize: bool = False,
    feature_cache=None,
    feature_dtype=None,
) -> Iterator[Batch]:
    """Yield padded Batch pytrees.

    reverse/limit implement the reference's pre-training longest-first
    dummy run for early OOM detection (train.py:326-340).

    row_range=(start, end): multi-host input sharding — this host
    featurizes only rows [start, end) of every global batch (the batch
    composition, sort and epoch shuffle are deterministic and identical
    on all hosts; the trainer re-pads the per-host shards to the agreed
    global shape and assembles them with
    parallel.distributed.make_global_batch).

    num_workers > 1 featurizes/augments the rows of a batch on a thread
    pool and prefetch > 0 assembles up to that many batches ahead on a
    producer thread (the reference's LimitingPool-of-processes +
    per-GPU-prefetch design, helpers.py:124-163 / feeding.py:236, with
    threads: numpy FFT/BLAS and audio IO release the GIL). Results are
    equivalent to the serial path (labels/lengths exact; features to
    float tolerance, threaded BLAS reduction order) — every sample's
    augmentation RNG is seeded by (sample_id, clock), never by worker
    identity — gated by tests/test_data.py.

    device_featurize: batches carry RAW AUDIO ([B, samples] padded so
    the frontend produces exactly the padded frame count) instead of
    host-computed MFCCs; the consumer computes features ON DEVICE inside
    its jitted step (train.step.make_train_step_audio). Host work drops
    to wav decode + padding, which is what lets the input pipeline keep
    a TPU-resident train step fed (bench e2e_train_epoch_throughput).
    feature_lengths still count FRAMES (of the true audio span).
    Sample-domain and signal-domain augmentations apply on the host;
    spectrogram/features-domain graph augmentations are rejected (use
    device_augment for those).

    device_augment (a data.device_augment.DeviceAugmentPipeline): the
    on-device graph-augmentation path — batches then carry host
    SPECTROGRAMS ([B, T, n_bins]) and each yield becomes
    (batch, ids, aug_params); the consumer applies the jitted
    augment+MFCC program before the train step.

    feature_dtype: numpy dtype for the uploaded feature batch (e.g.
    jnp.bfloat16). A bfloat16-compute train step casts features at its
    first op anyway, so uploading bf16 halves host->device bytes with
    identical step numerics; default keeps float32.

    feature_cache (a data.feature_cache.FeatureCache): the reference's
    --feature_cache (feeding.py:223-224): rows found in the cache skip
    audio decode + featurize entirely; rows computed this epoch fill it,
    and completing the epoch finalizes (persists) it. Ignored on the
    device_featurize / device_augment paths (features never materialize
    on the host there).
    """
    if isinstance(sources, (list, tuple)) and sources and isinstance(sources[0], Sample):
        samples = list(sources)
    else:
        samples = list(samples_from_sources(list(sources), labeled=True))
    for aug in augmentations:
        aug.start()

    # global duration-proxy sort (ascending); hint falls back to audio
    samples.sort(key=lambda s: s.duration_hint or s.duration)
    if reverse:
        samples.reverse()
    if limit:
        samples = samples[:limit]

    n_batches = len(samples) // batch_size if drop_remainder else -(-len(samples) // batch_size)
    order = list(range(n_batches))
    if train_phase and shuffle_batches and not reverse:
        random.Random(563 + epoch).shuffle(order)  # epoch-seeded (feeding.py:227)

    clock_base = epoch / max(total_epochs, 1)
    clock_span = 1.0 / max(total_epochs, 1)
    total = max(len(samples), 1)

    if device_featurize:
        bad = [
            a for a in augmentations
            if getattr(a, "domain", None) in ("spectrogram", "features")
        ]
        if bad:
            raise ValueError(
                "device_featurize cannot apply host graph augmentations "
                f"in the spectrogram/features domains: {bad}; use "
                "--graph_augs_on_device for those"
            )

    cache = feature_cache
    if cache is not None and (
        device_featurize or device_augment is not None or reverse or limit
    ):
        # rows are keyed by position in the canonical (ascending) sort;
        # the reversed/limited dummy run would mis-key them
        cache = None

    def featurize_row(args):
        offset, batch_index, sample = args
        row = batch_index * batch_size + offset
        clock = clock_base + clock_span * (row / total)
        if cache is not None:
            hit = cache.get(row)
            if hit is not None:
                return hit[0], hit[1], None
        labels = text_to_char_array(
            sample.transcript, alphabet, context=sample.sample_id
        )
        if device_augment is not None and train_phase:
            spec = featurize_sample_spectrogram(
                sample, feature_config, augmentations, clock
            )
            drawn = device_augment.draw_sample(
                sample.sample_id, spec.shape[0], clock
            )
            return spec, labels, drawn
        if device_featurize:
            audio = prepare_sample_audio(
                sample, feature_config, augmentations, train_phase, clock
            )
            return audio, labels, None
        feats = featurize_sample(
            sample, feature_config, augmentations, train_phase, clock
        )
        if cache is not None:
            cache.put(row, feats, labels)
        return feats, labels, None

    def assemble_audio(rows, audio_list, labels_list, ids):
        """Raw-audio batch: pad samples so the device frontend produces
        exactly round_up(frames, pad_time_to) frames; feature_lengths
        count the TRUE frames (CTC masks the padding)."""
        win = feature_config.window_samples
        step = feature_config.step_samples
        b = len(audio_list)
        t_true = [
            max(0, (len(a) - win) // step + 1) for a in audio_list
        ]
        t_pad = _round_up(max(max(t_true), 1), pad_time_to)
        s_pad = (t_pad - 1) * step + win
        l_max = _round_up(max(len(l) for l in labels_list), pad_labels_to)
        audio = np.zeros((b, s_pad), np.float32)
        labels = np.zeros((b, l_max), np.int32)
        feature_lengths = np.zeros((b,), np.int32)
        label_lengths = np.zeros((b,), np.int32)
        for i, (a, l) in enumerate(zip(audio_list, labels_list)):
            audio[i, : len(a)] = a[:s_pad]
            labels[i, : len(l)] = l
            feature_lengths[i] = t_true[i]
            label_lengths[i] = len(l)
        batch = Batch(
            features=jnp.asarray(audio),
            feature_lengths=jnp.asarray(feature_lengths),
            labels=jnp.asarray(labels),
            label_lengths=jnp.asarray(label_lengths),
        )
        return batch, ids

    def batch_tasks():
        for batch_index in order:
            chunk = samples[
                batch_index * batch_size : (batch_index + 1) * batch_size
            ]
            offsets = range(len(chunk))
            if row_range is not None:
                start, end = row_range
                chunk = chunk[start:end]
                offsets = range(start, start + len(chunk))
                if not chunk:
                    continue
            yield [
                (offset, batch_index, sample)
                for offset, sample in zip(offsets, chunk)
            ]

    def assemble(rows, results):
        ids = [sample.sample_id for _, _, sample in rows]
        feats_list = [feats for feats, _, _ in results]
        labels_list = [labels for _, labels, _ in results]
        drawn_list = [drawn for _, _, drawn in results]
        if device_featurize and not (
            device_augment is not None and train_phase
        ):
            return assemble_audio(rows, feats_list, labels_list, ids)
        spectrograms = device_augment is not None and train_phase
        width = (
            feature_config.n_bins if spectrograms else feature_config.n_mfcc
        )
        b = len(feats_list)
        t_max = _round_up(max(f.shape[0] for f in feats_list), pad_time_to)
        l_max = _round_up(max(len(l) for l in labels_list), pad_labels_to)
        features = np.zeros((b, t_max, width), np.float32)
        labels = np.zeros((b, l_max), np.int32)
        feature_lengths = np.zeros((b,), np.int32)
        label_lengths = np.zeros((b,), np.int32)
        for i, (f, l) in enumerate(zip(feats_list, labels_list)):
            features[i, : f.shape[0]] = f
            labels[i, : len(l)] = l
            feature_lengths[i] = f.shape[0]
            label_lengths[i] = len(l)
        if feature_dtype is not None:
            features = features.astype(feature_dtype)
        batch = Batch(
            features=jnp.asarray(features),
            feature_lengths=jnp.asarray(feature_lengths),
            labels=jnp.asarray(labels),
            label_lengths=jnp.asarray(label_lengths),
        )
        # sample ids ride alongside (not inside the jit-facing pytree) so
        # the train loop can name files with non-finite losses
        if spectrograms:
            return batch, ids, device_augment.stack(drawn_list)
        return batch, ids

    try:
        if num_workers > 1 or prefetch > 0:
            yield from _pipelined_batches(
                batch_tasks(), featurize_row, assemble,
                max(1, num_workers), max(1, prefetch),
            )
        else:
            for rows in batch_tasks():
                yield assemble(rows, [featurize_row(r) for r in rows])
        if cache is not None and row_range is None:
            # full epoch consumed: freeze + persist (multi-host shards
            # fill only their rows, so they stay RAM-partial by design)
            cache.finalize(len(samples))
    finally:
        for aug in augmentations:
            aug.stop()


def _pipelined_batches(tasks, featurize_row, assemble, num_workers, prefetch):
    """Producer thread + featurize thread pool + bounded ready queue."""
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    ready: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _DONE = object()
    stop = threading.Event()  # consumer abandoned the generator

    def offer(item) -> bool:
        while not stop.is_set():
            try:
                ready.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                for rows in tasks:
                    if stop.is_set():
                        return
                    results = list(pool.map(featurize_row, rows))
                    if not offer(assemble(rows, results)):
                        return
            offer(_DONE)
        except BaseException as exc:  # surface in the consumer
            offer(exc)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            item = ready.get()
            if item is _DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        thread.join(timeout=5.0)
