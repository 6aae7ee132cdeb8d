"""Voice activity detection and long-audio segmentation.

Parity surface: util/audio.py:296-364 (vad_split with a webrtcvad
frame classifier and a ring-buffer trigger) and util/feeding.py:240-280
(split_audio_file: VAD segments -> duration-sorted batches with outliers
isolated into batch-size-1 batches).

webrtcvad is not available in this image, so the frame classifier is an
adaptive log-energy detector; the segmentation state machine (ring
buffer, 90% trigger/detrigger ratio) mirrors the reference exactly, and
the classifier is pluggable for environments that have webrtcvad.

Aggressiveness mapping (webrtcvad's 0-3 scale direction, quantified in
tests/test_vad_quantified.py): the voicing threshold sits at
(15 + 10*aggressiveness)% of the per-utterance noise-floor->peak energy
range, so 0 is the most permissive and 3 the strictest. Measured drift
vs constructed ground truth: boundaries within 0.35 s on synthetic
speech/silence and within a true span +-0.5 s on real (LDC93S1)
speech; >=90-95% of true speech covered; silence leak bounded by the
state machine's 300 ms padding prepend (the reference leaks the same
way).
"""

from __future__ import annotations

import collections
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np

DEFAULT_RATE = 16000


def energy_vad_classifier(
    audio: np.ndarray, frame_len: int, aggressiveness: int = 3
) -> List[bool]:
    """Frame-wise voiced/unvoiced via adaptive log-energy thresholding.
    Higher aggressiveness -> stricter (more frames called unvoiced)."""
    n_frames = len(audio) // frame_len
    if n_frames == 0:
        return []
    frames = audio[: n_frames * frame_len].reshape(n_frames, frame_len)
    energy = 10.0 * np.log10(np.mean(np.square(frames), axis=1) + 1e-10)
    floor = np.percentile(energy, 10)
    peak = np.percentile(energy, 95)
    # threshold sweeps from 15% to 45% of the floor->peak range
    frac = 0.15 + 0.1 * aggressiveness
    threshold = floor + frac * max(peak - floor, 6.0)
    return (energy > threshold).tolist()


def vad_split(
    audio: np.ndarray,
    rate: int = DEFAULT_RATE,
    num_padding_frames: int = 10,
    threshold: float = 0.5,
    aggressiveness: int = 3,
    frame_duration_ms: int = 30,
    classifier: Optional[Callable] = None,
) -> Iterator[Tuple[np.ndarray, float, float]]:
    """Yield (segment_audio, time_start_s, time_end_s) voiced segments.

    Ring-buffer trigger semantics of util/audio.py:308-364: collecting
    starts when > threshold of the buffered frames are voiced and stops
    when > threshold are unvoiced (the padding frames are prepended)."""
    if frame_duration_ms not in (10, 20, 30):
        raise ValueError("VAD-splitting only supported for frame durations 10, 20, or 30 ms")
    frame_len = rate * frame_duration_ms // 1000
    if classifier is None:
        classifier = lambda a, fl: energy_vad_classifier(a, fl, aggressiveness)
    voiced_flags = classifier(audio, frame_len)

    ring_buffer: collections.deque = collections.deque(maxlen=num_padding_frames)
    triggered = False
    segment: List[int] = []
    start_frame = 0
    for i, is_speech in enumerate(voiced_flags):
        if not triggered:
            ring_buffer.append((i, is_speech))
            num_voiced = sum(1 for _, speech in ring_buffer if speech)
            if num_voiced > threshold * ring_buffer.maxlen:
                triggered = True
                start_frame = ring_buffer[0][0]
                segment = [idx for idx, _ in ring_buffer]
                ring_buffer.clear()
        else:
            segment.append(i)
            ring_buffer.append((i, is_speech))
            num_unvoiced = sum(1 for _, speech in ring_buffer if not speech)
            if num_unvoiced > threshold * ring_buffer.maxlen:
                triggered = False
                end_frame = segment[-1] + 1
                yield (
                    audio[start_frame * frame_len : end_frame * frame_len],
                    start_frame * frame_duration_ms / 1000.0,
                    end_frame * frame_duration_ms / 1000.0,
                )
                ring_buffer.clear()
                segment = []
    if triggered and segment:
        end_frame = segment[-1] + 1
        yield (
            audio[start_frame * frame_len : end_frame * frame_len],
            start_frame * frame_duration_ms / 1000.0,
            end_frame * frame_duration_ms / 1000.0,
        )


def split_audio_file(
    audio: np.ndarray,
    rate: int = DEFAULT_RATE,
    batch_size: int = 8,
    aggressiveness: int = 3,
    outlier_duration_ms: float = 10000,
    outlier_batch_size: int = 1,
) -> Iterator[List[Tuple[float, float, np.ndarray]]]:
    """VAD-segment audio into padded decode batches; duration outliers go
    into their own small batches (feeding.py:240-280)."""
    segments = list(vad_split(audio, rate, aggressiveness=aggressiveness))
    if not segments:
        return
    normal = [
        (s, ts, te) for s, ts, te in segments if (te - ts) * 1000 <= outlier_duration_ms
    ]
    outliers = [
        (s, ts, te) for s, ts, te in segments if (te - ts) * 1000 > outlier_duration_ms
    ]
    normal.sort(key=lambda x: len(x[0]))
    outliers.sort(key=lambda x: len(x[0]))
    for group, bsize in ((normal, batch_size), (outliers, outlier_batch_size)):
        for i in range(0, len(group), bsize):
            yield [
                (ts, te, seg) for seg, ts, te in group[i : i + bsize]
            ]
