"""MFCC feature frontend: framing -> |FFT|^2 -> mel filterbank -> log -> DCT.

TPU-first design: the whole frontend is three dense contractions around one
rfft — (frames gather) @ (windowed FFT) then magnitude @ mel_matrix and
log_mel @ dct_matrix — all of which XLA maps onto the MXU/VPU and fuses.
Constants (Hann window, mel filterbank, DCT basis) are precomputed in
float64 numpy and baked into the jaxpr as float32.

Semantics parity (gated by tests/test_frontend.py against TF's ops, which
the reference training stack calls in util/feeding.py:51-72):
- framing: frames start at multiples of `step`; a frame is only emitted
  when a full window fits; window = periodic Hann 0.5 - 0.5*cos(2*pi*i/N);
  fft length = next power of two >= window length; magnitude-squared output
  (tensorflow AudioSpectrogram op semantics).
- mel filterbank: mel(f) = 1127*ln(1+f/700); `n_mels + 1` centers spaced
  uniformly in mel between lower and upper limits; triangular weights
  computed per-FFT-bin with band edges tapered; operates on |FFT| (sqrt of
  the squared-magnitude input); bins below start index
  int(1.5 + lower/hz_per_bin) or above int(upper/hz_per_bin) are dropped
  (tensorflow Mfcc op's MfccMelFilterbank semantics).
- log floor 1e-12; DCT-II with global scale sqrt(2/n_mels) (no special
  first-coefficient normalization — matches TF's MfccDct, NOT scipy ortho).

Defaults mirror the reference geometry: 16 kHz, 32 ms window (512 samples),
20 ms step (320), 26 coefficients, upper = rate/2
(util/config.py:262-306, feeding.py:67-72).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_FILTERBANK_FLOOR = 1e-12
_MEL_BREAK_HZ = 700.0
_MEL_HIGH_Q = 1127.0


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    sample_rate: int = 16000
    window_samples: int = 512  # 32 ms at 16 kHz
    step_samples: int = 320  # 20 ms at 16 kHz
    n_mfcc: int = 26
    n_mels: int = 40
    lower_frequency_hz: float = 20.0
    upper_frequency_hz: float | None = None  # default: sample_rate / 2

    @classmethod
    def from_ms(
        cls,
        sample_rate: int = 16000,
        window_ms: float = 32.0,
        step_ms: float = 20.0,
        **kw,
    ) -> "FeatureConfig":
        return cls(
            sample_rate=sample_rate,
            window_samples=int(sample_rate * window_ms / 1000),
            step_samples=int(sample_rate * step_ms / 1000),
            **kw,
        )

    @property
    def upper_hz(self) -> float:
        return (
            self.upper_frequency_hz
            if self.upper_frequency_hz is not None
            else self.sample_rate / 2
        )

    @property
    def fft_length(self) -> int:
        return 1 << (self.window_samples - 1).bit_length()

    @property
    def n_bins(self) -> int:
        return self.fft_length // 2 + 1


def num_frames(n_samples, window_samples: int, step_samples: int):
    """Frames with a full window of samples. Works on ints or arrays."""
    return jnp.maximum(0, (n_samples - window_samples) // step_samples + 1)


def _freq_to_mel(freq):
    return _MEL_HIGH_Q * np.log1p(np.asarray(freq, np.float64) / _MEL_BREAK_HZ)


@functools.lru_cache(maxsize=None)
def _constants(config: FeatureConfig):
    """Precompute (hann_window, mel_matrix [n_bins, n_mels], dct [n_mels, n_mfcc])."""
    n = config.window_samples
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n, dtype=np.float64) / n)

    n_bins = config.n_bins
    n_mels = config.n_mels
    mel_low = _freq_to_mel(config.lower_frequency_hz)
    mel_hi = _freq_to_mel(config.upper_hz)
    # n_mels + 1 center frequencies; centers[k] is the upper band edge of
    # channel k-1 and the peak of channel k.
    spacing = (mel_hi - mel_low) / (n_mels + 1)
    centers = mel_low + spacing * (np.arange(n_mels + 1, dtype=np.float64) + 1)

    hz_per_bin = 0.5 * config.sample_rate / (n_bins - 1)
    start_index = int(1.5 + config.lower_frequency_hz / hz_per_bin)
    end_index = int(config.upper_hz / hz_per_bin)

    mel_matrix = np.zeros((n_bins, n_mels), dtype=np.float64)
    for i in range(start_index, min(end_index, n_bins - 1) + 1):
        melf = _freq_to_mel(i * hz_per_bin)
        # channel whose upper edge is the first center above this bin
        channel = int(np.searchsorted(centers[:n_mels], melf, side="left")) - 1
        if channel >= 0:
            weight = (centers[channel + 1] - melf) / (
                centers[channel + 1] - centers[channel]
            )
        else:
            weight = (centers[0] - melf) / (centers[0] - mel_low)
        if channel >= 0:
            mel_matrix[i, channel] += weight  # falling edge of triangle
        if channel + 1 < n_mels:
            mel_matrix[i, channel + 1] += 1.0 - weight  # rising edge

    # DCT-II, globally scaled by sqrt(2/n_mels).
    j = np.arange(n_mels, dtype=np.float64)
    k = np.arange(config.n_mfcc, dtype=np.float64)
    dct = np.sqrt(2.0 / n_mels) * np.cos(
        np.pi / n_mels * np.outer(k, (j + 0.5))
    )  # [n_mfcc, n_mels]

    # Keep constants as numpy: they are baked into each jaxpr as literals.
    # (Caching jnp arrays would capture tracers when first called under jit.)
    return (
        window.astype(np.float32),
        mel_matrix.astype(np.float32),
        dct.T.astype(np.float32),
    )


def _frame(audio: jax.Array, window_samples: int, step_samples: int) -> jax.Array:
    """[..., n_samples] -> [..., n_frames, window_samples] by strided gather."""
    n_samples = audio.shape[-1]
    n_frames = max(0, (n_samples - window_samples) // step_samples + 1)
    idx = (
        np.arange(n_frames)[:, None] * step_samples + np.arange(window_samples)[None, :]
    )
    return audio[..., idx]


@functools.lru_cache(maxsize=None)
def _dft_matrices(config: FeatureConfig):
    """Real-DFT as two dense matrices [window, n_bins].

    On TPU this beats jnp.fft.rfft by >10x: a 512-point DFT over tens of
    thousands of frames is exactly the dense [frames,512]x[512,257] shape
    the MXU eats, while XLA's generic FFT lowering is scalar-heavy. The
    window function folds into the matrices so framing -> power spectrum
    is gather + 2 matmuls + square-add.
    """
    n = config.fft_length
    w = config.window_samples
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(w, dtype=np.float64) / w)
    k = np.arange(config.n_bins, dtype=np.float64)
    t = np.arange(w, dtype=np.float64)  # zero-padding to fft_length is implicit
    angle = -2.0 * np.pi * np.outer(t, k) / n
    cos_mat = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_mat = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_mat, sin_mat


def spectrogram(
    audio: jax.Array, config: FeatureConfig = FeatureConfig(), magnitude_squared: bool = True
) -> jax.Array:
    """[..., n_samples] float audio in [-1, 1] -> [..., n_frames, n_bins]."""
    cos_mat, sin_mat = _dft_matrices(config)
    frames = _frame(audio, config.window_samples, config.step_samples)
    real = jnp.matmul(frames, cos_mat, precision="highest")
    imag = jnp.matmul(frames, sin_mat, precision="highest")
    power = jnp.square(real) + jnp.square(imag)
    return power if magnitude_squared else jnp.sqrt(power)


def mfcc_from_spectrogram(
    power_spec: jax.Array, config: FeatureConfig = FeatureConfig()
) -> jax.Array:
    """[..., n_frames, n_bins] magnitude-squared -> [..., n_frames, n_mfcc]."""
    _, mel_matrix, dct_t = _constants(config)
    magnitude = jnp.sqrt(power_spec)
    # These contractions are tiny ([T,257]@[257,40], [T,40]@[40,26]) but feed
    # a log: force true-f32 MXU passes so features stay parity-grade even
    # where the platform default matmul precision is bf16.
    mel = jnp.matmul(magnitude, mel_matrix, precision="highest")
    log_mel = jnp.log(jnp.maximum(mel, _FILTERBANK_FLOOR))
    return jnp.matmul(log_mel, dct_t, precision="highest")


try:  # scipy's pocketfft does native float32 (half the work + memory of
    # numpy's always-float64 rfft) and releases the GIL — this is the
    # data-pipeline hot loop (bench e2e_train_epoch_throughput)
    from scipy import fft as _sfft
except ImportError:  # pragma: no cover - scipy is in the image
    _sfft = None


@functools.lru_cache(maxsize=8)
def _frame_index(n_frames: int, window_samples: int, step_samples: int):
    return (
        np.arange(n_frames)[:, None] * step_samples
        + np.arange(window_samples)[None, :]
    )


def spectrogram_numpy(
    audio: np.ndarray, config: FeatureConfig = FeatureConfig()
) -> np.ndarray:
    """Host (numpy) spectrogram for the data pipeline — same constants and
    semantics as the jnp path (tests assert equality); keeps per-sample
    feature extraction off the accelerator where shapes vary."""
    window, _, _ = _constants(config)
    n = len(audio)
    n_frames = max(0, (n - config.window_samples) // config.step_samples + 1)
    idx = _frame_index(n_frames, config.window_samples, config.step_samples)
    frames = np.asarray(audio, np.float32)[idx] * window
    if _sfft is not None:
        spec = _sfft.rfft(frames, n=config.fft_length, axis=-1)
    else:
        spec = np.fft.rfft(frames, n=config.fft_length, axis=-1)
    power = spec.real.astype(np.float32) ** 2
    power += spec.imag.astype(np.float32) ** 2
    return power


def mfcc_from_spectrogram_numpy(
    power_spec: np.ndarray, config: FeatureConfig = FeatureConfig()
) -> np.ndarray:
    # float32 throughout — matches the jnp path (precision="highest" f32
    # MXU passes) tighter than the previous f64 detour did, at half the
    # cost; TF-parity gated in tests/test_frontend.py
    _, mel_matrix, dct_t = _constants(config)
    magnitude = np.sqrt(power_spec.astype(np.float32))
    mel = magnitude @ mel_matrix
    log_mel = np.log(np.maximum(mel, _FILTERBANK_FLOOR, dtype=np.float32))
    return log_mel @ dct_t


def audio_to_mfcc_numpy(
    audio: np.ndarray, config: FeatureConfig = FeatureConfig()
) -> np.ndarray:
    return mfcc_from_spectrogram_numpy(spectrogram_numpy(audio, config), config)


def audio_to_mfcc(
    audio: jax.Array, config: FeatureConfig = FeatureConfig()
) -> jax.Array:
    """Full frontend. [..., n_samples] -> [..., n_frames, n_mfcc].

    Batched inputs should be zero-padded on the right; use `num_frames` on
    per-utterance sample counts to get valid feature lengths (zero padding
    produces frames past the valid length which downstream masking drops).
    """
    return mfcc_from_spectrogram(spectrogram(audio, config), config)
