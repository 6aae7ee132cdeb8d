from stt_tpu.frontend.features import (
    FeatureConfig,
    audio_to_mfcc,
    mfcc_from_spectrogram,
    num_frames,
    spectrogram,
)

__all__ = [
    "FeatureConfig",
    "audio_to_mfcc",
    "mfcc_from_spectrogram",
    "num_frames",
    "spectrogram",
]
