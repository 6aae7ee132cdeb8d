from stt_tpu.serve.model import (
    CandidateTranscript,
    Metadata,
    Model,
    Stream,
    TokenMetadata,
)

__all__ = ["Model", "Stream", "Metadata", "CandidateTranscript", "TokenMetadata"]
