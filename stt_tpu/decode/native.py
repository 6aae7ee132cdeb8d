"""ctypes bridge to the native decoder library (stt_tpu/native).

The native decoder implements the identical semantics as beam.py ~100x
faster (C++ beam bookkeeping + native KenLM/FST readers). This wrapper
builds the shared library on first use (plain g++, no build-system
dependencies), exposes a NativeDecoderState with the DecoderState
interface, and reports availability so callers can fall back to the
Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

from stt_tpu.decode.beam import DecodeResult

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstt_decoder.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _ensure_built() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "ctc_decoder.cpp")
    if os.path.isfile(_LIB_PATH):
        # rebuild when the source is newer than the library
        if not os.path.isfile(src) or (
            os.path.getmtime(src) <= os.path.getmtime(_LIB_PATH)
        ):
            return None
    if not os.path.isfile(src):
        return "native source missing"
    try:
        result = subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src, "-o", _LIB_PATH],
            capture_output=True, text=True, timeout=300,
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"compiler unavailable: {e}"
    if result.returncode != 0:
        return f"native build failed: {result.stderr[-500:]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _ensure_built()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decoder_create.restype = ctypes.c_void_p
        lib.decoder_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int,
        ]
        lib.decoder_enable_scorer.restype = ctypes.c_int
        lib.decoder_enable_scorer.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
        ]
        lib.decoder_set_alpha_beta.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        ]
        lib.decoder_add_hot_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_float,
        ]
        lib.decoder_clear_hot_words.argtypes = [ctypes.c_void_p]
        lib.decoder_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.decoder_next_pruned.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.decoder_decode.restype = ctypes.c_int
        lib.decoder_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        lib.decoder_reset.argtypes = [ctypes.c_void_p]
        lib.decoder_free.argtypes = [ctypes.c_void_p]
        lib.scorer_validate.restype = ctypes.c_int
        lib.scorer_validate.argtypes = [ctypes.c_char_p]
        lib.scorer_create.restype = ctypes.c_void_p
        lib.scorer_create.argtypes = [ctypes.c_char_p]
        lib.scorer_free.argtypes = [ctypes.c_void_p]
        lib.decoder_attach_scorer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        ]
        _lib = lib
        return _lib


# scorer packages parsed once and shared read-only across decoder
# instances (path -> native handle). The per-decoder alpha/beta live in
# the decoder, so sharing is safe; a batch fan-out attaches one parsed
# copy per utterance instead of re-reading the file each time.
_scorer_cache: Dict[str, int] = {}


def _shared_scorer(lib, path: str) -> int:
    with _lock:
        handle = _scorer_cache.get(path)
        if handle is None:
            handle = lib.scorer_create(path.encode())
            if not handle:
                raise ValueError(f"native scorer load failed: {path}")
            _scorer_cache[path] = handle
        return handle


def native_available() -> bool:
    return _load() is not None


def native_build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeDecoderState:
    """Same interface as stt_tpu.decode.DecoderState, natively backed.

    The scorer is specified by path (the native library reads the .scorer
    package itself) rather than as a Python object."""

    def __init__(
        self,
        alphabet,
        beam_size: int,
        cutoff_prob: float = 1.0,
        cutoff_top_n: int = 40,
        scorer_path: Optional[str] = None,
        alpha: Optional[float] = None,
        beta: Optional[float] = None,
        hot_words: Optional[Dict[str, float]] = None,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native decoder unavailable: {_build_error}")
        self._lib = lib
        self.alphabet = alphabet
        blob = b"".join(
            struct.pack("<H", len(lab.encode("utf-8"))) + lab.encode("utf-8")
            for lab in alphabet.labels
        )
        self._handle = lib.decoder_create(
            blob, alphabet.size, alphabet.space_index, beam_size,
            cutoff_prob, cutoff_top_n,
        )
        if scorer_path:
            nan = float("nan")
            lib.decoder_attach_scorer(
                self._handle, _shared_scorer(lib, scorer_path),
                nan if alpha is None else alpha,
                nan if beta is None else beta,
            )
        for word, boost in (hot_words or {}).items():
            lib.decoder_add_hot_word(self._handle, word.encode(), boost)

    def next(self, probs: np.ndarray) -> None:
        probs = np.ascontiguousarray(probs, np.float64)
        t, c = probs.shape
        self._lib.decoder_next(
            self._handle,
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t, c,
        )

    def next_pruned(self, indices, logps, counts, blank_probs) -> None:
        """Advance over device-pruned emissions (decode/device.py
        prune_emissions): indices/logps [T, K], counts/blank_probs [T]."""
        indices = np.ascontiguousarray(indices, np.int32)
        logps = np.ascontiguousarray(logps, np.float32)
        counts = np.ascontiguousarray(counts, np.int32)
        blank_probs = np.ascontiguousarray(blank_probs, np.float32)
        t, k = indices.shape
        self._lib.decoder_next_pruned(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            logps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            blank_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t, k,
        )

    def decode(self, num_results: int = 1) -> List[DecodeResult]:
        max_tokens = 65536
        tokens = np.zeros(max_tokens, np.int32)
        timesteps = np.zeros(max_tokens, np.int32)
        lengths = np.zeros(num_results, np.int32)
        confidences = np.zeros(num_results, np.float64)
        n = self._lib.decoder_decode(
            self._handle, num_results,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            timesteps.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            confidences.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            max_tokens,
        )
        results = []
        pos = 0
        for i in range(n):
            length = int(lengths[i])
            toks = tokens[pos : pos + length].tolist()
            steps = timesteps[pos : pos + length].tolist()
            pos += length
            results.append(
                DecodeResult(
                    confidence=float(confidences[i]),
                    transcript=self.alphabet.decode(toks),
                    tokens=toks,
                    timesteps=steps,
                )
            )
        return results

    def reset(self) -> None:
        self._lib.decoder_reset(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.decoder_free(self._handle)
            self._handle = None


def validate_scorer(path: str) -> bool:
    lib = _load()
    if lib is None:
        return False
    return lib.scorer_validate(path.encode()) == 0
