"""C API (libstt_tpu) — the coqui-stt.h-equivalent binding surface.

Two drive modes: ctypes in-process (reuses this interpreter) and the
compiled native stt_client binary (boots an embedded interpreter),
mirroring the reference's cpp_tflite-tests.sh accuracy gate.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import SMOKE_TRANSCRIPT

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "stt_tpu", "native")
LIB = os.path.abspath(os.path.join(NATIVE_DIR, "libstt_tpu.so"))
CLIENT = os.path.abspath(os.path.join(NATIVE_DIR, "stt_client"))


class TokenMetadata(ctypes.Structure):
    _fields_ = [
        ("text", ctypes.c_char_p),
        ("timestep", ctypes.c_uint),
        ("start_time", ctypes.c_float),
    ]


class CandidateTranscript(ctypes.Structure):
    _fields_ = [
        ("tokens", ctypes.POINTER(TokenMetadata)),
        ("num_tokens", ctypes.c_uint),
        ("confidence", ctypes.c_double),
    ]


class Metadata(ctypes.Structure):
    _fields_ = [
        ("transcripts", ctypes.POINTER(CandidateTranscript)),
        ("num_transcripts", ctypes.c_uint),
    ]


@pytest.fixture(scope="module")
def lib():
    if not os.path.isfile(LIB):
        pytest.skip("libstt_tpu.so not built (make -C stt_tpu/native)")
    lib = ctypes.CDLL(LIB)
    lib.STT_CreateModel.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_void_p)]
    lib.STT_SpeechToText.restype = ctypes.c_void_p
    lib.STT_IntermediateDecode.restype = ctypes.c_void_p
    lib.STT_FinishStream.restype = ctypes.c_void_p
    lib.STT_Version.restype = ctypes.c_void_p
    lib.STT_ErrorCodeToErrorMessage.restype = ctypes.c_void_p
    lib.STT_SpeechToTextWithMetadata.restype = ctypes.POINTER(Metadata)
    return lib


def take_string(lib, ptr) -> str:
    assert ptr, "null string from C API"
    text = ctypes.string_at(ptr).decode("utf-8")
    lib.STT_FreeString(ctypes.c_void_p(ptr))
    return text


@pytest.fixture(scope="module")
def smoke_model_dir(trained_smoke, tmp_path_factory):
    from stt_tpu.artifact import build_metadata, save_artifact

    params, config, feature_config, alphabet, _ = trained_smoke
    return save_artifact(
        str(tmp_path_factory.mktemp("capi") / "model"),
        params, build_metadata(config, feature_config, alphabet,
                               beam_width=64),
        alphabet,
    )


@pytest.fixture(scope="module")
def pcm(trained_smoke):
    audio = trained_smoke[4]
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    return pcm16, pcm16.ctypes.data_as(ctypes.POINTER(ctypes.c_short))


def test_create_model_error_code(lib):
    handle = ctypes.c_void_p()
    err = lib.STT_CreateModel(b"/nonexistent/model", ctypes.byref(handle))
    assert err != 0
    message = take_string(lib, lib.STT_ErrorCodeToErrorMessage(err))
    assert message


def test_version(lib):
    import stt_tpu

    assert take_string(lib, lib.STT_Version()) == stt_tpu.__version__


def test_one_shot_and_config(lib, smoke_model_dir, pcm):
    handle = ctypes.c_void_p()
    err = lib.STT_CreateModel(smoke_model_dir.encode(), ctypes.byref(handle))
    assert err == 0
    assert lib.STT_GetModelSampleRate(handle) == 16000
    assert lib.STT_GetModelBeamWidth(handle) == 64
    assert lib.STT_SetModelBeamWidth(handle, 32) == 0
    assert lib.STT_GetModelBeamWidth(handle) == 32

    pcm16, buf = pcm
    text = take_string(lib, lib.STT_SpeechToText(handle, buf, len(pcm16)))
    assert text == SMOKE_TRANSCRIPT

    metadata = lib.STT_SpeechToTextWithMetadata(handle, buf, len(pcm16), 2)
    assert metadata.contents.num_transcripts >= 1
    best = metadata.contents.transcripts[0]
    joined = b"".join(
        best.tokens[i].text for i in range(best.num_tokens)
    ).decode("utf-8")
    assert joined == SMOKE_TRANSCRIPT
    starts = [best.tokens[i].start_time for i in range(best.num_tokens)]
    assert starts == sorted(starts)
    lib.STT_FreeMetadata(metadata)
    lib.STT_FreeModel(handle)


def test_streaming_and_hot_words(lib, smoke_model_dir, pcm):
    handle = ctypes.c_void_p()
    assert lib.STT_CreateModel(smoke_model_dir.encode(),
                               ctypes.byref(handle)) == 0
    assert lib.STT_AddHotWord(handle, b"dark", ctypes.c_float(1.5)) == 0
    assert lib.STT_EraseHotWord(handle, b"dark") == 0
    assert lib.STT_ClearHotWords(handle) == 0

    stream = ctypes.c_void_p()
    assert lib.STT_CreateStream(handle, ctypes.byref(stream)) == 0
    pcm16, buf = pcm
    chunk = 8000
    for off in range(0, len(pcm16), chunk):
        n = min(chunk, len(pcm16) - off)
        ptr = pcm16[off:].ctypes.data_as(ctypes.POINTER(ctypes.c_short))
        lib.STT_FeedAudioContent(stream, ptr, n)
    partial = take_string(lib, lib.STT_IntermediateDecode(stream))
    assert isinstance(partial, str)
    final = take_string(lib, lib.STT_FinishStream(stream))
    assert final == SMOKE_TRANSCRIPT
    lib.STT_FreeModel(handle)


def test_native_client_binary_embedded_interpreter(smoke_model_dir, trained_smoke,
                                                   tmp_path):
    """The compiled C client boots its own interpreter (the true
    embedding path) and must print the exact smoke transcript."""
    if not os.path.isfile(CLIENT):
        pytest.skip("stt_client not built")
    from stt_tpu.data.audio import write_wav

    wav = str(tmp_path / "smoke.wav")
    write_wav(wav, trained_smoke[4], 16000)
    env = dict(
        os.environ,
        PYTHONPATH=os.pathsep.join(
            [os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))]
            + sys.path
        ),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    # The TPU-tunnel sitecustomize (gated on PALLAS_AXON_POOL_IPS) would
    # make the embedded interpreter dial the single-grant tunnel at boot;
    # with pytest's own interpreter holding the grant, that blocks
    # forever. This is a CPU accuracy gate — keep the subprocess hermetic.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [CLIENT, "--model", smoke_model_dir, "--audio", wav],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip() == SMOKE_TRANSCRIPT
