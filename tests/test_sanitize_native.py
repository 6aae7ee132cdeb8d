"""Native decoder under ASan/UBSan (reference valgrind-memcheck parity)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "stt_tpu", "native")
)


def test_decoder_smoke_under_sanitizers():
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("native toolchain unavailable")
    proc = subprocess.run(
        ["make", "sanitize"], cwd=NATIVE, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-3000:]
    assert "decoder_smoke OK" in proc.stdout
    assert "AddressSanitizer" not in proc.stdout + proc.stderr
    assert "runtime error" not in proc.stdout + proc.stderr  # UBSan
