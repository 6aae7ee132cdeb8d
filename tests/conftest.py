"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU devices (the reference had no
distributed tests at all — SURVEY.md §4.5); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# XLA_FLAGS must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import jax  # noqa: E402

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding JAX_PLATFORMS — tests would
# silently run serially on the tunneled TPU. Force the config itself.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

assert len(jax.devices()) == 8, jax.devices()

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def smoke_wav(reference_root):
    path = os.path.join(reference_root, "data/smoke_test/LDC93S1.wav")
    if not os.path.isfile(path):
        pytest.skip("LDC93S1 smoke wav not available")
    return path
