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


SMOKE_TRANSCRIPT = "she had your dark suit in greasy wash water all year"


@pytest.fixture(scope="session")
def trained_smoke(smoke_wav):
    """Tiny model overfit on LDC93S1 (the bin/run-ldc93s1.sh recipe),
    shared by the E2E, serve, and streaming test suites.

    Returns (params, model_config, feature_config, alphabet, audio)."""
    import numpy as np
    import jax.numpy as jnp
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.data import read_wav
    from stt_tpu.frontend import FeatureConfig, audio_to_mfcc
    from stt_tpu.models import ModelConfig
    from stt_tpu.train import Batch, create_train_state, make_train_step
    from stt_tpu.train.step import create_optimizer

    audio, rate = read_wav(smoke_wav)
    assert rate == 16000
    feature_config = FeatureConfig()
    feats = np.asarray(audio_to_mfcc(jnp.asarray(audio), feature_config))
    alphabet = Alphabet(os.path.join(REFERENCE_ROOT, "data/alphabet.txt"))
    labels = np.asarray(alphabet.encode(SMOKE_TRANSCRIPT), np.int32)
    batch = Batch(
        features=jnp.asarray(feats[None]),
        feature_lengths=jnp.asarray([feats.shape[0]], np.int32),
        labels=jnp.asarray(labels[None]),
        label_lengths=jnp.asarray([len(labels)], np.int32),
    )
    config = ModelConfig(
        n_hidden=100, n_cell_dim=100, n_out=alphabet.size + 1,
        dropout_rates=(0.0,) * 6,
    )
    optimizer = create_optimizer(learning_rate=0.001)
    state = create_train_state(jax.random.PRNGKey(0), config, optimizer)
    train_step = make_train_step(config, optimizer)
    rng = jax.random.PRNGKey(42)
    loss = None
    for _ in range(600):
        state, metrics = train_step(state, batch, rng)
        loss = float(metrics.loss)
        if loss < 0.5:
            break
    assert loss is not None and loss < 1.0, f"smoke overfit failed: {loss}"
    return (
        jax.device_get(state.params),
        config,
        feature_config,
        alphabet,
        audio,
    )
