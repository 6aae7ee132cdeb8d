"""Model artifact export/load roundtrip + packaging."""

import numpy as np
import pytest

import jax

from stt_tpu.alphabet import Alphabet, UTF8Alphabet
from stt_tpu.artifact import (
    build_metadata,
    feature_config_from_metadata,
    load_artifact,
    model_config_from_metadata,
    package_zip,
    save_artifact,
)
from stt_tpu.frontend import FeatureConfig
from stt_tpu.models import ModelConfig, init_params

CFG = ModelConfig(n_input=4, n_context=2, n_hidden=16, n_cell_dim=16, n_out=5)


def make_artifact(tmp_path, alphabet=None):
    if alphabet is None:
        alphabet = Alphabet().init_from_labels([" ", "a", "b", "c"])
    params = init_params(jax.random.PRNGKey(0), CFG)
    meta = build_metadata(CFG, FeatureConfig(), alphabet, beam_width=32)
    out = save_artifact(str(tmp_path / "model"), params, meta, alphabet)
    return out, params, alphabet


def test_roundtrip_directory(tmp_path):
    out, params, alphabet = make_artifact(tmp_path)
    loaded, meta, loaded_alphabet = load_artifact(out)
    assert loaded_alphabet.labels == alphabet.labels
    assert meta["beam_width"] == 32
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg = model_config_from_metadata(meta)
    assert cfg.n_hidden == CFG.n_hidden and cfg.n_out == CFG.n_out
    fc = feature_config_from_metadata(meta)
    assert fc.window_samples == 512 and fc.step_samples == 320


def test_roundtrip_zip(tmp_path):
    out, params, alphabet = make_artifact(tmp_path)
    zip_path = package_zip(out)
    assert zip_path.endswith(".sttpkg")
    loaded, meta, _ = load_artifact(zip_path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bytes_output_mode(tmp_path):
    out, _, _ = make_artifact(tmp_path, alphabet=UTF8Alphabet())
    _, meta, alphabet = load_artifact(out)
    assert meta["bytes_output_mode"]
    assert isinstance(alphabet, UTF8Alphabet)


def test_rejects_non_artifact(tmp_path):
    import json, os

    bad = tmp_path / "bad"
    os.makedirs(bad)
    (bad / "metadata.json").write_text(json.dumps({"format": "other"}))
    with pytest.raises(ValueError):
        load_artifact(str(bad))
