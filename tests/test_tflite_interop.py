"""Reference .tflite artifact interop: export stt_tpu params to the
reference's released-model format (named tensors + metadata_*,
tflitemodelstate.cc:211-303) and read it back with the TF-independent
flatbuffer importer — gated on logits parity three ways (our model, the
importer round-trip, and the actual TFLite interpreter executing the
artifact)."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from stt_tpu.alphabet import Alphabet
from stt_tpu.compat.tflite import TFLiteModel, read_reference_tflite
from stt_tpu.compat.tflite_export import export_reference_tflite
from stt_tpu.models import ModelConfig, apply_model, init_params
from stt_tpu.models.deepspeech import create_overlapping_windows

CFG = ModelConfig(
    n_input=26, n_context=9, n_hidden=64, n_cell_dim=64, n_out=29,
    dropout_rates=(0.0,) * 6,
)
N_STEPS = 16


def english():
    return Alphabet("/root/reference/data/alphabet.txt")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    params = init_params(jax.random.PRNGKey(5), CFG)
    path = str(tmp_path_factory.mktemp("tflite") / "model.tflite")
    export_reference_tflite(params, english(), path, n_steps=N_STEPS)
    return params, path


def test_named_tensor_api_boundary(exported):
    """Every tensor the reference C++ runtime resolves by name exists
    with the right shape (tflitemodelstate.cc:211-218)."""
    _, path = exported
    m = TFLiteModel.from_file(path)
    in_names = {m.tensors[i].name: m.tensors[i].shape for i in m.inputs}
    out_names = {m.tensors[i].name: m.tensors[i].shape for i in m.outputs}
    assert in_names["input_node"] == [1, N_STEPS, 19, 26]
    assert in_names["previous_state_c"] == [1, 64]
    assert in_names["previous_state_h"] == [1, 64]
    assert in_names["input_samples"] == [512]
    assert out_names["logits"] == [N_STEPS, 29]
    assert out_names["new_state_c"] == [1, 64]
    assert out_names["new_state_h"] == [1, 64]
    assert "mfccs" in out_names
    for k in ("metadata_version", "metadata_sample_rate",
              "metadata_feature_win_len", "metadata_feature_win_step",
              "metadata_beam_width", "metadata_alphabet"):
        assert k in out_names, k


def test_metadata_roundtrip(exported):
    _, path = exported
    _, meta, geo = read_reference_tflite(path)
    assert meta["version"] == 6
    assert meta["sample_rate"] == 16000
    assert meta["feature_win_len"] == 32
    assert meta["feature_win_step"] == 20
    assert meta["beam_width"] == 500
    a = Alphabet.deserialize(meta["alphabet_serialized"])
    assert a.labels == english().labels
    assert geo == {
        "n_input": 26, "n_context": 9, "n_hidden": 64, "n_cell_dim": 64,
        "n_out": 29, "n_steps": N_STEPS, "layer_norm": False,
    }


def test_weight_roundtrip_exact(exported):
    params, path = exported
    imported, _, _ = read_reference_tflite(path)
    for layer in ("layer_1", "layer_2", "layer_3", "layer_5", "layer_6"):
        np.testing.assert_array_equal(
            np.asarray(params[layer]["w"]), imported[layer]["w"]
        )
        np.testing.assert_array_equal(
            np.asarray(params[layer]["b"]), imported[layer]["b"]
        )
    np.testing.assert_array_equal(
        np.asarray(params["lstm"]["kernel"]), imported["lstm"]["kernel"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["lstm"]["bias"]), imported["lstm"]["bias"]
    )


def _interpreter_forward(path, windowed, c, h):
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    idx = {d["name"]: d["index"] for d in interp.get_input_details()}
    out = {d["name"]: d["index"] for d in interp.get_output_details()}
    interp.set_tensor(idx["input_node"], windowed.astype(np.float32))
    interp.set_tensor(idx["previous_state_c"], c.astype(np.float32))
    interp.set_tensor(idx["previous_state_h"], h.astype(np.float32))
    interp.set_tensor(
        idx["input_samples"], np.zeros(512, np.float32)
    )
    interp.invoke()
    return (
        interp.get_tensor(out["logits"]),
        interp.get_tensor(out["new_state_c"]),
        interp.get_tensor(out["new_state_h"]),
    )


def test_logits_parity_ours_vs_artifact(exported):
    """softmax(apply_model logits) == the artifact executed by the real
    TFLite interpreter, including LSTM state carry across two chunks."""
    params, path = exported
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 2 * N_STEPS, 26).astype(np.float32) * 0.5

    logits, state = jax.jit(
        lambda p, f: apply_model(p, f, config=CFG)
    )(params, jnp.asarray(feats))
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))[0]

    windowed = np.asarray(
        create_overlapping_windows(jnp.asarray(feats), CFG.n_context)
    ).reshape(1, 2 * N_STEPS, 19, 26)
    c = np.zeros((1, 64), np.float32)
    h = np.zeros((1, 64), np.float32)
    probs1, c, h = _interpreter_forward(path, windowed[:, :N_STEPS], c, h)
    probs2, c, h = _interpreter_forward(path, windowed[:, N_STEPS:], c, h)
    theirs = np.concatenate([probs1, probs2], axis=0)

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state[0])[0], c[0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state[1])[0], h[0], rtol=1e-4, atol=1e-5
    )


def test_import_into_model_forward(exported):
    """Artifact -> importer -> apply_model: the full 'released reference
    model enters this framework' path."""
    params, path = exported
    imported, meta, geo = read_reference_tflite(path)
    cfg = ModelConfig(
        n_input=geo["n_input"], n_context=geo["n_context"],
        n_hidden=geo["n_hidden"], n_cell_dim=geo["n_cell_dim"],
        n_out=geo["n_out"], dropout_rates=(0.0,) * 6,
    )
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 24, 26).astype(np.float32) * 0.5
    ref_logits, _ = jax.jit(
        lambda p, f: apply_model(p, f, config=CFG)
    )(params, jnp.asarray(feats))
    imp_logits, _ = jax.jit(
        lambda p, f: apply_model(p, f, config=cfg)
    )(jax.tree.map(jnp.asarray, imported), jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(imp_logits), rtol=1e-6, atol=1e-6
    )


def test_quantized_artifact_import(exported, tmp_path):
    """Optimize.DEFAULT (the reference's default export flavor,
    export.py:146): int8 weights dequantize through the importer and
    logits stay close to f32."""
    params, _ = exported
    qpath = str(tmp_path / "model_q.tflite")
    export_reference_tflite(params, english(), qpath, n_steps=N_STEPS,
                            quantize=True)
    assert os.path.getsize(qpath) > 0
    imported, meta, geo = read_reference_tflite(qpath)
    assert geo["n_hidden"] == 64
    a = Alphabet.deserialize(meta["alphabet_serialized"])
    assert a.labels == english().labels
    cfg = ModelConfig(
        n_input=26, n_context=9, n_hidden=64, n_cell_dim=64, n_out=29,
        dropout_rates=(0.0,) * 6,
    )
    rng = np.random.RandomState(2)
    feats = rng.randn(1, N_STEPS, 26).astype(np.float32) * 0.5
    ref_logits, _ = jax.jit(
        lambda p, f: apply_model(p, f, config=CFG)
    )(params, jnp.asarray(feats))
    q_logits, _ = jax.jit(
        lambda p, f: apply_model(p, f, config=cfg)
    )(jax.tree.map(jnp.asarray, imported), jnp.asarray(feats))
    ref_p = np.asarray(jax.nn.softmax(ref_logits, -1))
    q_p = np.asarray(jax.nn.softmax(q_logits, -1))
    assert np.abs(ref_p - q_p).max() < 0.05
