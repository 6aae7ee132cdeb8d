"""Reference TF-checkpoint importer: name mapping, geometry inference,
and end-to-end forward through imported params."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from stt_tpu.compat.tf_checkpoint import (
    infer_geometry,
    load_reference_checkpoint,
    params_from_reader,
)
from stt_tpu.models import ModelConfig, apply_model

N_INPUT, N_CONTEXT, N_HIDDEN, N_OUT = 26, 9, 64, 29
WINDOW_INPUT = (2 * N_CONTEXT + 1) * N_INPUT


def make_reference_checkpoint(tmp_path):
    rng = np.random.RandomState(0)
    g = tf.Graph()
    with g.as_default():
        v1 = tf.compat.v1
        variables = {}

        def var(name, shape):
            variables[name] = v1.get_variable(
                name, initializer=rng.randn(*shape).astype(np.float32) * 0.1
            )

        dims = {
            "layer_1": (WINDOW_INPUT, N_HIDDEN),
            "layer_2": (N_HIDDEN, N_HIDDEN),
            "layer_3": (N_HIDDEN, N_HIDDEN),
            "layer_5": (N_HIDDEN, N_HIDDEN),
            "layer_6": (N_HIDDEN, N_OUT),
        }
        for layer, (n_in, n_out) in dims.items():
            var(f"{layer}/weights", (n_in, n_out))
            var(f"{layer}/bias", (n_out,))
        scope = "cudnn_lstm/rnn/multi_rnn_cell/cell_0/cudnn_compatible_lstm_cell"
        var(f"{scope}/kernel", (2 * N_HIDDEN, 4 * N_HIDDEN))
        var(f"{scope}/bias", (4 * N_HIDDEN,))
        saver = v1.train.Saver()
        with v1.Session(graph=g) as sess:
            sess.run(v1.global_variables_initializer())
            path = saver.save(sess, str(tmp_path / "ref_model"), global_step=42)
    return path


def test_import_and_forward(tmp_path):
    ckpt_path = make_reference_checkpoint(tmp_path)
    params = load_reference_checkpoint(ckpt_path)
    assert params["layer_1"]["w"].shape == (WINDOW_INPUT, N_HIDDEN)
    assert params["lstm"]["kernel"].shape == (2 * N_HIDDEN, 4 * N_HIDDEN)

    geometry = infer_geometry(params)
    assert geometry == {
        "n_input": N_INPUT,
        "n_context": N_CONTEXT,
        "n_hidden": N_HIDDEN,
        "n_cell_dim": N_HIDDEN,
        "n_out": N_OUT,
        "layer_norm": False,
    }

    config = ModelConfig(
        n_input=N_INPUT, n_context=N_CONTEXT, n_hidden=N_HIDDEN,
        n_cell_dim=N_HIDDEN, n_out=N_OUT, dropout_rates=(0.0,) * 6,
    )
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 12, N_INPUT).astype(np.float32)
    logits, _ = apply_model(params, feats, config=config)
    assert logits.shape == (2, 12, N_OUT)
    assert np.isfinite(np.asarray(logits)).all()


def test_dense_layer_math_matches_reference_semantics(tmp_path):
    """Imported dense layer == min(relu(x @ W + b), 20) computed by TF."""
    ckpt_path = make_reference_checkpoint(tmp_path)
    params = load_reference_checkpoint(ckpt_path)
    rng = np.random.RandomState(2)
    x = rng.randn(4, WINDOW_INPUT).astype(np.float32)
    w, b = params["layer_1"]["w"], params["layer_1"]["b"]
    ref = tf.minimum(tf.nn.relu(tf.nn.bias_add(tf.matmul(x, w), b)), 20.0)

    from stt_tpu.models.deepspeech import _dense

    cfg = ModelConfig(n_hidden=N_HIDDEN, n_cell_dim=N_HIDDEN, n_out=N_OUT)
    got = _dense({"w": w, "b": b}, x, cfg)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5,
                               atol=1e-5)
