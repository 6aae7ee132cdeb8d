"""Checkpoint manager: save/restore, retention, best/last ordering,
transfer learning drop-layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.models import ModelConfig
from stt_tpu.train import Batch, create_train_state, make_train_step
from stt_tpu.train.checkpoints import (
    CheckpointManager,
    drop_layers,
    load_graph_for_evaluation,
    load_or_init_graph_for_training,
)
from stt_tpu.train.step import create_optimizer

CFG = ModelConfig(n_input=4, n_context=1, n_hidden=8, n_cell_dim=8, n_out=5,
                  dropout_rates=(0.0,) * 6)


def make_state(seed=0):
    return create_train_state(
        jax.random.PRNGKey(seed), CFG, create_optimizer()
    )


def step_once(state, seed=0):
    rng = np.random.RandomState(seed)
    batch = Batch(
        features=jnp.asarray(rng.randn(2, 6, 4), jnp.float32),
        feature_lengths=jnp.full((2,), 6, jnp.int32),
        labels=jnp.asarray(rng.randint(0, 4, (2, 2)), np.int32),
        label_lengths=jnp.full((2,), 2, jnp.int32),
    )
    train_step = make_train_step(CFG, create_optimizer())
    state, _ = train_step(state, batch, jax.random.PRNGKey(0))
    return state


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = step_once(make_state())
    mgr.save(state, "last")
    restored = mgr.restore(make_state(seed=1), "last")
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = make_state()
    for i in range(4):
        state = state._replace(step=jnp.asarray(i + 1, jnp.int32))
        mgr.save(state, "last")
    assert mgr.steps("last") == [3, 4]


def test_load_order_best_then_last(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    template = make_state(seed=3)
    # only last exists
    s1 = make_state()._replace(step=jnp.asarray(5, jnp.int32))
    mgr.save(s1, "last")
    state, method = load_or_init_graph_for_training(mgr, template)
    assert method == "last" and int(state.step) == 5
    # best_dev exists -> wins
    s2 = make_state()._replace(step=jnp.asarray(9, jnp.int32))
    mgr.save(s2, "best_dev", dev_loss=1.5)
    state, method = load_or_init_graph_for_training(mgr, template)
    assert method == "best_dev" and int(state.step) == 9
    assert mgr.best_dev_loss() == pytest.approx(1.5)
    # eval never inits
    state, method = load_graph_for_evaluation(mgr, template)
    assert method == "best_dev"


def test_init_when_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    template = make_state()
    state, method = load_or_init_graph_for_training(mgr, template)
    assert method == "init"
    with pytest.raises(FileNotFoundError):
        load_graph_for_evaluation(mgr, template)


def test_drop_layers_transfer():
    fresh = make_state(seed=0).params
    source = make_state(seed=1).params
    mixed = drop_layers(fresh, source, 2)  # drop layer_6 + layer_5
    np.testing.assert_array_equal(
        np.asarray(mixed["layer_1"]["w"]), np.asarray(source["layer_1"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(mixed["layer_6"]["w"]), np.asarray(fresh["layer_6"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(mixed["lstm"]["kernel"]), np.asarray(source["lstm"]["kernel"])
    )
