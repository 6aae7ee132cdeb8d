"""Data-parallel training over the 8-device CPU mesh: sharded steps must
match single-device steps (the loss-curve-equivalence gate, SURVEY.md §7.8)."""

import numpy as np

import jax
import jax.numpy as jnp

from stt_tpu.models import ModelConfig
from stt_tpu.parallel import batch_sharding, make_mesh, replicated
from stt_tpu.train import Batch, create_train_state, make_train_step
from stt_tpu.train.step import create_optimizer

CFG = ModelConfig(
    n_input=8, n_context=2, n_hidden=32, n_cell_dim=32, n_out=12,
    dropout_rates=(0.0,) * 6,
)


def make_batch(rng, b=8, t=20, l=4):
    feats = rng.randn(b, t, CFG.n_input).astype(np.float32)
    labels = rng.randint(0, CFG.n_out - 1, (b, l)).astype(np.int32)
    return Batch(
        features=jnp.asarray(feats),
        feature_lengths=jnp.full((b,), t, jnp.int32),
        labels=jnp.asarray(labels),
        label_lengths=jnp.full((b,), l, jnp.int32),
    )


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_sharded_matches_single_device():
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    optimizer = create_optimizer(learning_rate=1e-3)
    train_step = make_train_step(CFG, optimizer)
    jrng = jax.random.PRNGKey(7)

    # single device
    state1 = create_train_state(jax.random.PRNGKey(0), CFG, optimizer)
    for _ in range(3):
        state1, m1 = train_step(state1, batch, jrng)

    # 8-way data parallel
    mesh = make_mesh(8, 1)
    state2 = create_train_state(jax.random.PRNGKey(0), CFG, optimizer)
    state2 = jax.device_put(state2, replicated(mesh))
    sharded_batch = Batch(
        features=jax.device_put(batch.features, batch_sharding(mesh)),
        feature_lengths=jax.device_put(batch.feature_lengths, batch_sharding(mesh)),
        labels=jax.device_put(batch.labels, batch_sharding(mesh)),
        label_lengths=jax.device_put(batch.label_lengths, batch_sharding(mesh)),
    )
    for _ in range(3):
        state2, m2 = train_step(state2, sharded_batch, jrng)

    np.testing.assert_allclose(
        float(m1.loss), float(m2.loss), rtol=1e-4, atol=1e-5
    )
    # params stay in sync leaf-by-leaf
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_model_axis_tensor_parallel_compiles():
    """2x4 mesh with the model dim sharded — the TP path for oversized
    geometries (BASELINE.md: shard when model exceeds one chip)."""
    from stt_tpu.parallel import param_sharding

    mesh = make_mesh(2, 4)
    optimizer = create_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), CFG, optimizer)
    shardings = param_sharding(mesh, state.params, shard_model_axis=True)
    params = jax.device_put(state.params, shardings)
    state = state._replace(
        params=params, opt_state=jax.device_put(state.opt_state, replicated(mesh))
    )
    batch = make_batch(np.random.RandomState(1), b=2)
    batch = Batch(*[jax.device_put(x, batch_sharding(mesh)) for x in batch])
    train_step = make_train_step(CFG, optimizer)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics.loss))
