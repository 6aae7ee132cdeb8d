"""Distributed helpers (single-process degenerate paths + mesh collective
sanity on the 8-device CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stt_tpu.parallel import make_mesh
from stt_tpu.parallel.distributed import (
    allreduce_sum_across_hosts,
    host_batch_bounds,
    initialize,
    merge_wer_counters,
)


def test_initialize_single_process():
    index, count = initialize()
    assert index == 0 and count == 1


def test_host_batch_bounds():
    start, end = host_batch_bounds(64)
    assert (start, end) == (0, 64)


def test_allreduce_identity_single_host():
    v = np.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(allreduce_sum_across_hosts(v), v)


def test_merge_wer_counters():
    wer, cer = merge_wer_counters(5, 100, 20, 500)
    assert wer == 0.05 and cer == 0.04


def test_device_psum_over_mesh():
    """The on-device counter-merge pattern used for eval metrics."""
    mesh = make_mesh(8, 1)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    x = jax.device_put(
        jnp.arange(8.0), NamedSharding(mesh, P("data"))
    )
    assert float(total(x)) == 28.0


def test_shard_map_dp_step_matches_gspmd_step():
    """make_train_step_dp (explicit shard_map + pmean) must optimize the
    same way as the GSPMD auto-sharded step on the same global batch
    (dropout off so the two RNG schemes can't diverge)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stt_tpu.models import ModelConfig
    from stt_tpu.parallel import batch_sharding, make_mesh, replicated
    from stt_tpu.train import (
        Batch,
        create_train_state,
        make_train_step,
        make_train_step_dp,
    )
    from stt_tpu.train.step import create_optimizer

    mesh = make_mesh(n_data=8, n_model=1)
    cfg = ModelConfig(
        n_input=8, n_context=2, n_hidden=32, n_cell_dim=32, n_out=12,
        dropout_rates=(0.0,) * 6,
    )
    rng = np.random.RandomState(0)
    B = 16
    feats = jnp.asarray(rng.randn(B, 20, cfg.n_input).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, cfg.n_out - 1, (B, 4)), jnp.int32)
    batch = Batch(
        features=feats,
        feature_lengths=jnp.full((B,), 20, jnp.int32),
        labels=labels,
        label_lengths=jnp.full((B,), 4, jnp.int32),
    )
    opt = create_optimizer(learning_rate=1e-3)
    key = jax.random.PRNGKey(7)

    state_a = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_a = make_train_step(cfg, opt)
    state_b = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step_b = make_train_step_dp(cfg, opt, mesh)
    # shard the batch / replicate state for the shard_map step
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    batch_b = Batch(*(jax.device_put(x, bsh) for x in batch))
    state_b = jax.device_put(state_b, rep)

    losses_a, losses_b = [], []
    for _ in range(3):
        state_a, ma = step_a(state_a, batch, key)
        state_b, mb = step_b(state_b, batch_b, key)
        losses_a.append(float(ma.loss))
        losses_b.append(float(mb.loss))
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4, atol=1e-5)
    # per-example metrics keep global batch order
    np.testing.assert_allclose(
        np.asarray(ma.per_example_loss), np.asarray(mb.per_example_loss),
        rtol=1e-4, atol=1e-5,
    )
