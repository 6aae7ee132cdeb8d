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


def _tp_state(optimizer, mesh):
    from stt_tpu.parallel import param_sharding
    from stt_tpu.parallel.mesh import model_partition_spec
    from jax.sharding import NamedSharding

    state = create_train_state(jax.random.PRNGKey(0), CFG, optimizer)
    pshard = param_sharding(mesh, state.params, shard_model_axis=True)
    n_model = mesh.shape["model"]
    oshard = jax.tree.map(
        lambda leaf: NamedSharding(mesh, model_partition_spec(leaf, n_model)),
        state.opt_state,
    )
    return state._replace(
        params=jax.device_put(state.params, pshard),
        opt_state=jax.device_put(state.opt_state, oshard),
        step=jax.device_put(state.step, replicated(mesh)),
    )


def test_tp_shard_map_matches_gspmd():
    """The fused-kernel-capable shard_map TP step (column-parallel
    projections + batch-resharded recurrence via all_to_all) computes
    the same training trajectory as the GSPMD auto-sharded step on the
    identical param layout. Bitwise equality is not attainable — the
    two programs reduce the split matmuls in different (equally valid)
    orders — so the gate is float-level closeness over multiple steps."""
    from stt_tpu.train import make_train_step_tp

    mesh = make_mesh(4, 2)
    optimizer = create_optimizer()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, b=8)
    sharded_batch = Batch(
        *[jax.device_put(x, batch_sharding(mesh)) for x in batch]
    )
    jrng = jax.random.PRNGKey(7)

    g_state = _tp_state(optimizer, mesh)
    g_step = make_train_step(CFG, optimizer)
    t_state = _tp_state(optimizer, mesh)
    t_step = make_train_step_tp(CFG, optimizer, mesh)(t_state)

    for _ in range(3):
        g_state, gm = g_step(g_state, sharded_batch, jrng)
        t_state, tm = t_step(t_state, sharded_batch, jrng)

    np.testing.assert_allclose(float(gm.loss), float(tm.loss), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gm.per_example_loss), np.asarray(tm.per_example_loss),
        rtol=2e-5, atol=2e-5,
    )
    for a, b in zip(
        jax.tree.leaves(g_state.params), jax.tree.leaves(t_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )
    # grad_norm assembled from distributed shards matches the GSPMD norm
    np.testing.assert_allclose(
        float(gm.grad_norm), float(tm.grad_norm), rtol=1e-4
    )


def test_tp_fused_recurrence_branch_executes(monkeypatch):
    """The fused Pallas recurrence branch of _lstm_tp (the one real
    multi-chip TPUs take) actually EXECUTES here, via Mosaic interpret
    mode on the CPU mesh (STT_TPU_TP_FUSED=1), and matches the
    _recurrence_scan twin the other tests exercise — both forward and
    through the custom_vjp backward."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from stt_tpu.models import init_params
    from stt_tpu.parallel.mesh import model_partition_spec
    from stt_tpu.parallel.tp import apply_model_tp

    # fused geometry gate: n_cell % 128 == 0 and per-shard batch % 8 == 0
    cfg = ModelConfig(
        n_input=8, n_context=2, n_hidden=32, n_cell_dim=128, n_out=12,
        dropout_rates=(0.0,) * 6,
    )
    mesh = make_mesh(2, 2)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(2)
    b, t = 32, 10  # per-data-shard 16, per-model-shard recurrence batch 8
    feats = jnp.asarray(rng.randn(b, t, cfg.n_input), np.float32)
    seq = jnp.asarray([t, t - 3] * (b // 2), jnp.int32)

    pspecs = jax.tree.map(lambda l: model_partition_spec(l, 2), params)

    def fwd_loss(p, f, s):
        logits, state = apply_model_tp(p, f, seq_len=s, config=cfg)
        return jnp.sum(logits * logits) * 1e-3, (logits, state)

    def run():
        tp = shard_map(
            lambda p, f, s: jax.value_and_grad(fwd_loss, has_aux=True)(
                p, f, s
            ),
            mesh=mesh,
            in_specs=(pspecs, P("data"), P("data")),
            out_specs=(
                (P(), (P("data"), (P("data"), P("data")))),
                pspecs,
            ),
            check_vma=False,
        )
        return jax.jit(tp)(params, feats, seq)

    (loss_s, (logits_s, state_s)), grads_s = run()
    monkeypatch.setenv("STT_TPU_TP_FUSED", "1")
    (loss_f, (logits_f, state_f)), grads_f = run()

    np.testing.assert_allclose(
        np.asarray(logits_s), np.asarray(logits_f), rtol=1e-5, atol=1e-5
    )
    for a, b_ in zip(state_s, state_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(float(loss_s), float(loss_f), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(grads_s), jax.tree.leaves(grads_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_tp_forward_matches_reference_forward():
    """apply_model_tp on local shards == apply_model on full params."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from stt_tpu.models import apply_model, init_params
    from stt_tpu.parallel.mesh import model_partition_spec
    from stt_tpu.parallel.tp import apply_model_tp

    mesh = make_mesh(2, 4)
    params = init_params(jax.random.PRNGKey(3), CFG)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(4, 16, CFG.n_input), np.float32)
    seq = jnp.asarray([16, 12, 9, 16], jnp.int32)

    ref_logits, ref_state = jax.jit(
        lambda p, f, s: apply_model(p, f, seq_len=s, config=CFG)
    )(params, feats, seq)

    pspecs = jax.tree.map(lambda l: model_partition_spec(l, 4), params)
    tp = shard_map(
        lambda p, f, s: apply_model_tp(p, f, seq_len=s, config=CFG),
        mesh=mesh,
        in_specs=(pspecs, P("data"), P("data")),
        out_specs=(P("data"), (P("data"), P("data"))),
        check_vma=False,
    )
    tp_logits, tp_state = jax.jit(tp)(params, feats, seq)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(tp_logits), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(ref_state, tp_state):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
