"""The pjit train/eval steps.

Replaces the reference's tower loop + CPU gradient averaging
(train.py:147-235): here the whole step is one jit-compiled SPMD program
over the ('data', 'model') mesh — the batch shards over 'data', gradients
are reduced by XLA collectives over ICI, optimizer state lives with the
params.

Non-finite handling mirrors train.py:100-102: per-example CTC losses that
come back inf/nan are masked out of the mean and reported in the step
metrics so the caller can name the offending files.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from stt_tpu.ctc import ctc_loss
from stt_tpu.models import ModelConfig, apply_model
from stt_tpu.models.deepspeech import Params, init_params


class Batch(NamedTuple):
    """One padded utterance batch (device layout: batch axis shards over
    the mesh 'data' axis)."""

    features: jax.Array  # [B, T, n_input] float32
    feature_lengths: jax.Array  # [B] int32
    labels: jax.Array  # [B, L] int32
    label_lengths: jax.Array  # [B] int32


class TrainState(NamedTuple):
    step: jax.Array
    params: Params
    opt_state: optax.OptState


class StepMetrics(NamedTuple):
    loss: jax.Array  # mean finite loss
    per_example_loss: jax.Array  # [B]
    non_finite: jax.Array  # [B] bool — inf/nan loss (bad sample / length)
    grad_norm: jax.Array


def create_optimizer(
    learning_rate=0.001, beta1=0.9, beta2=0.999, epsilon=1e-8
) -> optax.GradientTransformation:
    """Adam with the reference's defaults (train.py:120-133,
    util/config.py epsilon/beta flags)."""
    return optax.adam(learning_rate, b1=beta1, b2=beta2, eps=epsilon)


def create_train_state(
    rng: jax.Array,
    config: ModelConfig,
    optimizer: optax.GradientTransformation,
    params: Optional[Params] = None,
) -> TrainState:
    if params is None:
        params = init_params(rng, config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def _loss_fn(params, batch: Batch, dropout_rng, config: ModelConfig):
    logits, _ = apply_model(
        params,
        batch.features,
        seq_len=batch.feature_lengths,
        config=config,
        dropout_rng=dropout_rng,
    )
    losses = ctc_loss(
        logits, batch.feature_lengths, batch.labels, batch.label_lengths
    )
    finite = jnp.isfinite(losses)
    n_finite = jnp.maximum(jnp.sum(finite), 1)
    mean_loss = jnp.sum(jnp.where(finite, losses, 0.0)) / n_finite
    return mean_loss, (losses, finite)


def make_train_step(config: ModelConfig, optimizer: optax.GradientTransformation):
    """Returns train_step(state, batch, rng) -> (state, StepMetrics).

    Jit with donate_argnums=(0,) so params/opt state update in place on
    device; under a mesh, pass sharded TrainState/Batch and XLA handles
    the gradient psum.
    """

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (losses, finite)), grads = grad_fn(
            state.params, batch, dropout_rng, config
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, StepMetrics(loss, losses, ~finite, grad_norm)

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_step_audio(
    config: ModelConfig,
    optimizer: optax.GradientTransformation,
    feature_config,
):
    """Train step over RAW-AUDIO batches (feeding's device_featurize
    mode): the MFCC frontend runs ON DEVICE inside the jitted step, so
    host input work is wav decode + padding. batch.features is
    [B, samples]; batch.feature_lengths counts true frames. This is how
    the input pipeline keeps the chip fed at train_step rates — host
    featurization on a 2-core machine caps at ~1.7k audio-s/s while the
    step runs ~7.7k (bench.py)."""
    from stt_tpu.frontend import audio_to_mfcc

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        feats = audio_to_mfcc(batch.features, feature_config)
        fb = Batch(
            features=feats,
            feature_lengths=batch.feature_lengths,
            labels=batch.labels,
            label_lengths=batch.label_lengths,
        )
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (losses, finite)), grads = grad_fn(
            state.params, fb, dropout_rng, config
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, StepMetrics(loss, losses, ~finite, grad_norm)

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(config: ModelConfig):
    """eval_step(params, batch) -> (per-example loss [B], logits [B,T,C])."""

    def eval_step(params, batch: Batch):
        logits, _ = apply_model(
            params, batch.features, seq_len=batch.feature_lengths, config=config
        )
        losses = ctc_loss(
            logits, batch.feature_lengths, batch.labels, batch.label_lengths
        )
        return losses, logits

    return jax.jit(eval_step)


def make_train_step_dp(
    config: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh,
):
    """Explicit data-parallel train step as a shard_map over the mesh's
    'data' axis.

    Differences from make_train_step (GSPMD auto-sharding):
    - each device traces a plain single-device program over its local
      batch shard, so the fused Pallas LSTM kernels engage on multi-chip
      meshes (pallas_call has no GSPMD partitioning rule);
    - gradients are pmean'ed over 'data' explicitly — the TPU-native
      version of the reference's tower-gradient mean (train.py:201-235),
      riding ICI instead of a CPU parameter server;
    - the loss is the mean of per-shard means (tower semantics). Dropout
      folds in the device's axis index so shards draw independent masks.

    Use when the mesh is pure data-parallel; tensor parallelism ('model'
    axis sharding) stays on the GSPMD step.
    """
    import dataclasses as _dataclasses

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    local_config = _dataclasses.replace(config, force_fused=True)

    def local_step(state: TrainState, batch: Batch, rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index("data")
        )
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, (losses, finite)), grads = grad_fn(
            state.params, batch, dropout_rng, local_config
        )
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, StepMetrics(loss, losses, ~finite, grad_norm)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(
            P(),
            StepMetrics(P(), P("data"), P("data"), P()),
        ),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_train_step_tp(
    config: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh,
):
    """Explicit tensor+data-parallel train step as a shard_map over the
    full ('data', 'model') mesh, with the fused Pallas LSTM kernels
    engaged per model shard (stt_tpu.parallel.tp).

    Param/optimizer leaves shard per parallel.mesh.model_partition_spec
    (matrices split their output dim over 'model'; the TrainState layout
    is identical to the GSPMD step under param_sharding, so the two
    steps are interchangeable mid-training). Inside the region each
    device holds local shards; apply_model_tp inserts the collectives:
    column-parallel projections, and the recurrence batch-resharded by
    one all_to_all so the fused kernel runs full-width on B/K utterances
    instead of paying a per-timestep h all_gather.

    Gradients of sharded leaves arrive local via the collective
    transposes; pmean over 'data' matches make_train_step_dp's tower
    semantics. Equality with the GSPMD TP step is gated on the CPU mesh
    in tests/test_sharding.py.
    """
    import dataclasses as _dataclasses

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from stt_tpu.parallel.mesh import model_partition_spec
    from stt_tpu.parallel.tp import apply_model_tp

    n_model = mesh.shape["model"]
    local_config = _dataclasses.replace(config, force_fused=True)

    def _pspec_tree(tree):
        return jax.tree.map(
            lambda leaf: model_partition_spec(leaf, n_model), tree
        )

    def bind(state_like: TrainState):
        """The in/out specs depend on leaf shapes; bind once per state
        structure (the trainer calls this with a concrete or abstract
        TrainState whose leaves carry the FULL shapes)."""
        specs = TrainState(
            step=P(),
            params=_pspec_tree(state_like.params),
            opt_state=_pspec_tree(state_like.opt_state),
        )
        # grad-norm bookkeeping below classifies leaves by the full-shape
        # layout, not local shard shapes (uneven-but-divisible edge cases)
        param_sharded_flags = jax.tree.map(
            lambda spec: any(ax is not None for ax in spec), specs.params
        )
        # The replicated-leaf grad treatment below is exact only when
        # every replicated matrix does a full-width matmul — true for
        # the n_out logits layer, but NOT for a hidden layer that fails
        # the divisibility gate while downstream layers shard: each
        # shard's local cotangent would then be a partial sum that
        # out_specs silently takes one copy of. Refuse that geometry.
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            state_like.params
        )[0]:
            if (
                getattr(leaf, "ndim", 0) == 2
                and leaf.shape[1] != local_config.n_out
                and leaf.shape[1] % n_model
            ):
                raise ValueError(
                    f"make_train_step_tp: hidden matrix {path} with "
                    f"output dim {leaf.shape[1]} is not divisible by "
                    f"n_model={n_model}; it would replicate between "
                    f"sharded layers and its gradient would be a "
                    f"partial sum. Use a divisible width or fewer "
                    f"model shards."
                )

        def local_step(state: TrainState, batch: Batch, rng: jax.Array):
            dropout_rng = jax.random.fold_in(rng, state.step)
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index("data")
            )

            def loss_fn(params):
                logits, _ = apply_model_tp(
                    params,
                    batch.features,
                    seq_len=batch.feature_lengths,
                    config=local_config,
                    dropout_rng=dropout_rng,
                )
                losses = ctc_loss(
                    logits, batch.feature_lengths, batch.labels,
                    batch.label_lengths,
                )
                finite = jnp.isfinite(losses)
                n_finite = jnp.maximum(jnp.sum(finite), 1)
                mean_loss = jnp.sum(jnp.where(finite, losses, 0.0)) / n_finite
                return mean_loss, (losses, finite)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (losses, finite)), grads = grad_fn(state.params)
            # Every model shard computes the (replicated) loss, so the
            # all_gather transposes deliver K identical cotangent copies
            # into each SHARDED leaf (psum over 'model') — exactly K x
            # the true gradient; replicated leaves get only their local
            # (already exact) gradient. Rescale the sharded ones.
            grads = jax.tree.map(
                lambda g, is_sharded: g / n_model if is_sharded else g,
                grads, param_sharded_flags,
            )
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            # norm over the distributed grad tree: sharded leaves
            # contribute their local square-sum once per model shard
            # (psum over 'model'), replicated leaves are identical across
            # 'model' (count once)
            sq_sharded = jnp.float32(0.0)
            sq_repl = jnp.float32(0.0)
            for leaf, is_sharded in zip(
                jax.tree.leaves(grads), jax.tree.leaves(param_sharded_flags)
            ):
                s = jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                if is_sharded:
                    sq_sharded = sq_sharded + s
                else:
                    sq_repl = sq_repl + s
            grad_norm = jnp.sqrt(
                jax.lax.psum(sq_sharded, "model") + sq_repl
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(state.step + 1, params, opt_state)
            return new_state, StepMetrics(loss, losses, ~finite, grad_norm)

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs, P("data"), P()),
            out_specs=(
                specs,
                StepMetrics(P(), P("data"), P("data"), P()),
            ),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    return bind
