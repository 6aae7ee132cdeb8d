"""Mesh + sharding helpers.

The parallelism design (replacing the reference's in-graph GPU towers +
CPU-resident variables, train.py:147-235 / PARALLEL_OPTIMIZATION.rst):

- Axes: ('data', 'model'). Utterance batches shard over 'data'; gradient
  reduction is XLA-inserted psum over ICI — there is no parameter server.
- Params are replicated by default (the 48M-param reference geometry fits
  easily on one chip) and shard their hidden dimension over 'model' when
  n_hidden grows past one chip's HBM (BASELINE.md scaling target).
- Multi-host: the same mesh spans hosts via jax.distributed.initialize;
  per-host input pipelines feed their local shard of the 'data' axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    used = devices[: n_data * n_model]
    arr = np.asarray(used).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, shard_model_axis: bool = False):
    """Sharding pytree for params.

    shard_model_axis=False: fully replicated (default geometry).
    shard_model_axis=True: tensor-parallel — matrices shard their output
      (last) dim over 'model', biases likewise; the LSTM kernel shards its
      4H gate dim. XLA inserts the all-gathers/reduce-scatters.
    """
    if not shard_model_axis:
        spec = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
        return spec

    n_model = mesh.shape["model"]

    def leaf_spec(path, leaf):
        return NamedSharding(mesh, model_partition_spec(leaf, n_model))

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def model_partition_spec(leaf, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one param/optimizer leaf.

    Output (last) dim of matrices and the length of vectors shard over
    'model' — but only when evenly divisible: GSPMD would silently pad
    uneven shards, while the explicit shard_map TP step (train.step
    make_train_step_tp) requires identical even layouts, and the two
    must agree so TrainStates are interchangeable. The n_out=29 logits
    layer therefore stays replicated.
    """
    if leaf.ndim == 2 and leaf.shape[1] % n_model == 0:
        return P(None, "model")
    if leaf.ndim == 1 and leaf.shape[0] % n_model == 0 and leaf.shape[0] >= n_model:
        return P("model")
    return P()
