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
