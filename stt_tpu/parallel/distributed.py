"""Multi-host training/serving support.

The reference is strictly single-host (SURVEY.md §2.5: in-graph GPU
towers, no NCCL/MPI anywhere); this framework scales across hosts the
JAX-native way:

- `initialize()` wraps jax.distributed.initialize; afterwards
  jax.devices() spans the slice/pod and the same ('data','model') mesh
  programs run unchanged — XLA routes gradient psums over ICI within a
  slice and DCN across slices.
- each host feeds only its own shard of the batch
  (`host_batch_bounds`), assembled into the global array with
  `make_global_batch`.
- host-side scalar statistics (WER counters, losses) merge with
  `allreduce_sum_across_hosts`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime (no-op when single-process). Returns
    (process_index, process_count)."""
    if num_processes is not None and num_processes > 1:
        # CPU backends need an explicit cross-process collectives impl
        # (tests exercise the multi-host path on CPU devices); TPU ICI/DCN
        # needs nothing extra. Must run before the backend initializes.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_batch_bounds(global_batch_size: int) -> Tuple[int, int]:
    """[start, end) rows of the global batch this host must produce."""
    n_hosts = jax.process_count()
    per_host = global_batch_size // n_hosts
    start = jax.process_index() * per_host
    return start, start + per_host


def make_global_batch(local_arrays, mesh, pspec):
    """Assemble per-host shards into global jax.Arrays over the mesh.

    local_arrays: pytree of numpy arrays holding THIS host's batch rows.
    """
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, pspec
        ),
        local_arrays,
    )


def agree_global_padding(features, labels, pad_info=None):
    """Re-pad this host's batch shard so every host's arrays share the
    global (max) time/label dims — a requirement of
    host_local_array_to_global_array. One tiny allgather of two ints per
    batch; the padding rows are masked by the length arrays exactly like
    single-host padding. Returns (features, labels)."""
    from jax.experimental import multihost_utils

    local = np.asarray([features.shape[1], labels.shape[1]], np.int32)
    gathered = multihost_utils.process_allgather(local)
    t_max, l_max = int(gathered[:, 0].max()), int(gathered[:, 1].max())
    if t_max > features.shape[1]:
        pad = np.zeros(
            (features.shape[0], t_max - features.shape[1], features.shape[2]),
            features.dtype,
        )
        features = np.concatenate([features, pad], axis=1)
    if l_max > labels.shape[1]:
        pad = np.zeros(
            (labels.shape[0], l_max - labels.shape[1]), labels.dtype
        )
        labels = np.concatenate([labels, pad], axis=1)
    return features, labels


def local_rows(array) -> np.ndarray:
    """This host's rows of a batch-sharded global jax.Array (np.asarray
    would fail on non-addressable multi-host arrays). Rows come back in
    global row order restricted to this host."""
    try:
        return np.asarray(array)
    except Exception:
        shards = sorted(
            array.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if s.index else 0,
        )
        seen = set()
        parts = []
        for s in shards:
            key = s.index[0].start if s.index else None
            if key in seen:
                continue  # replicated over a second mesh axis
            seen.add(key)
            parts.append(np.asarray(s.data))
        return np.concatenate(parts)


def allreduce_sum_across_hosts(values: np.ndarray) -> np.ndarray:
    """Sum host-side statistics (WER error/word counters, loss sums)
    across processes. Single-process: identity."""
    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(values))
    return np.sum(gathered, axis=0)


def merge_wer_counters(
    word_errors: float, n_words: int, char_errors: float, n_chars: int
) -> Tuple[float, float]:
    """Cross-host corpus WER/CER from per-host edit-distance counters."""
    sums = allreduce_sum_across_hosts(
        np.asarray([word_errors, n_words, char_errors, n_chars], np.float64)
    )
    return (
        float(sums[0] / max(sums[1], 1.0)),
        float(sums[2] / max(sums[3], 1.0)),
    )
