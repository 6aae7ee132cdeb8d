"""Worker process for tests/test_multiprocess_distributed.py.

Runs ONE member of a 2-process jax.distributed job on CPU devices
(2 local devices per process -> 4 global). Executes real stt_tpu
multi-host paths: initialize(), host_batch_bounds(), make_global_batch()
over a ('data','model') mesh, the shared train step (XLA-inserted psum
gradient reduction across processes), and merge_wer_counters().

Prints machine-checkable lines the parent asserts on:
  LOSS0 <loss after step 1>
  LOSS1 <loss after step 2>
  WER <merged wer> <merged cer>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from stt_tpu.models import ModelConfig  # noqa: E402
from stt_tpu.parallel import make_mesh  # noqa: E402
from stt_tpu.parallel.distributed import (  # noqa: E402
    host_batch_bounds,
    initialize,
    make_global_batch,
    merge_wer_counters,
)
from stt_tpu.train import Batch, create_train_state, make_train_step  # noqa: E402
from stt_tpu.train.step import create_optimizer  # noqa: E402

index, count = initialize(f"127.0.0.1:{port}", nproc, pid)
assert (index, count) == (pid, nproc), (index, count)
assert len(jax.devices()) == 2 * nproc

CFG = ModelConfig(
    n_input=8, n_context=2, n_hidden=32, n_cell_dim=32, n_out=12,
    dropout_rates=(0.0,) * 6,
)

GLOBAL_BATCH, T, L = 4, 20, 4
rng = np.random.RandomState(0)  # same seed everywhere: deterministic corpus
feats = rng.randn(GLOBAL_BATCH, T, CFG.n_input).astype(np.float32)
labels = rng.randint(0, CFG.n_out - 1, (GLOBAL_BATCH, L)).astype(np.int32)

start, end = host_batch_bounds(GLOBAL_BATCH)
assert end - start == GLOBAL_BATCH // nproc

mesh = make_mesh(2 * nproc, 1)

# Each host contributes only its own rows; params/state enter replicated.
local = {
    "features": feats[start:end],
    "feature_lengths": np.full((end - start,), T, np.int32),
    "labels": labels[start:end],
    "label_lengths": np.full((end - start,), L, np.int32),
}
gbatch = make_global_batch(local, mesh, P("data"))
batch = Batch(
    features=gbatch["features"],
    feature_lengths=gbatch["feature_lengths"],
    labels=gbatch["labels"],
    label_lengths=gbatch["label_lengths"],
)

optimizer = create_optimizer(learning_rate=1e-3)
state = create_train_state(jax.random.PRNGKey(0), CFG, optimizer)
state = jax.tree.map(
    lambda x: make_global_batch(np.asarray(x), mesh, P()), state
)

train_step = make_train_step(CFG, optimizer)
jrng = jax.random.PRNGKey(7)
with mesh:
    for i in range(2):
        state, metrics = train_step(state, batch, jrng)
        print(f"LOSS{i} {float(metrics.loss):.6f}", flush=True)

# Host-side metric merging: per-host WER counters -> corpus WER/CER.
wer, cer = merge_wer_counters(
    word_errors=2.0 + pid, n_words=50, char_errors=10.0 * (pid + 1), n_chars=200
)
print(f"WER {wer:.6f} {cer:.6f}", flush=True)
