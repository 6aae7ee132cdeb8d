"""Multi-host training through the REAL CLI entry point.

VERDICT r2 item 2: the 2-process jax.distributed gate must drive
``python -m stt_tpu.train`` itself (not a bespoke worker script) and
produce the same losses as a single-process run of the same global
batch. Two OS processes join a coordinator, each featurizes only its
row shard of the global batch (feeding row_range), assembles global
arrays over the spanning mesh, and the gradient psum crosses the
process boundary.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SMOKE_CSV = "/root/reference/data/smoke_test/ldc93s1.csv"
ALPHABET = "/root/reference/data/alphabet.txt"

LOSS_RE = re.compile(r"Epoch (\d+) \| train loss ([0-9.naninf]+)")


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_row_csv(tmp_path_factory):
    if not os.path.isfile(SMOKE_CSV):
        pytest.skip("smoke csv missing")
    lines = open(SMOKE_CSV).read().splitlines()
    # wav paths in the smoke CSV are relative to its directory; the copy
    # lives elsewhere, so absolutize them. Duplicate the single LDC93S1
    # row so a global batch of 2 exists.
    src_dir = os.path.dirname(SMOKE_CSV)
    header, row = lines[0], lines[1]
    cols = row.split(",")
    cols[0] = os.path.join(src_dir, cols[0])
    row = ",".join(cols)
    out = tmp_path_factory.mktemp("mh") / "two.csv"
    out.write_text("\n".join([header, row, row]) + "\n")
    return str(out)


def base_env(n_devices: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["STT_LOG_LEVEL"] = "1"
    return env


def train_args(csv, ckpt_dir, extra=()):
    return [
        sys.executable, "-m", "stt_tpu.train",
        "--train_files", csv,
        "--alphabet_config_path", ALPHABET,
        "--checkpoint_dir", ckpt_dir,
        "--n_hidden", "32",
        "--epochs", "2",
        "--train_batch_size", "2",
        "--dropout_rate", "0.0",
        "--learning_rate", "0.001",
        "--shuffle_batches", "false",
        "--checkpoint_secs", "3600",
        *extra,
    ]


def parse_losses(stdout: str):
    return {int(e): float(l) for e, l in LOSS_RE.findall(stdout)}


def test_multihost_train_cli_matches_single_process(two_row_csv, tmp_path):
    port = free_port()
    addr = f"127.0.0.1:{port}"
    env = base_env(1)

    procs = [
        subprocess.Popen(
            train_args(
                two_row_csv,
                str(tmp_path / "mh_ckpt"),
                extra=[
                    "--coordinator_address", addr,
                    "--num_processes", "2",
                    "--process_id", str(pid),
                ],
            ),
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    results = [p.communicate(timeout=600) + (p.returncode,) for p in procs]
    for out, err, rc in results:
        assert rc == 0, f"multi-host trainer failed:\n{out}\n{err}"
    losses = [parse_losses(out) for out, _, _ in results]
    assert 0 in losses[0] and 1 in losses[0], results[0][0]
    # replicated state stays in sync across processes
    assert losses[0] == losses[1]
    assert losses[0][1] < losses[0][0]  # it optimizes

    # single-process run of the same recipe on one device
    single = subprocess.run(
        train_args(two_row_csv, str(tmp_path / "sp_ckpt")),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert single.returncode == 0, single.stderr
    ref = parse_losses(single.stdout)
    for epoch in (0, 1):
        np.testing.assert_allclose(
            losses[0][epoch], ref[epoch], rtol=1e-4, atol=1e-5
        )

    # only the coordinator writes checkpoints
    assert (tmp_path / "mh_ckpt" / "meta.json").is_file()

    # 2-process evaluate through the real CLI: hosts split test batches,
    # corpus WER merges across processes
    eport = free_port()
    eaddr = f"127.0.0.1:{eport}"
    eprocs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "stt_tpu.evaluate",
                "--test_files", two_row_csv,
                "--alphabet_config_path", ALPHABET,
                "--load_checkpoint_dir", str(tmp_path / "mh_ckpt"),
                "--n_hidden", "32",
                "--test_batch_size", "1",
                "--export_beam_width", "16",
                "--coordinator_address", eaddr,
                "--num_processes", "2",
                "--process_id", str(pid),
            ],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    eresults = [p.communicate(timeout=600) + (p.returncode,) for p in eprocs]
    for out, err, rc in eresults:
        assert rc == 0, f"multi-host evaluate failed:\n{out}\n{err}"
    merged = re.search(
        r"All-hosts corpus .* WER: ([0-9.]+), CER: ([0-9.]+)",
        eresults[0][0],
    )
    assert merged, eresults[0][0]
