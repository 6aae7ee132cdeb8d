"""Trainer observability: audio-s/s counter, TensorBoard summaries,
profiler traces (SURVEY §5 tracing parity)."""

import glob
import os

import pytest

SMOKE_CSV = "/root/reference/data/smoke_test/ldc93s1.csv"


@pytest.fixture()
def tiny_config(tmp_path):
    if not os.path.isfile(SMOKE_CSV):
        pytest.skip("smoke csv missing")
    from stt_tpu.config import SttConfig

    return SttConfig(
        train_files=[SMOKE_CSV],
        dev_files=[SMOKE_CSV],
        alphabet_config_path="/root/reference/data/alphabet.txt",
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_hidden=64,
        epochs=2,
        train_batch_size=1,
        dev_batch_size=1,
        dropout_rate=0.0,
        checkpoint_secs=3600,
        summary_dir=str(tmp_path / "summaries"),
        profile_dir=str(tmp_path / "profile"),
        profile_steps=1,
    )


def test_summaries_throughput_and_profile(tiny_config, capsys):
    from stt_tpu.train.trainer import train

    train(tiny_config)
    out = capsys.readouterr().out
    assert "audio-s/s" in out

    # TensorBoard event files (TF is in the build) or the JSONL fallback
    files = os.listdir(tiny_config.summary_dir)
    assert any(
        "tfevents" in name or name == "scalars.jsonl" for name in files
    ), files

    # the jax profiler trace directory was populated
    traces = glob.glob(
        os.path.join(tiny_config.profile_dir, "**", "*"), recursive=True
    )
    assert any(os.path.isfile(t) for t in traces), traces
    assert "Wrote profiler trace" in out


def test_summary_writer_jsonl_fallback(tmp_path, monkeypatch):
    import builtins

    from stt_tpu.train.trainer import _make_summary_writer

    real_import = builtins.__import__

    def no_tf(name, *args, **kwargs):
        if name == "tensorflow":
            raise ImportError("blocked for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_tf)
    writer = _make_summary_writer(str(tmp_path))
    writer(1, {"train/step_loss": 2.5})
    writer(2, {"train/step_loss": 1.5})
    lines = (tmp_path / "scalars.jsonl").read_text().splitlines()
    assert len(lines) == 2 and '"step": 1' in lines[0]


def test_no_summary_dir_is_none():
    from stt_tpu.train.trainer import _make_summary_writer

    assert _make_summary_writer("") is None
