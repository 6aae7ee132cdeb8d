"""Tooling-surface tests: importers/label validation, check_characters,
data_set_tool, compare_samples, stats, play, one-shot inference,
lm_optimizer."""

import argparse
import json
import os

import numpy as np
import pytest

SMOKE_CSV = "/root/reference/data/smoke_test/ldc93s1.csv"
SMOKE_WAV = "/root/reference/data/smoke_test/LDC93S1.wav"


def test_validate_label_eng():
    from stt_tpu.tools.importers import validate_label_eng

    assert validate_label_eng("Hello, World!") == "hello world"
    assert validate_label_eng("multi-word_label") == "multi word label"
    assert validate_label_eng("has 3 numbers") is None
    assert validate_label_eng("...") is None


def test_validate_label_locale_plugin(tmp_path):
    from stt_tpu.tools.importers import get_validate_label

    plugin = tmp_path / "my_locale.py"
    plugin.write_text("def validate_label(label):\n    return label.upper()\n")
    args = argparse.Namespace(validate_label_locale=str(plugin))
    fn = get_validate_label(args)
    assert fn("abc") == "ABC"
    args2 = argparse.Namespace(validate_label_locale=None)
    assert get_validate_label(args2)("ABC!") == "abc"


def test_check_characters(capsys):
    from stt_tpu.tools.check_characters import main

    chars = main(["-csv", SMOKE_CSV])
    assert "a" in chars and " " in chars
    out = capsys.readouterr().out
    assert "unique characters" in out


def test_data_set_tool_csv_to_sdb(tmp_path):
    from stt_tpu.tools.data_set_tool import convert
    from stt_tpu.data.sources import SDBSource

    target = str(tmp_path / "out.sdb")
    n = convert([SMOKE_CSV], target)
    assert n == 1
    src = SDBSource(target)
    [sample] = list(src)
    assert "dark suit" in sample.transcript
    assert sample.audio.shape[0] > 16000


def test_data_set_tool_sdb_to_csv(tmp_path):
    from stt_tpu.tools.data_set_tool import convert
    from stt_tpu.data.sources import CSVSource

    sdb = str(tmp_path / "mid.sdb")
    convert([SMOKE_CSV], sdb)
    csv_out = str(tmp_path / "out.csv")
    n = convert([sdb], csv_out)
    assert n == 1
    [sample] = list(CSVSource(csv_out))
    assert "dark suit" in sample.transcript


def test_compare_samples(tmp_path):
    from stt_tpu.tools.compare_samples import main

    with pytest.raises(SystemExit) as e:
        main([SMOKE_WAV, SMOKE_WAV])
    assert e.value.code == 0  # identical -> match
    with pytest.raises(SystemExit) as e:
        main([SMOKE_WAV, SMOKE_WAV, "--if-differ"])
    assert e.value.code == 1


def test_stats(capsys):
    from stt_tpu.tools.stats import main

    stats = main(["-csv", SMOKE_CSV])
    assert stats.n_samples == 1
    assert 2.0 < stats.total_seconds < 4.0


def test_play_writes_augmented_wavs(tmp_path):
    from stt_tpu.tools.play import main
    from stt_tpu.data.audio import read_wav

    out_dir = str(tmp_path / "auditions")
    written = main(
        ["--source", SMOKE_CSV, "--augment", "volume[dbfs=-10]",
         "--pipe", out_dir]
    )
    assert len(written) == 1
    audio, rate = read_wav(written[0])
    assert rate == 16000 and len(audio) > 16000


@pytest.fixture(scope="module")
def smoke_checkpoint(trained_smoke, tmp_path_factory):
    """A checkpoint directory holding the trained smoke params."""
    import jax
    import jax.numpy as jnp

    from stt_tpu.train import create_train_state
    from stt_tpu.train.checkpoints import CheckpointManager
    from stt_tpu.train.trainer import create_optimizer_with_hyperparams
    from stt_tpu.config import SttConfig

    params, config, feature_config, alphabet, audio = trained_smoke
    ckpt_dir = str(tmp_path_factory.mktemp("tool_ckpt"))
    stt_config = SttConfig(
        alphabet_config_path="/root/reference/data/alphabet.txt",
        n_hidden=100,
        checkpoint_dir=ckpt_dir,
        test_files=[SMOKE_CSV],
        test_batch_size=1,
        export_beam_width=32,
        beam_width=32,
    )
    optimizer = create_optimizer_with_hyperparams(stt_config)
    state = create_train_state(
        jax.random.PRNGKey(0), stt_config.model_config(False), optimizer
    )
    state = state._replace(params=params, step=jnp.asarray(600, jnp.int32))
    CheckpointManager(ckpt_dir).save(state, "best_dev", dev_loss=0.5)
    return stt_config


def test_training_graph_inference(smoke_checkpoint, capsys):
    from stt_tpu.training_graph_inference import do_single_file_inference

    out = do_single_file_inference(smoke_checkpoint, SMOKE_WAV)
    assert out == "she had your dark suit in greasy wash water all year"


def test_lm_optimizer(smoke_checkpoint):
    import dataclasses

    from stt_tpu.lm_optimizer import compute_lm_optimization

    scorer_path = "/root/reference/data/smoke_test/pruned_lm.scorer"
    if not os.path.isfile(scorer_path):
        pytest.skip("scorer missing")
    config = dataclasses.replace(
        smoke_checkpoint, scorer_path=scorer_path, alphabet=None
    )
    alpha, beta, metric = compute_lm_optimization(config, n_trials=4)
    assert 0 <= alpha <= 5 and 0 <= beta <= 5
    assert metric == 0.0  # overfit model: WER 0 across the board
