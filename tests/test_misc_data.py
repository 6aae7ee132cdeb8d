"""STM parser, auto-input splitting, model card."""

import csv
import os

import numpy as np
import pytest

from stt_tpu.data.auto_input import (
    create_alphabet_from_sources,
    create_datasets_from_auto_input,
)
from stt_tpu.data.stm import parse_stm_file, parse_stm_line


def test_stm_parsing(tmp_path):
    stm = tmp_path / "talk.stm"
    stm.write_text(
        ";; header comment\n"
        "talk1 1 spk1 17.21 24.01 <o,f0,male> hello world again\n"
        "talk1 1 spk1 25.0 26.0 <o,f0,male> ignore_time_segment_in_scoring\n"
        "talk1 1 spk2 30.5 33.9 <o,f0,male> more text <unk> here\n"
    )
    segments = parse_stm_file(str(stm))
    assert len(segments) == 2
    assert segments[0].transcript == "hello world again"
    assert segments[0].start_time == 17.21
    assert segments[1].transcript == "more text here"


def test_auto_input_split(tmp_path):
    path = tmp_path / "all.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wav_filename", "wav_filesize", "transcript"])
        for i in range(100):
            w.writerow([f"f{i}.wav", 1000 + i, f"text {i}"])
    train, dev, test = create_datasets_from_auto_input(str(path))
    rows = lambda p: list(csv.DictReader(open(p)))
    n_train, n_dev, n_test = len(rows(train)), len(rows(dev)), len(rows(test))
    assert n_train + n_dev + n_test == 100
    assert n_dev == n_test > 0
    assert n_train > n_dev
    # no overlap
    names = lambda p: {r["wav_filename"] for r in rows(p)}
    assert not (names(train) & names(dev))
    assert not (names(dev) & names(test))


def test_auto_alphabet(tmp_path):
    path = tmp_path / "x.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wav_filename", "transcript"])
        w.writerow(["a.wav", "abc cba"])
    out = create_alphabet_from_sources([str(path)], str(tmp_path / "alpha.txt"))
    from stt_tpu.alphabet import Alphabet

    a = Alphabet(out)
    assert set(a.labels) == {" ", "a", "b", "c"}


def test_model_card(tmp_path):
    from stt_tpu.config import SttConfig
    from stt_tpu.export import write_model_card

    config = SttConfig(export_model_name="demo", export_language="en")
    metadata = {
        "framework_version": "0.1.0", "graph_version": 6, "n_hidden": 100,
        "n_out": 29, "sample_rate": 16000, "feature_win_len_ms": 32,
        "feature_win_step_ms": 20, "n_mfcc": 26, "beam_width": 500,
        "lm_alpha": 0.9, "lm_beta": 1.1,
    }
    path = write_model_card(config, metadata, str(tmp_path))
    text = open(path).read()
    assert "demo" in text and "n_hidden: 100" in text
