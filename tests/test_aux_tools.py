"""Aux eval tools + importer scripts."""

import csv
import os

import numpy as np
import pytest

from conftest import SMOKE_TRANSCRIPT

SMOKE_DIR = "/root/reference/data/smoke_test"


def test_import_ldc93s1(tmp_path):
    from stt_tpu.tools.import_ldc93s1 import import_ldc93s1
    from stt_tpu.data.sources import CSVSource

    csv_path = import_ldc93s1(str(tmp_path), source_dir=SMOKE_DIR)
    [sample] = list(CSVSource(csv_path))
    assert sample.transcript == SMOKE_TRANSCRIPT
    assert sample.rate == 16000


def test_import_cv2(tmp_path):
    from stt_tpu.tools.import_cv2 import import_split
    from stt_tpu.tools.importers import validate_label_eng
    from stt_tpu.data.audio import write_wav

    clips = tmp_path / "clips"
    clips.mkdir()
    rng = np.random.RandomState(0)
    write_wav(str(clips / "a.wav"), rng.randn(16000).astype(np.float32) * 0.1)
    write_wav(str(clips / "b.wav"), rng.randn(8000).astype(np.float32) * 0.1)
    tsv = tmp_path / "train.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["path", "sentence"])
        w.writerow(["a.wav", "Hello there!"])
        w.writerow(["b.wav", "Num83r5 are invalid"])
        w.writerow(["missing.wav", "gone"])
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "out"), validate_label_eng
    )
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1
    assert rows[0]["transcript"] == "hello there"


def test_evaluate_from_csv(tmp_path, capsys):
    from stt_tpu.evaluate_from_csv import evaluate_from_csv

    ref = tmp_path / "ref.csv"
    hyp = tmp_path / "hyp.csv"
    for path, text in ((ref, "hello world"), (hyp, "hello word")):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["wav_filename", "transcript"])
            w.writerow(["x.wav", text])
    [result] = evaluate_from_csv(str(ref), str(hyp))
    assert result.wer == 0.5


def test_evaluate_export(trained_smoke, tmp_path):
    from stt_tpu.artifact import build_metadata, save_artifact
    from stt_tpu.evaluate_export import evaluate_export

    params, config, feature_config, alphabet, audio = trained_smoke
    meta = build_metadata(config, feature_config, alphabet, beam_width=32)
    model_dir = save_artifact(str(tmp_path / "model"), params, meta, alphabet)
    results = evaluate_export(
        model_dir, os.path.join(SMOKE_DIR, "ldc93s1.csv")
    )
    assert results[0].wer == 0.0
    assert results[0].res == SMOKE_TRANSCRIPT
