"""Corpus importers against synthetic on-disk corpora (the reference's
import_*.py behaviors: layout discovery, transcript mapping, filtering,
deterministic splits, CSV schema)."""

import csv
import os
import shutil

import numpy as np
import pytest

from stt_tpu.data.audio import write_wav

SMOKE_FLAC = "/root/reference/data/smoke_test/LDC93S1.flac"
SMOKE_OPUS = "/root/reference/data/smoke_test/LDC93S1.opus"


def read_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    return rows


def make_wav(path, seconds=1.0, rate=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = int(seconds * rate)
    audio = (0.1 * np.sin(np.arange(n) * 0.05)).astype(np.float32)
    write_wav(path, audio, rate)


def test_import_librivox(tmp_path):
    from stt_tpu.tools.import_librivox import import_sets

    set_dir = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    set_dir.mkdir(parents=True)
    shutil.copy(SMOKE_FLAC, set_dir / "84-121123-0000.flac")
    shutil.copy(SMOKE_FLAC, set_dir / "84-121123-0001.flac")
    (set_dir / "84-121123.trans.txt").write_text(
        "84-121123-0000 GO DO YOU HEAR Café\n"
        "84-121123-0001 BUT IN LESS THAN FIVE MINUTES\n"
    )
    [csv_path] = import_sets(str(tmp_path), ["dev-clean"], base_url=None)
    rows = read_csv(csv_path)
    assert len(rows) == 2
    # diacritics folded, lowercased
    assert rows[0]["transcript"] == "go do you hear cafe"
    assert os.path.isfile(rows[0]["wav_filename"])
    assert int(rows[0]["wav_filesize"]) > 44


def test_import_aishell(tmp_path):
    from stt_tpu.tools.import_aishell import preprocess_data

    main = tmp_path / "data_aishell"
    (main / "transcript").mkdir(parents=True)
    lines = []
    for subset, n in (("train", 3), ("dev", 2), ("test", 2)):
        for i in range(n):
            utt = f"BAC009S0002W0{subset[:2]}{i}"
            make_wav(str(main / subset / "S0002" / f"{utt}.wav"),
                     seconds=12.0 if subset == "train" and i == 0 else 2.0)
            lines.append(f"{utt} 今天 天气\n")
    (main / "transcript" / "aishell_transcript_v0.8.txt").write_text(
        "".join(lines), encoding="utf-8"
    )
    csvs = preprocess_data(str(tmp_path / "missing.tgz"), str(tmp_path))
    train = read_csv(csvs[0])
    assert len(train) == 2  # the 12 s sample was trimmed
    assert len(read_csv(csvs[1])) == 2
    assert "今天" in train[0]["transcript"]


def test_import_freestmandarin_split(tmp_path):
    from stt_tpu.tools.import_freestmandarin import preprocess_data

    main = tmp_path / "ST-CMDS-20170001_1-OS"
    main.mkdir()
    for i in range(10):
        make_wav(str(main / f"20170001P{i:05d}.wav"), seconds=1.0)
        (main / f"20170001P{i:05d}.txt").write_text(
            f"句子{i}", encoding="utf-8"
        )
    csvs = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=2, n_test=2
    )
    train, dev, test = (read_csv(c) for c in csvs)
    assert (len(train), len(dev), len(test)) == (6, 2, 2)
    # deterministic: same split on re-run
    csvs2 = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=2, n_test=2
    )
    assert read_csv(csvs2[2]) == test
    all_files = {r["wav_filename"] for r in train + dev + test}
    assert len(all_files) == 10  # disjoint, complete


def test_import_primewords(tmp_path):
    import json

    from stt_tpu.tools.import_primewords import preprocess_data

    main = tmp_path / "primewords_md_2018_set1"
    entries = []
    for i in range(6):
        name = f"a{i}.wav"
        make_wav(str(main / "audio_files" / "0" / "00" / name))
        entries.append({"file": name, "text": f"文本 {i}"})
    (main / "set1_transcript.json").write_text(
        json.dumps(entries), encoding="utf-8"
    )
    csvs = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=1, n_test=1
    )
    assert [len(read_csv(c)) for c in csvs] == [4, 1, 1]


def test_import_magicdata(tmp_path):
    from stt_tpu.tools.import_magicdata import preprocess_data

    for subset in ("train", "dev", "test"):
        d = tmp_path / subset
        (d / "S01").mkdir(parents=True)
        rows = ["UtteranceID\tSpeakerID\tTranscription"]
        for i in range(3):
            name = f"{subset}_{i}.wav"
            make_wav(str(d / "S01" / name), seconds=2.0)
            text = "[FIL] 嗯" if subset == "train" and i == 0 else "好"
            rows.append(f"{name}\tS01\t{text}")
        (d / "TRANS.txt").write_text("\n".join(rows), encoding="utf-8")
    csvs = preprocess_data(str(tmp_path), str(tmp_path))
    train = read_csv(csvs[0])
    assert len(train) == 2  # noise-tagged row removed
    assert all("[FIL]" not in r["transcript"] for r in train)
    assert len(read_csv(csvs[1])) == 3


def test_import_mls_flac_and_opus(tmp_path, capsys):
    from stt_tpu.tools.import_mls import import_language

    split = tmp_path / "dev"
    audio = split / "audio" / "9" / "12"
    audio.mkdir(parents=True)
    shutil.copy(SMOKE_FLAC, audio / "9_12_000001.flac")
    shutil.copy(SMOKE_OPUS, audio / "9_12_000002.opus")
    (split / "transcripts.txt").write_text(
        "9_12_000001\tfirst utterance text\n"
        "9_12_000002\tsecond utterance text\n"
    )
    [csv_path] = import_language(str(tmp_path), "english")
    rows = read_csv(csv_path)
    assert len(rows) == 2
    assert rows[0]["wav_filename"].endswith(".wav")
    assert rows[1]["wav_filename"].endswith(".opus")
    assert "no Opus codec" in capsys.readouterr().out
