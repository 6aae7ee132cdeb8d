"""wav2vec2-AM evaluation path: config/vocab loading, precomputed
emissions, scorer-driven ignored symbols, WER report, LM search
(evaluate_wav2vec2am + lm_optimize_wav2vec2am parity)."""

import csv
import json
import os

import numpy as np
import pytest

SMOKE_WAV = "/root/reference/data/smoke_test/LDC93S1.wav"
SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"
ALPHABET_TXT = "/root/reference/data/alphabet.txt"

# AM layout mirroring wav2vec2 fine-tuned checkpoints
AM_LABELS = ["<pad>", "<s>", "</s>", "<unk>", "|"] + list(
    "abcdefghijklmnopqrstuvwxyz'"
)


def am_index(ch):
    return AM_LABELS.index("|" if ch == " " else ch)


def write_am_dir(tmp_path, via_vocab_json=False):
    model_dir = tmp_path / "am"
    model_dir.mkdir()
    if via_vocab_json:
        (model_dir / "config.json").write_text(json.dumps({"pad_token_id": 0}))
        vocab = {("|" if l == "|" else l): i for i, l in enumerate(AM_LABELS)}
        (model_dir / "vocab.json").write_text(json.dumps(vocab))
    else:
        labels = [" " if l == "|" else l for l in AM_LABELS]
        (model_dir / "config.json").write_text(
            json.dumps(
                {
                    "alphabet_labels": labels,
                    "blank_id": 0,
                    "ignored_symbols": [1, 2, 3],
                }
            )
        )
    return str(model_dir)


def write_fixture(tmp_path, text="she had your dark suit"):
    emissions_dir = tmp_path / "emissions"
    emissions_dir.mkdir()
    # one-hot frame per char with blank separators for repeats
    frames = []
    for ch in text:
        frames.append(am_index(ch))
        frames.append(0)
    probs = np.full((len(frames), len(AM_LABELS)), 1e-7, np.float32)
    for t, k in enumerate(frames):
        probs[t, k] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    np.save(emissions_dir / "LDC93S1.npy", np.log(probs))

    csv_path = tmp_path / "test.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wav_filename", "wav_filesize", "transcript"])
        w.writerow([SMOKE_WAV, os.path.getsize(SMOKE_WAV), text])
    return str(emissions_dir), str(csv_path)


@pytest.mark.parametrize("via_vocab_json", [False, True])
def test_eval_precomputed_emissions(tmp_path, via_vocab_json):
    from stt_tpu.evaluate_wav2vec2am import evaluate_wav2vec2am

    model_dir = write_am_dir(tmp_path, via_vocab_json)
    emissions_dir, csv_path = write_fixture(tmp_path)
    results = evaluate_wav2vec2am(
        [csv_path], model_dir, emissions_dir=emissions_dir, beam_width=16
    )
    assert len(results) == 1
    assert results[0].res == "she had your dark suit"
    assert results[0].wer == 0.0


def test_eval_with_scorer_ignores_oov_labels(tmp_path):
    from stt_tpu.evaluate_wav2vec2am import (
        build_decode_inputs,
        evaluate_wav2vec2am,
    )

    model_dir = write_am_dir(tmp_path)
    emissions_dir, csv_path = write_fixture(tmp_path)
    _, _, scorer, ignored, blank_id = build_decode_inputs(
        model_dir, SCORER, ALPHABET_TXT
    )
    # the special tokens are not in the scorer alphabet -> auto-ignored
    assert {1, 2, 3}.issubset(ignored)
    assert blank_id == 0

    results = evaluate_wav2vec2am(
        [csv_path], model_dir, emissions_dir=emissions_dir,
        scorer_path=SCORER, scorer_alphabet_path=ALPHABET_TXT,
        beam_width=32,
    )
    assert results[0].res == "she had your dark suit"


def test_lm_optimization_runs(tmp_path, capsys):
    from stt_tpu.evaluate_wav2vec2am import compute_lm_optimization_wav2vec2am

    model_dir = write_am_dir(tmp_path)
    emissions_dir, csv_path = write_fixture(tmp_path)
    alpha, beta, wer = compute_lm_optimization_wav2vec2am(
        [csv_path], model_dir, SCORER, ALPHABET_TXT,
        emissions_dir=emissions_dir, beam_width=16, n_trials=3,
    )
    assert wer == 0.0  # emissions are unambiguous at any (alpha, beta)
    assert 0 <= alpha and 0 <= beta


def test_rms_normalize():
    from stt_tpu.evaluate_wav2vec2am import rms_normalize

    wav = np.sin(np.arange(16000) * 0.1).astype(np.float32)
    out = rms_normalize(wav, db_level=-27.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(out**2)))
    assert rms_db == pytest.approx(-27.0, abs=0.1)
    assert np.all(rms_normalize(np.zeros(10)) == 0)
