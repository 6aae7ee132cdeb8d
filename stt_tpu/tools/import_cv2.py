"""Common Voice v2+ importer: converts an extracted corpus release
(clips/ + {train,dev,test}.tsv) into per-split CSVs with validated
transcripts (parity: bin/import_cv2.py).

Audio handling: Common Voice ships mp3/wav clips; both import directly
(mp3 decodes in-process via libmpg123), resampled to 16 kHz mono.

Run: python -m stt_tpu.tools.import_cv2 --audio_dir cv/clips \
       --tsv_dir cv/ --target_dir out [--validate_label_locale x.py]
"""

from __future__ import annotations

import argparse
import csv
import os

from stt_tpu.data.audio import read_wav, write_wav
from stt_tpu.tools.importers import (
    get_counter,
    get_validate_label,
    print_import_report,
)

SAMPLE_RATE = 16000
MAX_SECS = 15
SPLITS = ("train", "dev", "test")


def import_split(
    tsv_path: str, audio_dir: str, target_dir: str, validate_label
):
    counter = get_counter()
    rows = []
    wav_dir = os.path.join(target_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    with open(tsv_path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            counter["all"] += 1
            clip = row.get("path") or row.get("filename")
            sentence = row.get("sentence") or row.get("text") or ""
            label = validate_label(sentence)
            if label is None:
                counter["invalid_label"] += 1
                continue
            src = os.path.join(audio_dir, clip)
            if not os.path.isfile(src):
                counter["failed"] += 1
                continue
            try:
                from stt_tpu.data.audio import read_audio

                audio, rate = read_audio(src, desired_rate=SAMPLE_RATE)
            except Exception:
                counter["failed"] += 1
                continue
            counter["total_time"] += len(audio)
            secs = len(audio) / SAMPLE_RATE
            if secs > MAX_SECS:
                counter["too_long"] += 1
                continue
            if len(label) > secs * 20:  # ~20 chars/s upper bound
                counter["too_short"] += 1
                continue
            dst = os.path.join(
                wav_dir, os.path.splitext(os.path.basename(clip))[0] + ".wav"
            )
            write_wav(dst, audio, SAMPLE_RATE)
            counter["imported_time"] += len(audio)
            rows.append((dst, os.path.getsize(dst), label))
    split = os.path.splitext(os.path.basename(tsv_path))[0]
    csv_path = os.path.join(target_dir, f"{split}.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["wav_filename", "wav_filesize", "transcript"])
        writer.writerows(rows)
    print_import_report(counter, SAMPLE_RATE, MAX_SECS)
    print(f"Wrote {csv_path} ({len(rows)} samples)")
    return csv_path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio_dir", required=True)
    parser.add_argument("--tsv_dir", required=True)
    parser.add_argument("--target_dir", required=True)
    parser.add_argument("--validate_label_locale")
    args = parser.parse_args(argv)
    validate_label = get_validate_label(args)
    os.makedirs(args.target_dir, exist_ok=True)
    for split in SPLITS:
        tsv = os.path.join(args.tsv_dir, f"{split}.tsv")
        if os.path.isfile(tsv):
            import_split(tsv, args.audio_dir, args.target_dir, validate_label)


if __name__ == "__main__":
    main()
