"""Batch multi-file transcription with VAD segmentation.

Parity surface: transcribe.py (resolve file/.catalog/dir sources
:224-260, per-file VAD split + batched inference + beam decode, .tlog
JSON output :83-133). The reference forks one process per GPU; here a
single SPMD program handles the batch dimension, so the pool is only
needed for host-side decode fan-out.

Run: python -m stt_tpu.transcribe --src audio.wav --dst out.tlog \
       --model_dir exported_model [--scorer_path ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import List, Optional

import numpy as np

import jax

from stt_tpu.config import log_error, log_info
from stt_tpu.data.audio import read_wav
from stt_tpu.data.vad import split_audio_file
from stt_tpu.decode import ctc_beam_search_decoder_batch
from stt_tpu.frontend import audio_to_mfcc_numpy


def transcribe_file(
    model,
    audio_path: str,
    scorer=None,
    batch_size: int = 8,
    aggressiveness: int = 3,
    beam_width: int = 500,
    vad_classifier: str = "energy",
) -> List[dict]:
    """One audio file -> list of {start, end, transcript} segments."""
    audio, rate = read_wav(audio_path, desired_rate=model.sample_rate())
    fc = model.feature_config
    segments_out = []
    for batch in split_audio_file(
        audio, rate, batch_size=batch_size, aggressiveness=aggressiveness,
        classifier=vad_classifier,
    ):
        feats = [audio_to_mfcc_numpy(seg, fc) for _, _, seg in batch]
        t_max = max(f.shape[0] for f in feats)
        padded = np.zeros((len(feats), max(t_max, 1), fc.n_mfcc), np.float32)
        lengths = np.zeros((len(feats),), np.int32)
        for i, f in enumerate(feats):
            padded[i, : f.shape[0]] = f
            lengths[i] = f.shape[0]
        logits = model.infer_logits(padded, lengths)
        probs = jax.nn.softmax(logits, axis=-1)  # stays on device
        # emission pruning on device; beam (+ LM) on the host — the
        # full on-device scan stays opt-in (see config.device_decode)
        from stt_tpu.decode.device import (
            ctc_beam_search_decoder_batch_pruned,
        )

        decoded = ctc_beam_search_decoder_batch_pruned(
            probs,
            lengths.tolist(),
            model.alphabet,
            beam_size=beam_width,
            num_processes=batch_size,
            scorer=scorer,
        )
        for (start, end, _), results in zip(batch, decoded):
            segments_out.append(
                {
                    "start": start,
                    "end": end,
                    "transcript": results[0].transcript,
                }
            )
    segments_out.sort(key=lambda s: s["start"])
    return segments_out


def resolve_sources(src: str) -> List[str]:
    """file | .catalog (JSON list of paths) | directory (transcribe.py:224-260)."""
    if os.path.isdir(src):
        return sorted(glob.glob(os.path.join(src, "**", "*.wav"), recursive=True))
    if src.endswith(".catalog"):
        with open(src) as f:
            catalog = json.load(f)
        base = os.path.dirname(os.path.abspath(src))
        out = []
        for entry in catalog:
            path = entry["audio"] if isinstance(entry, dict) else entry
            if not os.path.isabs(path):
                path = os.path.join(base, path)
            out.append(path)
        return out
    return [src]


def main(argv=None):
    parser = argparse.ArgumentParser(prog="stt_tpu.transcribe")
    parser.add_argument("--src", required=True,
                        help="audio file, .catalog file, or directory")
    parser.add_argument("--dst", default="",
                        help="output .tlog path (single-file mode)")
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--scorer_path", default="")
    parser.add_argument("--lm_alpha", type=float, default=None)
    parser.add_argument("--lm_beta", type=float, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--beam_width", type=int, default=500)
    parser.add_argument("--vad_aggressiveness", type=int, default=3)
    parser.add_argument(
        "--vad_classifier", default="energy", choices=("energy", "gmm"),
        help="frame classifier: 'energy' (stationary floors) or 'gmm' "
             "(webrtcvad-class adaptive sub-band GMM; tracks moving "
             "noise floors)",
    )
    parser.add_argument("--force", action="store_true")
    # multi-host: files shard round-robin across processes (the
    # reference ran one transcription process per GPU, transcribe.py:40)
    parser.add_argument("--coordinator_address", default="")
    parser.add_argument("--num_processes", type=int, default=0)
    parser.add_argument("--process_id", type=int, default=-1)
    args = parser.parse_args(argv)

    proc_id, proc_count = 0, 1
    if args.num_processes and args.num_processes > 1:
        from stt_tpu.config import SttConfig, maybe_initialize_distributed

        maybe_initialize_distributed(
            SttConfig(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        )
        import jax

        proc_id, proc_count = jax.process_index(), jax.process_count()

    from stt_tpu.serve import Model

    model = Model(args.model_dir)
    scorer = None
    if args.scorer_path:
        from stt_tpu.decode.scorer_package import KenLMScorer

        scorer = KenLMScorer(args.scorer_path, alpha=args.lm_alpha, beta=args.lm_beta)

    sources = resolve_sources(args.src)
    if proc_count > 1:
        sources = sources[proc_id::proc_count]
    for path in sources:
        tlog = args.dst if (args.dst and len(sources) == 1) else (
            os.path.splitext(path)[0] + ".tlog"
        )
        if os.path.exists(tlog) and not args.force:
            log_error(f"{tlog} exists — use --force to overwrite")
            continue
        segments = transcribe_file(
            model,
            path,
            scorer=scorer,
            batch_size=args.batch_size,
            aggressiveness=args.vad_aggressiveness,
            vad_classifier=args.vad_classifier,
            beam_width=args.beam_width,
        )
        with open(tlog, "w") as f:
            json.dump(segments, f, indent=2)
        log_info(f"{path}: {len(segments)} segments -> {tlog}")


if __name__ == "__main__":
    main()
