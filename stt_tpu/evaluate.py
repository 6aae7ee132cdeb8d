"""Test-set evaluation: logits + loss on device, beam decode on device
(no-LM) or via device-pruned emissions into the host decoder (scorer),
WER/CER report.

Parity surface: evaluate.py (test epoch with
ctc_beam_search_decoder_batch + scorer at Config.export_beam_width,
:51-182) and the report format of util/evaluate_tools.py.

Run: python -m stt_tpu.evaluate --test_files ... --checkpoint_dir ...
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

import numpy as np

import jax

from stt_tpu.config import SttConfig, initialize_globals_from_cli, log_info
from stt_tpu.data.feeding import create_batches
from stt_tpu.decode import ctc_beam_search_decoder_batch
from stt_tpu.evaluate_tools import (
    SampleResult,
    calculate_and_print_report,
    process_decode_result,
    save_samples_json,
)
from stt_tpu.train.checkpoints import CheckpointManager, load_graph_for_evaluation
from stt_tpu.train.step import create_train_state, make_eval_step
from stt_tpu.train.trainer import create_optimizer_with_hyperparams


def evaluate(
    config: SttConfig,
    params=None,
    test_files: Optional[List[str]] = None,
) -> List[List[SampleResult]]:
    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)
    feature_config = config.feature_config

    if params is None:
        optimizer = create_optimizer_with_hyperparams(config)
        template = create_train_state(
            jax.random.PRNGKey(0), model_config, optimizer
        )
        manager = CheckpointManager(config.load_checkpoint_dir)
        state, method = load_graph_for_evaluation(
            manager, template, config.load_evaluate
        )
        log_info(f"Loaded '{method}' checkpoint for evaluation")
        params = state.params

    scorer = None
    if config.scorer_path:
        from stt_tpu.decode.scorer_package import KenLMScorer

        scorer = KenLMScorer(
            config.scorer_path, alpha=config.lm_alpha, beta=config.lm_beta
        )

    eval_step = make_eval_step(model_config)
    # multi-host: hosts take test batches round-robin, then corpus
    # WER/CER merges via cross-process counter sums
    # (parallel/distributed.merge_wer_counters)
    proc_id, proc_count = jax.process_index(), jax.process_count()
    reports = []
    for test_csv in test_files or config.test_files:
        results: List[SampleResult] = []
        decode_walls: List[float] = []
        decode_audio_s = 0.0
        for batch_index, (batch, ids) in enumerate(create_batches(
            [test_csv],
            alphabet,
            feature_config,
            batch_size=config.test_batch_size,
            train_phase=False,
        )):
            if proc_count > 1 and batch_index % proc_count != proc_id:
                continue
            losses, logits = eval_step(params, batch)
            probs = jax.nn.softmax(logits, axis=-1)  # stays on device
            lengths = np.asarray(batch.feature_lengths)
            num_processes = max(
                1, min(config.test_batch_size, os.cpu_count() or 1)
            )
            import time as _time

            _decode_t0 = _time.time()
            mode = config.device_decode
            if mode == "auto":
                mode = "prune"
            if mode == "full" and scorer is None:
                # whole per-frame expansion/prune on device; the host only
                # walks backpointers (decode/device.py)
                from stt_tpu.decode.device import (
                    ctc_beam_search_decoder_device,
                )

                decoded = ctc_beam_search_decoder_device(
                    probs,
                    lengths.tolist(),
                    alphabet,
                    beam_size=config.export_beam_width,
                    cutoff_prob=config.cutoff_prob,
                    cutoff_top_n=config.cutoff_top_n,
                )
            elif mode in ("prune", "full"):
                # emission pruning on device, beam + LM on the host
                from stt_tpu.decode.device import (
                    ctc_beam_search_decoder_batch_pruned,
                )

                decoded = ctc_beam_search_decoder_batch_pruned(
                    probs,
                    lengths.tolist(),
                    alphabet,
                    beam_size=config.export_beam_width,
                    num_processes=num_processes,
                    cutoff_prob=config.cutoff_prob,
                    cutoff_top_n=config.cutoff_top_n,
                    scorer=scorer,
                )
            else:
                decoded = ctc_beam_search_decoder_batch(
                    list(np.asarray(probs)),
                    lengths.tolist(),
                    alphabet,
                    beam_size=config.export_beam_width,
                    num_processes=num_processes,
                    cutoff_prob=config.cutoff_prob,
                    cutoff_top_n=config.cutoff_top_n,
                    scorer=scorer,
                )
            decode_walls.append(_time.time() - _decode_t0)
            decode_audio_s += float(lengths.sum()) * (
                feature_config.step_samples / feature_config.sample_rate
            )
            labels = np.asarray(batch.labels)
            label_lengths = np.asarray(batch.label_lengths)
            for i, sample_id in enumerate(ids):
                src = alphabet.decode(labels[i, : label_lengths[i]])
                res = decoded[i][0].transcript
                results.append(
                    process_decode_result(
                        sample_id, src, res, float(losses[i])
                    )
                )
        calculate_and_print_report(
            results, dataset_name=test_csv, report_count=config.report_count
        )
        if decode_walls:
            # REAL-emission decode throughput (scorer path included):
            # the honest companion of bench.py's synthetic-emission
            # beam_scorer_decode_throughput. steady-state drops the
            # slowest batch — on the tunneled runtime that batch carries
            # the jit compile of the device-prune program
            decode_wall = sum(decode_walls)
            steady = decode_wall - (
                max(decode_walls) if len(decode_walls) > 1 else 0.0
            )
            steady_audio = decode_audio_s * (
                1.0 - 1.0 / len(decode_walls)
            ) if len(decode_walls) > 1 else decode_audio_s
            msg = (
                f"Decode throughput on {test_csv}: "
                f"{decode_audio_s / decode_wall:.1f} audio-s/s "
                f"({decode_audio_s:.1f} audio-s in {decode_wall:.2f} s, "
                f"mode={config.device_decode}, "
                f"beam={config.export_beam_width})"
            )
            if len(decode_walls) > 1 and steady > 0:
                msg += (
                    f"; steady-state {steady_audio / steady:.1f} "
                    f"audio-s/s (excl. compile batch)"
                )
            log_info(msg)
        if proc_count > 1:
            from stt_tpu.evaluate_tools import char_distance, word_distance
            from stt_tpu.parallel.distributed import merge_wer_counters

            wd = wn = cd = cn = 0
            for r in results:
                d, n = word_distance(r.src, r.res)
                wd, wn = wd + d, wn + n
                d, n = char_distance(r.src, r.res)
                cd, cn = cd + d, cn + n
            wer, cer = merge_wer_counters(wd, wn, cd, cn)
            if proc_id == 0:
                log_info(
                    f"All-hosts corpus on {test_csv} - WER: {wer:.6f}, "
                    f"CER: {cer:.6f}"
                )
        reports.append(results)
    if config.test_output_file and reports:
        save_samples_json(
            [r for rs in reports for r in rs], config.test_output_file
        )
    return reports


def main(argv=None):
    config = initialize_globals_from_cli(argv)
    if not config.test_files:
        print("--test_files is required", file=sys.stderr)
        sys.exit(1)
    evaluate(config)


if __name__ == "__main__":
    main()
