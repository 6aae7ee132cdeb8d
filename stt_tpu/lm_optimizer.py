"""LM hyperparameter search: find (lm_alpha, lm_beta) minimizing WER/CER
on a test set (parity: util/lm_optimize.py + lm_optimizer.py shim; the
reference drives Optuna — not available here — so this uses quasi-random
search followed by local refinement around the incumbent, which matches
Optuna's budget-for-quality behavior at these 2-D scales).

Run: python -m stt_tpu.lm_optimizer --test_files ... --checkpoint_dir ... \
       --scorer_path ... [--n_trials 30] [--lm_alpha_max 5] [--lm_beta_max 5]
"""

from __future__ import annotations

import argparse
import random
import sys
from typing import List, Tuple

import numpy as np

import jax

from stt_tpu.config import SttConfig, initialize_globals_from_cli, log_info
from stt_tpu.data.feeding import create_batches
from stt_tpu.decode import ctc_beam_search_decoder_batch
from stt_tpu.decode.scorer_package import KenLMScorer
from stt_tpu.text import wer_cer_batch
from stt_tpu.train.checkpoints import CheckpointManager, load_graph_for_evaluation
from stt_tpu.train.step import create_train_state, make_eval_step
from stt_tpu.train.trainer import create_optimizer_with_hyperparams


def compute_lm_optimization(
    config: SttConfig,
    n_trials: int = 30,
    alpha_max: float = 5.0,
    beta_max: float = 5.0,
    use_cer: bool = False,
    params=None,
) -> Tuple[float, float, float]:
    """Returns (best_alpha, best_beta, best_metric)."""
    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)

    if params is None:
        optimizer = create_optimizer_with_hyperparams(config)
        template = create_train_state(
            jax.random.PRNGKey(0), model_config, optimizer
        )
        manager = CheckpointManager(config.load_checkpoint_dir)
        state, _ = load_graph_for_evaluation(manager, template, config.load_evaluate)
        params = state.params

    # run the acoustic model ONCE; trials only re-decode
    eval_step = make_eval_step(model_config)
    all_probs: List[np.ndarray] = []
    all_lengths: List[int] = []
    all_refs: List[str] = []
    for batch, ids in create_batches(
        config.test_files, alphabet, config.feature_config,
        batch_size=config.test_batch_size, train_phase=False,
    ):
        _, logits = eval_step(params, batch)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        lengths = np.asarray(batch.feature_lengths)
        labels = np.asarray(batch.labels)
        label_lengths = np.asarray(batch.label_lengths)
        for i in range(len(ids)):
            all_probs.append(probs[i])
            all_lengths.append(int(lengths[i]))
            all_refs.append(alphabet.decode(labels[i, : label_lengths[i]]))

    scorer = KenLMScorer(config.scorer_path)

    def objective(alpha: float, beta: float) -> float:
        scorer.reset_params(alpha, beta)
        decoded = ctc_beam_search_decoder_batch(
            all_probs, all_lengths, alphabet,
            beam_size=config.export_beam_width,
            num_processes=max(1, config.test_batch_size),
            cutoff_prob=config.cutoff_prob,
            cutoff_top_n=config.cutoff_top_n,
            scorer=scorer,
        )
        hyps = [d[0].transcript for d in decoded]
        wer, cer = wer_cer_batch(all_refs, hyps)
        return cer if use_cer else wer

    rng = random.Random(4568)
    best = (config.lm_alpha, config.lm_beta, objective(config.lm_alpha, config.lm_beta))
    log_info(f"baseline alpha={best[0]:.4f} beta={best[1]:.4f} -> {best[2]:.4f}")
    explore = max(1, int(n_trials * 0.7))
    for trial in range(n_trials):
        if trial < explore:
            alpha = rng.uniform(0, alpha_max)
            beta = rng.uniform(0, beta_max)
        else:  # refine around the incumbent
            alpha = min(alpha_max, max(0.0, rng.gauss(best[0], alpha_max * 0.05)))
            beta = min(beta_max, max(0.0, rng.gauss(best[1], beta_max * 0.05)))
        metric = objective(alpha, beta)
        log_info(f"trial {trial}: alpha={alpha:.4f} beta={beta:.4f} -> {metric:.4f}")
        if metric < best[2]:
            best = (alpha, beta, metric)
    log_info(
        f"Best params: lm_alpha={best[0]:.6f} lm_beta={best[1]:.6f} "
        f"with {'CER' if use_cer else 'WER'}={best[2]:.6f}"
    )
    return best


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--n_trials", type=int, default=30)
    parser.add_argument("--lm_alpha_max", type=float, default=5.0)
    parser.add_argument("--lm_beta_max", type=float, default=5.0)
    parser.add_argument("--use_cer", action="store_true")
    args, rest = parser.parse_known_args(argv)
    config = initialize_globals_from_cli(rest)
    if not (config.test_files and config.scorer_path):
        print("--test_files and --scorer_path are required", file=sys.stderr)
        sys.exit(1)
    compute_lm_optimization(
        config, args.n_trials, args.lm_alpha_max, args.lm_beta_max, args.use_cer
    )


if __name__ == "__main__":
    main()
