"""One-shot inference straight from a training checkpoint (no export) —
debugging aid (parity: coqui_stt_training.training_graph_inference).

Run: python -m stt_tpu.training_graph_inference --checkpoint_dir ... \
       --one_shot_infer audio.wav [--scorer_path ...]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax

from stt_tpu.config import SttConfig, initialize_globals_from_cli, log_info
from stt_tpu.data.audio import read_wav
from stt_tpu.decode import ctc_beam_search_decoder
from stt_tpu.frontend import audio_to_mfcc_numpy
from stt_tpu.models import apply_model
from stt_tpu.train.checkpoints import CheckpointManager, load_graph_for_evaluation
from stt_tpu.train.step import create_train_state
from stt_tpu.train.trainer import create_optimizer_with_hyperparams


def do_single_file_inference(config: SttConfig, audio_path: str) -> str:
    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)
    optimizer = create_optimizer_with_hyperparams(config)
    template = create_train_state(jax.random.PRNGKey(0), model_config, optimizer)
    manager = CheckpointManager(config.load_checkpoint_dir)
    state, method = load_graph_for_evaluation(
        manager, template, config.load_evaluate
    )
    log_info(f"Loaded '{method}' checkpoint")

    audio, _ = read_wav(audio_path, desired_rate=config.audio_sample_rate)
    feats = audio_to_mfcc_numpy(audio, config.feature_config)[None]
    lengths = np.asarray([feats.shape[1]], np.int32)
    logits, _ = apply_model(
        state.params, feats, seq_len=lengths, config=model_config
    )
    probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))

    scorer = None
    if config.scorer_path:
        from stt_tpu.decode.scorer_package import KenLMScorer

        scorer = KenLMScorer(
            config.scorer_path, alpha=config.lm_alpha, beta=config.lm_beta
        )
    [result] = ctc_beam_search_decoder(
        probs,
        alphabet,
        beam_size=config.beam_width,
        cutoff_prob=config.cutoff_prob,
        cutoff_top_n=config.cutoff_top_n,
        scorer=scorer,
    )
    print(result.transcript)
    return result.transcript


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--one_shot_infer", required=True)
    args, rest = parser.parse_known_args(argv)
    config = initialize_globals_from_cli(rest)
    do_single_file_inference(config, args.one_shot_infer)


if __name__ == "__main__":
    main()
