"""Evaluate a checkpoint with the flashlight-style decoders
(counterpart of the reference's evaluate_flashlight.py and
training_graph_inference_flashlight.py): same acoustic pass as
stt_tpu.evaluate, decoded by the lexicon / lexicon-free beam decoder
with a word-level KenLM instead of the character-level prefix search.

Run:
  python -m stt_tpu.evaluate_flashlight --test_files t.csv \
    --checkpoint_dir ckpt --alphabet_config_path alphabet.txt \
    --scorer_path lm.scorer [--decoder_type lexicon|lexicon_free] \
    [--vocab_file words.txt] [--beam_size 64] [--lm_weight 1.0] \
    [--word_score 0.0] [--one_shot_infer utt.wav]
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

import jax

from stt_tpu.config import SttConfig, log_info, parse_flags
from stt_tpu.data.feeding import create_batches
from stt_tpu.decode.flashlight import flashlight_beam_search_decoder
from stt_tpu.evaluate_tools import (
    calculate_and_print_report,
    process_decode_result,
    save_samples_json,
)
from stt_tpu.train.checkpoints import (
    CheckpointManager,
    load_graph_for_evaluation,
)
from stt_tpu.train.step import create_train_state, make_eval_step
from stt_tpu.train.trainer import create_optimizer_with_hyperparams


def _result_text(result, alphabet, decoder_type: str) -> str:
    """Lexicon results carry words; lexicon-free results carry collapsed
    token ids (the reference glue exposes the same split)."""
    if decoder_type == "lexicon":
        return " ".join(result.words)
    return alphabet.decode(result.tokens).strip()


def evaluate_flashlight(
    config: SttConfig,
    decoder_type: str = "lexicon",
    vocabulary: Optional[List[str]] = None,
    beam_size: int = 64,
    lm_weight: float = 1.0,
    word_score: float = 0.0,
    params=None,
) -> List[List]:
    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)

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

        scorer = KenLMScorer(config.scorer_path)
    elif decoder_type == "lexicon" and vocabulary is None:
        raise ValueError(
            "lexicon decoding needs --scorer_path (vocabulary FST) or "
            "--vocab_file"
        )

    eval_step = make_eval_step(model_config)
    reports = []
    for test_csv in config.test_files:
        results = []
        for batch, ids in create_batches(
            [test_csv], alphabet, config.feature_config,
            batch_size=config.test_batch_size, train_phase=False,
        ):
            losses, logits = eval_step(params, batch)
            log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
            lengths = np.asarray(batch.feature_lengths)
            labels = np.asarray(batch.labels)
            label_lengths = np.asarray(batch.label_lengths)
            for i, sample_id in enumerate(ids):
                decoded = flashlight_beam_search_decoder(
                    log_probs[i, : lengths[i]], alphabet, scorer,
                    vocabulary=vocabulary, decoder_type=decoder_type,
                    beam_size=beam_size, lm_weight=lm_weight,
                    word_score=word_score,
                )
                src = alphabet.decode(labels[i, : label_lengths[i]])
                res = _result_text(decoded[0], alphabet, decoder_type) if decoded else ""
                results.append(
                    process_decode_result(sample_id, src, res,
                                          float(losses[i]))
                )
        calculate_and_print_report(
            results, dataset_name=f"{test_csv} [flashlight/{decoder_type}]",
            report_count=config.report_count,
        )
        reports.append(results)
    if config.test_output_file and reports:
        save_samples_json(
            [r for rs in reports for r in rs], config.test_output_file
        )
    return reports


def one_shot_infer(config: SttConfig, wav_path: str,
                   decoder_type: str = "lexicon", beam_size: int = 64,
                   vocabulary: Optional[List[str]] = None) -> str:
    """Single-wav flashlight decode
    (training_graph_inference_flashlight.py parity)."""
    import jax.numpy as jnp

    from stt_tpu.data.audio import read_audio
    from stt_tpu.decode.scorer_package import KenLMScorer
    from stt_tpu.frontend import audio_to_mfcc
    from stt_tpu.models import apply_model

    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)
    optimizer = create_optimizer_with_hyperparams(config)
    template = create_train_state(jax.random.PRNGKey(0), model_config, optimizer)
    manager = CheckpointManager(config.load_checkpoint_dir)
    state, _ = load_graph_for_evaluation(manager, template, config.load_evaluate)

    audio, _ = read_audio(
        wav_path, desired_rate=config.feature_config.sample_rate
    )
    feats = audio_to_mfcc(jnp.asarray(audio), config.feature_config)
    seq = jnp.asarray([feats.shape[0]], jnp.int32)
    logits, _ = apply_model(
        state.params, feats[None], seq_len=seq, config=model_config
    )
    log_probs = np.asarray(jax.nn.log_softmax(logits[0], axis=-1))
    scorer = KenLMScorer(config.scorer_path) if config.scorer_path else None
    decoded = flashlight_beam_search_decoder(
        log_probs, alphabet, scorer, vocabulary=vocabulary,
        decoder_type=decoder_type, beam_size=beam_size,
    )
    text = _result_text(decoded[0], alphabet, decoder_type) if decoded else ""
    print(text)
    return text


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def take(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            value = argv[i + 1]
            del argv[i : i + 2]
            return value
        return default

    decoder_type = take("--decoder_type", "lexicon")
    vocab_file = take("--vocab_file")
    beam_size = int(take("--beam_size", "64"))
    lm_weight = float(take("--lm_weight", "1.0"))
    word_score = float(take("--word_score", "0.0"))
    wav = take("--one_shot_infer")
    config = parse_flags(argv)
    vocabulary = None
    if vocab_file:
        with open(vocab_file, encoding="utf-8") as f:
            vocabulary = [w for w in f.read().split() if w]
    if wav:
        one_shot_infer(config, wav, decoder_type, beam_size, vocabulary)
        return
    evaluate_flashlight(
        config, decoder_type=decoder_type, vocabulary=vocabulary,
        beam_size=beam_size, lm_weight=lm_weight, word_score=word_score,
    )


if __name__ == "__main__":
    main()
