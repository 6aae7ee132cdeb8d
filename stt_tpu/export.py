"""Export a trained checkpoint as a deployable model artifact.

Parity surface: coqui_stt_training.export (freeze -> .pb/.tflite with
embedded metadata, export.py:34-150, zip packaging :290). Here the
artifact is the weights.npz + metadata.json + alphabet bundle
(stt_tpu.artifact), loadable by stt_tpu.serve.Model.

Run: python -m stt_tpu.export --checkpoint_dir ... --export_dir ...
"""

from __future__ import annotations

import sys

import jax

from stt_tpu.artifact import build_metadata, package_zip, save_artifact
from stt_tpu.config import SttConfig, initialize_globals_from_cli, log_info
from stt_tpu.train.checkpoints import CheckpointManager, load_graph_for_evaluation
from stt_tpu.train.step import create_train_state
from stt_tpu.train.trainer import create_optimizer_with_hyperparams


def export(config: SttConfig) -> str:
    alphabet = config.resolve_alphabet()
    model_config = config.model_config(training=False)
    optimizer = create_optimizer_with_hyperparams(config)
    template = create_train_state(jax.random.PRNGKey(0), model_config, optimizer)
    manager = CheckpointManager(config.load_checkpoint_dir)
    state, method = load_graph_for_evaluation(
        manager, template, config.load_evaluate
    )
    log_info(f"Exporting '{method}' checkpoint (step {int(state.step)})")
    metadata = build_metadata(
        model_config,
        config.feature_config,
        alphabet,
        beam_width=config.export_beam_width,
        lm_alpha=config.lm_alpha,
        lm_beta=config.lm_beta,
        model_name=config.export_model_name,
        author=config.export_author_id,
        license_str=config.export_license,
        language=config.export_language,
    )
    out = save_artifact(
        config.export_dir,
        jax.device_get(state.params),
        metadata,
        alphabet,
        quantize=config.export_quantize,
    )
    write_model_card(config, metadata, out)
    log_info(f"Exported model artifact to {out}")
    if config.export_tflite:
        import os

        from stt_tpu.compat.tflite_export import export_reference_tflite

        tflite_path = os.path.join(
            out, (config.export_file_name or "output_graph") + ".tflite"
        )
        export_reference_tflite(
            jax.device_get(state.params), alphabet, tflite_path,
            n_steps=config.n_steps,
            sample_rate=config.feature_config.sample_rate,
            feature_win_len_ms=config.feature_win_len,
            feature_win_step_ms=config.feature_win_step,
            export_beam_width=config.export_beam_width,
            language=config.export_language,
            quantize=config.export_quantize,
        )
        log_info(
            f"Exported reference-format TFLite artifact to {tflite_path} "
            "(loadable by the reference C++ runtime)"
        )
    if config.export_zip:
        zip_path = package_zip(out)
        log_info(f"Packaged {zip_path}")
        return zip_path
    return out


def write_model_card(config: SttConfig, metadata: dict, out_dir: str) -> str:
    """Model-card markdown beside the artifact (export.py model-card
    parity)."""
    import os

    path = os.path.join(out_dir, "MODEL_CARD.md")
    with open(path, "w") as f:
        f.write(
            f"# Model card for {config.export_model_name}\n\n"
            f"- Author: {config.export_author_id or 'unknown'}\n"
            f"- Model version: {config.export_model_version}\n"
            f"- Language: {config.export_language or 'unspecified'}\n"
            f"- License: {config.export_license or 'unspecified'}\n"
            f"- Framework: stt_tpu {metadata['framework_version']} "
            f"(graph v{metadata['graph_version']})\n\n"
            f"## Geometry\n\n"
            f"- n_hidden: {metadata['n_hidden']}\n"
            f"- alphabet size + blank: {metadata['n_out']}\n"
            f"- sample rate: {metadata['sample_rate']} Hz, "
            f"{metadata['feature_win_len_ms']} ms window / "
            f"{metadata['feature_win_step_ms']} ms step, "
            f"{metadata['n_mfcc']} MFCCs\n\n"
            f"## Decoder defaults\n\n"
            f"- beam width: {metadata['beam_width']}\n"
            f"- lm_alpha: {metadata['lm_alpha']}\n"
            f"- lm_beta: {metadata['lm_beta']}\n"
        )
    return path


def main(argv=None):
    config = initialize_globals_from_cli(argv)
    if not config.export_dir:
        print("--export_dir is required", file=sys.stderr)
        sys.exit(1)
    export(config)


if __name__ == "__main__":
    main()
