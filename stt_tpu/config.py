"""Framework configuration: one dataclass -> CLI flags -> derived geometry.

Parity surface: util/config.py (BaseSttConfig + initialize_globals_from_cli):
the flag names follow the reference so existing run scripts translate
1:1; __post_init__ derives the model/feature geometry exactly like the
reference (n_input=26, n_context=9, window/step samples from ms flags,
n_hidden_* from n_hidden, n_cell_dim, blank=alphabet+1) and resolves the
alphabet (file, bytes mode, or auto-generation from training CSVs).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from dataclasses import dataclass, field
from typing import List, Optional

from stt_tpu.alphabet import Alphabet, UTF8Alphabet, make_alphabet
from stt_tpu.frontend import FeatureConfig
from stt_tpu.models import ModelConfig


def _flag_type(f):
    if f.type in ("List[str]", List[str], "list"):
        return str
    return {int: int, float: float, bool: bool, str: str}.get(f.type, str)


@dataclass
class SttConfig:
    # -- datasets ----------------------------------------------------------
    train_files: List[str] = field(default_factory=list)
    dev_files: List[str] = field(default_factory=list)
    test_files: List[str] = field(default_factory=list)
    metrics_files: List[str] = field(default_factory=list)
    auto_input_dataset: str = ""

    # -- alphabet / outputs ------------------------------------------------
    alphabet_config_path: str = ""
    bytes_output_mode: bool = False

    # -- geometry ----------------------------------------------------------
    n_hidden: int = 2048
    layer_norm: bool = False
    relu_clip: float = 20.0

    # -- audio / features --------------------------------------------------
    audio_sample_rate: int = 16000
    feature_win_len: int = 32  # ms
    feature_win_step: int = 20  # ms

    # -- training ----------------------------------------------------------
    epochs: int = 75
    train_batch_size: int = 1
    dev_batch_size: int = 1
    test_batch_size: int = 1
    learning_rate: float = 0.001
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    # reset the (checkpoint-restored, possibly plateau-reduced) learning
    # rate back to --learning_rate when resuming (reference
    # util/config.py:785 / util/checkpoints.py:28-35)
    force_initialize_learning_rate: bool = False
    dropout_rate: float = 0.05
    dropout_rate2: float = -1.0  # <0: same as dropout_rate
    dropout_rate3: float = -1.0
    dropout_rate5: float = -1.0
    augment: List[str] = field(default_factory=list)
    reverse_train: bool = False
    limit_train: int = 0
    shuffle_batches: bool = True
    # async input pipeline (reference: LimitingPool worker processes +
    # per-GPU prefetch, helpers.py:124-163 / feeding.py:236):
    # featurize/augment worker threads (-1 = auto, 0/1 = synchronous)
    # and how many ready batches to assemble ahead of the device
    input_workers: int = -1
    prefetch_batches: int = 2
    # cache MFCC features (+ encoded labels) after the first epoch so
    # later epochs skip audio decode + featurize — the reference's
    # --feature_cache (util/feeding.py:223-224). Path = persist across
    # runs; with augmentations the first epoch's draws repeat (the
    # reference warns identically, util/config.py:47-55).
    feature_cache: str = ""
    # invalidate the feature cache every N epochs (0 = never), drawing
    # fresh augmentations — the reference's --cache_for_epochs
    # (train.py:467-474)
    cache_for_epochs: int = 0
    # run spectrogram/features-domain graph augmentations on device
    # inside a jitted program (reference applied them in-graph,
    # util/augmentations.py:485-769); host featurization then stops at
    # the spectrogram. Single-host only; ignored (with a warning) on
    # multi-host jobs.
    graph_augs_on_device: bool = False
    # ship RAW AUDIO to the device and run the MFCC frontend inside the
    # jitted train step (train.step.make_train_step_audio): host input
    # work collapses to wav decode + padding, at ~12x larger batch
    # uploads. The right choice when host featurize CPU is the training
    # bottleneck; incompatible with host spectrogram/features-domain
    # graph augmentations (use --graph_augs_on_device for those).
    device_featurize: bool = False

    # -- checkpointing -----------------------------------------------------
    checkpoint_dir: str = ""
    save_checkpoint_dir: str = ""
    load_checkpoint_dir: str = ""
    checkpoint_secs: int = 600
    max_to_keep: int = 5
    load_train: str = "auto"  # auto | best | last | init
    load_evaluate: str = "auto"  # auto | best | last
    drop_source_layers: int = 0

    # -- observability -------------------------------------------------------
    # TensorBoard scalars (step summaries, train.py:190-193 parity) and
    # jax profiler traces (the reference has no profiler; SURVEY §5 asks
    # for one) — both off unless a directory is given
    summary_dir: str = ""
    profile_dir: str = ""
    profile_steps: int = 10  # trace this many steps of epoch 0

    # -- early stop / plateau ---------------------------------------------
    early_stop: bool = False
    es_epochs: int = 25
    es_min_delta: float = 0.05
    reduce_lr_on_plateau: bool = False
    plateau_epochs: int = 10
    plateau_reduction: float = 0.1

    # -- decoder -----------------------------------------------------------
    scorer_path: str = ""
    lm_alpha: float = 0.931289039105002
    lm_beta: float = 1.1834137581510284
    beam_width: int = 1024
    export_beam_width: int = 500
    cutoff_prob: float = 1.0
    cutoff_top_n: int = 300
    # where the per-frame beam math runs: 'prune' (and 'auto') runs the
    # per-frame emission pruning on device and the beam+LM on the host;
    # 'full' runs the WHOLE no-LM beam expansion/prune on device
    # (decode/device.py scan) — opt-in: measured on the tunneled v5e,
    # large (T x B x W) scans execute pathologically slowly even after
    # compile (chunk-sized scans are fine); 'off' decodes on the host
    # from full-width probabilities
    device_decode: str = "auto"  # auto | full | prune | off

    # -- export ------------------------------------------------------------
    export_dir: str = ""
    export_zip: bool = False
    # store int8 weights + per-channel scales in the artifact (~4x
    # smaller; the reference's quantized-TFLite counterpart)
    export_quantize: bool = False
    export_model_name: str = "model"
    export_author_id: str = ""
    export_model_version: str = "0.0.1"
    export_license: str = ""
    export_language: str = ""
    # also write a REFERENCE-FORMAT .tflite (named tensors + metadata_*,
    # compat.tflite_export): the artifact the reference's C++ runtime
    # and bindings load, so models trained here deploy on its stack
    export_tflite: bool = False
    export_file_name: str = "output_graph"
    # streaming chunk length in timesteps baked into the tflite graph
    # (reference Config.n_steps / modelstate n_steps, config.py:627-632)
    n_steps: int = 16

    # -- distribution ------------------------------------------------------
    # multi-host: join a jax.distributed job before touching devices
    # (train.py had nothing here — the reference was single-host only,
    # SURVEY.md §2.5; these drive parallel/distributed.initialize)
    coordinator_address: str = ""  # host:port of process 0
    num_processes: int = 0  # 0/1 = single-process
    process_id: int = -1  # -1: take from env (JAX_PROCESS_ID)
    n_model_parallel: int = 1
    compute_dtype: str = "float32"  # bfloat16 for full-rate MXU training
    # fused Pallas LSTM kernels (inference + training); safe to leave on:
    # unsupported shapes, CPU hosts, and multi-device GSPMD programs fall
    # back to the lax.scan automatically
    fused_lstm: bool = True

    # -- misc --------------------------------------------------------------
    log_level: int = 1
    show_progressbar: bool = True
    report_count: int = 5
    test_output_file: str = ""
    seed: int = 4568

    # derived (not flags)
    alphabet: Optional[Alphabet] = field(default=None, repr=False)

    # -- derivation --------------------------------------------------------

    def __post_init__(self):
        if self.dropout_rate2 < 0:
            self.dropout_rate2 = self.dropout_rate
        if self.dropout_rate3 < 0:
            self.dropout_rate3 = self.dropout_rate
        if self.dropout_rate5 < 0:
            self.dropout_rate5 = self.dropout_rate
        if self.checkpoint_dir:
            self.save_checkpoint_dir = self.save_checkpoint_dir or self.checkpoint_dir
            self.load_checkpoint_dir = self.load_checkpoint_dir or self.checkpoint_dir

    def resolve_alphabet(self) -> Alphabet:
        if self.alphabet is not None:
            return self.alphabet
        if self.bytes_output_mode:
            self.alphabet = UTF8Alphabet()
        elif self.alphabet_config_path:
            self.alphabet = Alphabet(self.alphabet_config_path)
        elif self.train_files:
            # auto-generate from training transcripts (config.py:117-218)
            from stt_tpu.data.sources import samples_from_sources

            chars = set()
            for sample in samples_from_sources(self.train_files, labeled=True):
                chars.update(sample.transcript or "")
            self.alphabet = Alphabet().init_from_labels(sorted(chars))
        else:
            raise ValueError(
                "need --alphabet_config_path, --bytes_output_mode, or "
                "--train_files to derive an alphabet"
            )
        return self.alphabet

    @property
    def feature_config(self) -> FeatureConfig:
        return FeatureConfig.from_ms(
            sample_rate=self.audio_sample_rate,
            window_ms=self.feature_win_len,
            step_ms=self.feature_win_step,
        )

    def model_config(self, training: bool = True) -> ModelConfig:
        alphabet = self.resolve_alphabet()
        rates = (
            (
                self.dropout_rate,
                self.dropout_rate2,
                self.dropout_rate3,
                0.0,
                0.0,
                self.dropout_rate5,
            )
            if training
            else (0.0,) * 6
        )
        return ModelConfig(
            n_hidden=self.n_hidden,
            n_cell_dim=self.n_hidden,
            n_out=alphabet.size + 1,
            relu_clip=self.relu_clip,
            layer_norm=self.layer_norm,
            dropout_rates=rates,
            compute_dtype=self.compute_dtype,
            fused_lstm=self.fused_lstm,
        )

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("alphabet", None)
        return d


_LIST_FIELDS = {"train_files", "dev_files", "test_files", "metrics_files", "augment"}


def parse_flags(argv: Optional[List[str]] = None) -> SttConfig:
    """argparse CLI over every SttConfig field (flag names == field names,
    comma-separated values for list fields; --augment is repeatable)."""
    parser = argparse.ArgumentParser(
        prog="stt_tpu", description="TPU-native speech-to-text framework"
    )
    for f in dataclasses.fields(SttConfig):
        if f.name == "alphabet":
            continue
        if f.name in _LIST_FIELDS:
            if f.name == "augment":
                parser.add_argument("--augment", action="append", default=None)
            else:
                parser.add_argument(f"--{f.name}", type=str, default=None)
        elif f.type in ("bool", bool):
            parser.add_argument(
                f"--{f.name}",
                type=lambda v: v.lower() in ("1", "true", "yes"),
                nargs="?",
                const=True,
                default=None,
            )
        else:
            ftype = int if f.type in ("int", int) else (
                float if f.type in ("float", float) else str
            )
            parser.add_argument(f"--{f.name}", type=ftype, default=None)
    args = parser.parse_args(argv)
    kwargs = {}
    for f in dataclasses.fields(SttConfig):
        if f.name == "alphabet":
            continue
        value = getattr(args, f.name, None)
        if value is None:
            continue
        if f.name in _LIST_FIELDS and f.name != "augment":
            value = [v for v in value.split(",") if v]
        kwargs[f.name] = value
    return SttConfig(**kwargs)


def _honor_platform_env() -> None:
    """The axon sitecustomize hook overrides JAX_PLATFORMS at interpreter
    start (jax.config.update('jax_platforms', 'axon,cpu')); a CLI run
    that explicitly sets the env var means it (multi-process CPU gates
    would otherwise silently land on the single tunneled TPU, where
    cross-process collectives can never rendezvous)."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        jax.config.update("jax_platforms", env)


def maybe_initialize_distributed(config: SttConfig) -> None:
    """Join the multi-host runtime when --num_processes > 1. Must run
    before anything touches jax devices (CLI entry points call it right
    after flag parsing)."""
    _honor_platform_env()
    if config.num_processes and config.num_processes > 1:
        from stt_tpu.parallel.distributed import initialize

        process_id = config.process_id
        if process_id < 0:
            process_id = int(os.environ.get("JAX_PROCESS_ID", "-1"))
        initialize(
            coordinator_address=config.coordinator_address or None,
            num_processes=config.num_processes,
            process_id=process_id if process_id >= 0 else None,
        )


def initialize_globals_from_cli(argv: Optional[List[str]] = None) -> SttConfig:
    config = parse_flags(argv)
    maybe_initialize_distributed(config)
    config.resolve_alphabet()
    return config


# -- leveled logging (config.py:894-911 parity) -----------------------------

_LOG_LEVEL = int(os.environ.get("STT_LOG_LEVEL", "1"))


def log_debug(*args):
    if _LOG_LEVEL >= 2:
        print("D", *args, file=sys.stderr)


def log_info(*args):
    if _LOG_LEVEL >= 1:
        print("I", *args)


def log_warn(*args):
    print("W", *args, file=sys.stderr)


def log_error(*args):
    print("E", *args, file=sys.stderr)
