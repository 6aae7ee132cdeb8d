"""Exported model artifact: the training->deployment interface.

Replaces the reference's frozen-graph/.tflite export (export.py:34-150 +
tflitemodelstate.cc metadata tensors). A TPU-native artifact is just the
param pytree plus explicit metadata — jax.jit re-derives any "execution
plan" at load, so nothing like the reference's split-plan machinery is
needed.

Format: a directory (or a single .sttpkg zip of the same entries):
  weights.npz     flat params, keys "layer_1/w", "lstm/kernel", ...
  metadata.json   graph/geometry/feature/decoder metadata (the exact
                  counterpart of the metadata_* constants the reference
                  embeds, export.py:57-77)
  alphabet.txt    alphabet config (bytes mode: marker comment only)
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, Optional, Tuple

import numpy as np

from stt_tpu import GRAPH_VERSION, __version__
from stt_tpu.alphabet import Alphabet, UTF8Alphabet
from stt_tpu.frontend import FeatureConfig
from stt_tpu.models import ModelConfig

PACKAGE_EXT = ".sttpkg"


def _flatten(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for key, value in params.items():
        name = f"{prefix}{key}"
        if isinstance(value, dict):
            out.update(_flatten(value, name + "/"))
        else:
            out[name] = np.asarray(value)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for name, value in flat.items():
        node = out
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def build_metadata(
    model_config: ModelConfig,
    feature_config: FeatureConfig,
    alphabet: Alphabet,
    beam_width: int = 500,
    lm_alpha: float = 0.931289039105002,
    lm_beta: float = 1.1834137581510284,
    model_name: str = "stt-tpu-model",
    author: str = "",
    license_str: str = "",
    language: str = "",
) -> dict:
    return {
        "format": "stt_tpu",
        "framework_version": __version__,
        "graph_version": GRAPH_VERSION,
        "model_name": model_name,
        "author": author,
        "license": license_str,
        "language": language,
        "sample_rate": feature_config.sample_rate,
        "feature_win_len_ms": feature_config.window_samples
        * 1000
        // feature_config.sample_rate,
        "feature_win_step_ms": feature_config.step_samples
        * 1000
        // feature_config.sample_rate,
        "n_input": model_config.n_input,
        "n_context": model_config.n_context,
        "n_hidden": model_config.n_hidden,
        "n_cell_dim": model_config.n_cell_dim,
        "n_out": model_config.n_out,
        "relu_clip": model_config.relu_clip,
        "layer_norm": model_config.layer_norm,
        "beam_width": beam_width,
        "lm_alpha": lm_alpha,
        "lm_beta": lm_beta,
        "bytes_output_mode": isinstance(alphabet, UTF8Alphabet),
        "n_mels": feature_config.n_mels,
        "n_mfcc": feature_config.n_mfcc,
    }


def save_artifact(
    out_dir: str,
    params: Dict,
    metadata: dict,
    alphabet: Alphabet,
    quantize: bool = False,
) -> str:
    """quantize=True stores int8 weights + per-channel scales (~4x
    smaller artifact) — the counterpart of the reference's quantized
    TFLite export (export.py:126-150, Optimize.DEFAULT dynamic-range
    quantization); load_artifact dequantizes transparently."""
    os.makedirs(out_dir, exist_ok=True)
    if quantize:
        from stt_tpu.ops.quant import flatten_weight_only

        metadata = dict(metadata, quantized=True)
        flat = flatten_weight_only(params, n_cell=metadata["n_cell_dim"])
        np.savez(os.path.join(out_dir, "weights.npz"), **flat)
    else:
        np.savez(os.path.join(out_dir, "weights.npz"), **_flatten(params))
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    with open(os.path.join(out_dir, "alphabet.txt"), "w") as f:
        if isinstance(alphabet, UTF8Alphabet):
            f.write("# bytes output mode\n")
        else:
            f.write(alphabet.serialize_text())
    return out_dir


def package_zip(artifact_dir: str, zip_path: Optional[str] = None) -> str:
    """Bundle an artifact directory into one .sttpkg file
    (parity: export.py:290 package_zip)."""
    if zip_path is None:
        zip_path = artifact_dir.rstrip("/") + PACKAGE_EXT
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in ("weights.npz", "metadata.json", "alphabet.txt"):
            zf.write(os.path.join(artifact_dir, name), name)
    return zip_path


def load_artifact(path: str) -> Tuple[Dict, dict, Alphabet]:
    """Load a directory or .sttpkg -> (params, metadata, alphabet)."""
    if os.path.isdir(path):
        def read(name, mode="rb"):
            with open(os.path.join(path, name), mode) as f:
                return f.read()
    else:
        zf = zipfile.ZipFile(path, "r")

        def read(name, mode="rb"):
            data = zf.read(name)
            return data if mode == "rb" else data.decode("utf-8")

    metadata = json.loads(read("metadata.json", "r"))
    if metadata.get("format") != "stt_tpu":
        raise ValueError(f"{path} is not an stt_tpu model artifact")
    npz = np.load(io.BytesIO(read("weights.npz")))
    flat = {k: npz[k] for k in npz.files}
    if metadata.get("quantized"):
        from stt_tpu.ops.quant import dequantize_flat

        params = dequantize_flat(flat)
    else:
        params = _unflatten(flat)
    if metadata.get("bytes_output_mode"):
        alphabet: Alphabet = UTF8Alphabet()
    else:
        alphabet = Alphabet().init_from_text(read("alphabet.txt", "r"))
    return params, metadata, alphabet


def model_config_from_metadata(metadata: dict) -> ModelConfig:
    return ModelConfig(
        n_input=metadata["n_input"],
        n_context=metadata["n_context"],
        n_hidden=metadata["n_hidden"],
        n_cell_dim=metadata["n_cell_dim"],
        n_out=metadata["n_out"],
        relu_clip=metadata["relu_clip"],
        layer_norm=metadata["layer_norm"],
        dropout_rates=(0.0,) * 6,
        fused_lstm=True,  # gated off automatically where unsupported
    )


def feature_config_from_metadata(metadata: dict) -> FeatureConfig:
    rate = metadata["sample_rate"]
    return FeatureConfig(
        sample_rate=rate,
        window_samples=rate * metadata["feature_win_len_ms"] // 1000,
        step_samples=rate * metadata["feature_win_step_ms"] // 1000,
        n_mfcc=metadata.get("n_mfcc", 26),
        n_mels=metadata.get("n_mels", 40),
    )
