"""Checkpoint management: last/best_dev savers, retention, load-order
resolution, and drop-layer transfer learning.

Parity surface: util/checkpoints.py (load order best->last->init,
--load_train overrides, drop_source_layers transfer learning) and
train.py:550-619 (periodic + per-epoch last saves, best_dev saves keyed
on dev loss). The CuDNN-conversion retry of the reference is N/A here —
there is a single canonical param layout.

Layout on disk:
  checkpoint_dir/
    last/step_N/...   (orbax standard checkpoints, max_to_keep retained)
    best_dev/step_N/...
    meta.json         (tag -> latest step, dev loss of best)
    config.json       (geometry/flags snapshot, mirrors flags.txt)
    alphabet.txt
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_dir: str, max_to_keep: int = 5):
        self.dir = os.path.abspath(checkpoint_dir)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()
        os.makedirs(self.dir, exist_ok=True)

    # -- bookkeeping -------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.dir, "meta.json")

    def _read_meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_meta(self, meta: dict) -> None:
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f, indent=2)

    def _tag_dir(self, tag: str) -> str:
        return os.path.join(self.dir, tag)

    def steps(self, tag: str) -> List[int]:
        tag_dir = self._tag_dir(tag)
        if not os.path.isdir(tag_dir):
            return []
        out = []
        for name in os.listdir(tag_dir):
            if not name.startswith("step_"):
                continue
            suffix = name.split("_", 1)[1]
            if not suffix.isdigit():
                # a crash mid-save leaves step_N.orbax-checkpoint-tmp
                # behind; it must not break every later restore
                continue
            out.append(int(suffix))
        return sorted(out)

    def latest_step(self, tag: str) -> Optional[int]:
        steps = self.steps(tag)
        return steps[-1] if steps else None

    # -- save/load ---------------------------------------------------------

    def save(self, state, tag: str = "last", dev_loss: Optional[float] = None):
        """Multi-host contract: EVERY process must call save (orbax
        synchronizes processes internally — a coordinator-only call
        would desync the job's collective streams); directory mutations
        happen on process 0 only."""
        primary = jax.process_index() == 0
        step = int(state.step)
        path = os.path.join(self._tag_dir(tag), f"step_{step}")
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        host_state = jax.device_get(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step}
        )
        self._ckptr.save(path, host_state)
        self._ckptr.wait_until_finished()
        if not primary:
            return path
        meta = self._read_meta()
        meta[tag] = step
        if dev_loss is not None:
            meta[f"{tag}_dev_loss"] = float(dev_loss)
        self._write_meta(meta)
        # retention
        steps = self.steps(tag)
        for old in steps[: -self.max_to_keep]:
            shutil.rmtree(os.path.join(self._tag_dir(tag), f"step_{old}"))
        return path

    def restore(self, template_state, tag: str = "last",
                step: Optional[int] = None):
        if step is None:
            step = self.latest_step(tag)
        if step is None:
            raise FileNotFoundError(f"no '{tag}' checkpoint in {self.dir}")
        path = os.path.join(self._tag_dir(tag), f"step_{step}")
        target = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": template_state.step,
        }
        restored = self._ckptr.restore(path, target)
        return template_state._replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
        )

    def best_dev_loss(self) -> float:
        return float(self._read_meta().get("best_dev_dev_loss", np.inf))

    # -- side files (parity: config.py:226-236) ----------------------------

    def save_run_files(self, config_dict: dict, alphabet_text: str) -> None:
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
        with open(os.path.join(self.dir, "alphabet.txt"), "w") as f:
            f.write(alphabet_text)


def drop_layers(params, restored_params, drop_source_layers: int):
    """Transfer learning: take the bottom layers from `restored_params`,
    keep fresh init for the top `drop_source_layers` layers
    (checkpoints.py:61-83 — drop order: layer_6, layer_5, lstm, layer_3,
    layer_2, layer_1)."""
    drop_order = ["layer_6", "layer_5", "lstm", "layer_3", "layer_2", "layer_1"]
    dropped = set(drop_order[: max(0, min(drop_source_layers, 5))])
    out = {}
    for name in params:
        out[name] = params[name] if name in dropped else restored_params[name]
    return out


def load_or_init_graph_for_training(
    manager: CheckpointManager,
    template_state,
    load_train: str = "auto",
    drop_source_layers: int = 0,
):
    """Resolve the initial state: 'best'/'last'/'init'/'auto' (auto = best
    -> last -> init, checkpoints.py:151-233). Returns (state, method)."""
    order = {
        "auto": ["best_dev", "last", "init"],
        "best": ["best_dev"],
        "last": ["last"],
        "init": ["init"],
    }[load_train]
    for method in order:
        if method == "init":
            return template_state, "init"
        try:
            restored = manager.restore(template_state, tag=method)
        except FileNotFoundError:
            continue
        if drop_source_layers > 0:
            params = drop_layers(
                template_state.params, restored.params, drop_source_layers
            )
            # fresh optimizer + step for transfer learning
            return template_state._replace(params=params), method
        return restored, method
    raise FileNotFoundError(
        f"no checkpoint found in {manager.dir} for load mode '{load_train}'"
    )


def load_graph_for_evaluation(manager: CheckpointManager, template_state,
                              load_evaluate: str = "auto"):
    """Eval load order: best -> last (never init), checkpoints.py:222-233."""
    order = {
        "auto": ["best_dev", "last"],
        "best": ["best_dev"],
        "last": ["last"],
    }[load_evaluate]
    for method in order:
        try:
            return manager.restore(template_state, tag=method), method
        except FileNotFoundError:
            continue
    raise FileNotFoundError(
        f"no checkpoint for evaluation in {manager.dir} (tried {order})"
    )
