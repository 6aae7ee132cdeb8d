"""Greedy (best-path) CTC decoding.

Device side: argmax over classes per frame (one reduction, trivially
data-parallel). Host side: collapse repeats and strip blanks, tracking the
emitting frame index of each token (timestep metadata mirrors the decoder
library's token timing surface, modelstate.cc:55).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def best_path(logits: jax.Array) -> jax.Array:
    """[B, T, C] -> [B, T] argmax class per frame."""
    return jnp.argmax(logits, axis=-1)


def collapse_best_path(
    path: np.ndarray, length: int, blank: int
) -> Tuple[List[int], List[int]]:
    """Collapse one utterance's best path -> (tokens, emitting timesteps)."""
    tokens: List[int] = []
    steps: List[int] = []
    prev = -1
    for t in range(length):
        tok = int(path[t])
        if tok != prev and tok != blank:
            tokens.append(tok)
            steps.append(t)
        prev = tok
    return tokens, steps


def greedy_decode(
    logits: jax.Array, lengths: jax.Array | None = None
) -> List[Tuple[List[int], List[int]]]:
    """[B, T, C] logits -> per-utterance (tokens, timesteps); blank = C-1."""
    blank = logits.shape[-1] - 1
    path = np.asarray(best_path(logits))
    b, t_max = path.shape
    lens = (
        np.full(b, t_max) if lengths is None else np.asarray(lengths)
    )
    return [collapse_best_path(path[i], int(lens[i]), blank) for i in range(b)]
