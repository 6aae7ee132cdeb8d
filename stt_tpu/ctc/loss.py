"""CTC loss: log-semiring forward algorithm as a lax.scan over time.

Replaces the reference's tfv1.nn.ctc_loss call (train.py:95). Semantics:
- blank index = num_classes - 1 (the framework-wide convention: alphabet
  labels 0..A-1, blank = A, ctc_beam_search_decoder.cpp:33).
- per-example loss = -log P(labels | logits), summed over time, so values
  are comparable with the reference's loss curves; repeated labels must be
  separated by blank (standard CTC / merge_repeated semantics).
- impossible alignments (T < |l| + #repeats) yield +inf loss, which the
  training loop's non-finite detection surfaces per-file like the
  reference (train.py:100-102).

TPU-first: the recursion is a scan over T carrying [B, 2L+1] log-alphas;
each step is a constant-shape gather + logaddexp — pure VPU work that XLA
fuses into a tight loop body. Gradients come from autodiff of the forward
(the VJP of logaddexp reproduces the classic alpha-beta gradient without
storing betas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite stand-in for log(0): keeps gradients NaN-free


def _logaddexp(a, b):
    """logaddexp that stays NaN-free at (-inf, -inf) corners."""
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, _NEG_INF)  # both "-inf": avoid inf - inf
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def ctc_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Per-example negative log likelihood.

    logits: [B, T, C] raw (pre-softmax); blank = C-1.
    logit_lengths: [B] valid frames.
    labels: [B, L] int32, zero-padded past label_lengths (padding value is
      irrelevant — masked out of the recursion).
    label_lengths: [B] valid label counts.
    Returns [B] float32 losses.
    """
    batch, t_max, n_class = logits.shape
    l_max = labels.shape[1]
    blank = n_class - 1
    s_max = 2 * l_max + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # Extended sequence: blank, l1, blank, l2, ..., blank  -> [B, 2L+1]
    ext = jnp.full((batch, s_max), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    s_idx = jnp.arange(s_max)
    valid_s = s_idx[None, :] < (2 * label_lengths[:, None] + 1)  # [B, S]

    # Hoist the per-step emission gather out of the scan: one batched
    # gather [B, T, S] (the scan body then is pure elementwise — the
    # per-step take_along_axis dominated the loss cost on TPU otherwise).
    emit_all = jnp.take_along_axis(
        log_probs, ext[:, None, :], axis=2
    )  # [B, T, S]
    emit_all = emit_all.transpose(1, 0, 2)  # [T, B, S] for the scan

    # Transition mask: alpha[s] += alpha[s-2] only when ext[s] is a label
    # differing from ext[s-2] (i.e. not blank and not a repeat).
    ext_shift2 = jnp.concatenate(
        [jnp.full((batch, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    can_skip = (ext != blank) & (ext != ext_shift2)  # [B, S]

    alpha0 = jnp.full((batch, s_max), _NEG_INF, jnp.float32)
    # t=0 starts at s=0 (blank) or s=1 (first label)
    alpha0 = alpha0.at[:, 0].set(emit_all[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, emit_all[0, :, 1], _NEG_INF)
    )
    alpha0 = jnp.where(valid_s, alpha0, _NEG_INF)

    def step(alpha, inp):
        emit, t = inp  # [B, S], scalar
        prev1 = jnp.concatenate(
            [jnp.full((batch, 1), _NEG_INF), alpha[:, :-1]], axis=1
        )
        prev2 = jnp.concatenate(
            [jnp.full((batch, 2), _NEG_INF), alpha[:, :-2]], axis=1
        )
        acc = _logaddexp(alpha, prev1)
        acc = jnp.where(can_skip, _logaddexp(acc, prev2), acc)
        new_alpha = acc + emit
        new_alpha = jnp.where(valid_s, new_alpha, _NEG_INF)
        # frames past an utterance's end leave alpha untouched
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    alpha, _ = jax.lax.scan(
        step, alpha0, (emit_all[1:], jnp.arange(1, t_max))
    )

    # terminal states: last blank (2L) and last label (2L-1)
    end_blank = jnp.take_along_axis(alpha, (2 * label_lengths)[:, None], axis=1)[:, 0]
    end_label_pos = jnp.maximum(2 * label_lengths - 1, 0)
    end_label = jnp.take_along_axis(alpha, end_label_pos[:, None], axis=1)[:, 0]
    end_label = jnp.where(label_lengths > 0, end_label, _NEG_INF)
    ll = _logaddexp(end_blank, end_label)
    loss = -ll
    # map the _NEG_INF sentinel back to a true inf for impossible alignments
    return jnp.where(loss > -0.5 * _NEG_INF, jnp.inf, loss)
