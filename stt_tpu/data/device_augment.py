"""On-device graph augmentations: the jnp twins of the GraphAugmentation
transforms, batched over padded [B, T, F] tensors inside one jitted
program.

The reference applies pitch/tempo/warp/masks/noise inside the TF graph
(util/augmentations.py:485-769). Here the split is TPU-native:

- parameter DRAWING stays on the host (cheap python rng per sample,
  identical draws to the numpy path: each GraphAugmentation's
  ``draw_params``), so device results match the host transforms on the
  same parameters — gated by tests/test_device_augment.py;
- the tensor TRANSFORMS run on device with static shapes: every
  size-changing op (tempo stretch, pitch squeeze, warp-grid resize)
  becomes a gather-style interpolation where sizes are dynamic VALUES
  over fixed [B, T, F] buffers, so the augmented train step compiles
  exactly once per padded geometry;
- the random-mask family (dropout/add/multiply) uses jax PRNG streams
  keyed by the host-drawn per-sample seeds — distributionally identical
  to the numpy twins (bitwise parity is impossible across RNG engines),
  deterministic given the seed.

Sequence semantics mirror the host pipeline: spectrogram-domain augs in
spec order on the power spectrogram, then the MFCC projection
(frontend.mfcc_from_spectrogram), then features-domain augs. Signal-
domain graph augs act on raw audio before framing and stay on the host.

One documented divergence: a tempo stretch (factor < 1) can lengthen a
sample past the padded T; the device path clips to T (the host path
grows the tensor). pad_time_to rounding gives headroom; heavy stretch
specs should raise pad_time_to.
"""

from __future__ import annotations

import random as _random
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from stt_tpu.data.augmentations import (
    Add,
    Dropout,
    FrequencyMask,
    GraphAugmentation,
    Multiply,
    Pitch,
    Tempo,
    TimeMask,
    Warp,
)
from stt_tpu.frontend import FeatureConfig, mfcc_from_spectrogram

MAX_MASKS = 16  # static bound on n per mask augmentation
MAX_GRID = 12  # static bound on a warp flow grid side (num+2 <= MAX_GRID)


# --------------------------------------------------------------------------
# per-sample jnp transforms (vmapped over the batch by apply_batched)
# --------------------------------------------------------------------------


def _interp_time(x, src_len, dst_len):
    """Resize rows [0, src_len) onto rows [0, dst_len) of the same
    fixed-height buffer (host _bilinear_resize semantics: sample i maps
    to y = i * src_len / dst_len). Rows >= dst_len zero."""
    t = x.shape[0]
    i = jnp.arange(t)
    ys = i * (src_len / dst_len)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, src_len - 1)
    y1 = jnp.clip(y0 + 1, 0, src_len - 1)
    wy = (ys - y0)[:, None]
    out = x[y0] * (1 - wy) + x[y1] * wy
    return jnp.where((i < dst_len)[:, None], out, 0.0)


def _pitch_one(spec, length, pitch):
    f = spec.shape[1]
    new_f = jnp.maximum(1, jnp.floor(f * pitch)).astype(jnp.int32)
    j = jnp.arange(f)
    xs = j * (f / new_f)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, f - 1)
    x1 = jnp.clip(x0 + 1, 0, f - 1)
    wx = xs - x0
    out = spec[:, x0] * (1 - wx)[None, :] + spec[:, x1] * wx[None, :]
    out = jnp.where((j < new_f)[None, :], out, 0.0)
    # padding rows stay zero
    return jnp.where(
        (jnp.arange(spec.shape[0]) < length)[:, None], out, 0.0
    ), length


def _tempo_one(spec, length, factor):
    t = spec.shape[0]
    new_len = jnp.maximum(
        1, jnp.floor(length / factor)
    ).astype(jnp.int32)
    new_len = jnp.minimum(new_len, t)  # clip to the padded buffer
    return _interp_time(spec, length, new_len), new_len


def _warp_one(spec, length, grid_t, grid_f, dims_t, dims_f):
    """dims_* = (rows, cols) actually valid in each padded flow grid."""
    t, f = spec.shape

    def flow_field(grid, gh, gw):
        ys = jnp.arange(t) * (gh / jnp.maximum(length, 1))
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, gh - 1)
        y1 = jnp.clip(y0 + 1, 0, gh - 1)
        wy = (ys - y0)[:, None]
        xs = jnp.arange(f) * (gw / f)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, gw - 1)
        x1 = jnp.clip(x0 + 1, 0, gw - 1)
        wx = (xs - x0)[None, :]
        top = grid[y0][:, x0] * (1 - wx) + grid[y0][:, x1] * wx
        bot = grid[y1][:, x0] * (1 - wx) + grid[y1][:, x1] * wx
        return top * (1 - wy) + bot * wy

    flow_t = flow_field(grid_t, dims_t[0], dims_t[1])
    flow_f = flow_field(grid_f, dims_f[0], dims_f[1])
    ys = jnp.clip(
        jnp.arange(t)[:, None] - flow_t, 0, jnp.maximum(length - 1, 0)
    )
    xs = jnp.clip(jnp.arange(f)[None, :] - flow_f, 0, f - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, jnp.maximum(length - 1, 0))
    x1 = jnp.clip(x0 + 1, 0, f - 1)
    wy, wx = ys - y0, xs - x0
    out = (
        spec[y0, x0] * (1 - wy) * (1 - wx)
        + spec[y0, x1] * (1 - wy) * wx
        + spec[y1, x0] * wy * (1 - wx)
        + spec[y1, x1] * wy * wx
    )
    return jnp.where(
        (jnp.arange(t) < length)[:, None], out, 0.0
    ), length


def _freq_mask_one(spec, length, starts, sizes):
    j = jnp.arange(spec.shape[1])
    masked = jnp.any(
        (j[None, :] >= starts[:, None])
        & (j[None, :] < (starts + sizes)[:, None]),
        axis=0,
    )
    return jnp.where(masked[None, :], 0.0, spec), length


def _time_mask_one(spec, length, starts, sizes):
    i = jnp.arange(spec.shape[0])
    masked = jnp.any(
        (i[None, :] >= starts[:, None])
        & (i[None, :] < (starts + sizes)[:, None]),
        axis=0,
    )
    return jnp.where(masked[:, None], 0.0, spec), length


def _dropout_one(spec, length, rate, seed):
    key = jax.random.PRNGKey(seed)
    keep = jax.random.uniform(key, spec.shape) >= rate
    return spec * keep, length


def _add_one(spec, length, stddev, seed):
    key = jax.random.PRNGKey(seed)
    noise = jnp.abs(stddev) * jax.random.normal(key, spec.shape)
    out = spec + noise
    return jnp.where(
        (jnp.arange(spec.shape[0]) < length)[:, None], out, 0.0
    ), length


def _multiply_one(spec, length, stddev, seed):
    key = jax.random.PRNGKey(seed)
    noise = 1.0 + jnp.abs(stddev) * jax.random.normal(key, spec.shape)
    return spec * noise, length


# --------------------------------------------------------------------------
# host-side parameter drawing + batched application
# --------------------------------------------------------------------------


def _pad_masks(starts: np.ndarray, sizes: np.ndarray):
    s = np.zeros((MAX_MASKS,), np.int32)
    z = np.zeros((MAX_MASKS,), np.int32)
    n = min(len(starts), MAX_MASKS)
    s[:n] = starts[:n]
    z[:n] = sizes[:n]
    return s, z


def _pad_grid(grid: np.ndarray):
    g = np.zeros((MAX_GRID, MAX_GRID), np.float32)
    h, w = min(grid.shape[0], MAX_GRID), min(grid.shape[1], MAX_GRID)
    g[:h, :w] = grid[:h, :w]
    return g, np.asarray([h, w], np.int32)


class DeviceAugmentPipeline:
    """Drives the spectrogram->features augmentation chain on device.

    Host per sample: decide activation (p gate) and draw each aug's
    parameters with the class's own draw_params (the numpy twins use the
    same method — equivalence by construction). Device: one jitted
    program applies the whole chain + the MFCC projection over the
    padded batch.
    """

    def __init__(
        self,
        augmentations: Sequence[GraphAugmentation],
        feature_config: FeatureConfig = FeatureConfig(),
    ):
        self.feature_config = feature_config
        self.spec_augs: List[GraphAugmentation] = []
        self.feat_augs: List[GraphAugmentation] = []
        for aug in augmentations:
            if not isinstance(aug, GraphAugmentation):
                continue
            if aug.domain == "spectrogram":
                self.spec_augs.append(aug)
            elif aug.domain == "features":
                self.feat_augs.append(aug)
        self._apply = None

    def has_work(self) -> bool:
        return bool(self.spec_augs or self.feat_augs)

    # -- drawing ---------------------------------------------------------

    def _draw_one(self, aug, shape, clock, rng) -> Tuple[bool, dict]:
        active = rng.random() < aug.probability
        params = aug.draw_params(shape, clock=clock, rng=rng)
        if isinstance(aug, (FrequencyMask, TimeMask)):
            starts, sizes = _pad_masks(params["starts"], params["sizes"])
            return active, {"starts": starts, "sizes": sizes}
        if isinstance(aug, Warp):
            gt, dt = _pad_grid(params["grid_t"])
            gf, df = _pad_grid(params["grid_f"])
            return active, {
                "grid_t": gt, "dims_t": dt, "grid_f": gf, "dims_f": df,
            }
        if isinstance(aug, Pitch):
            return active, {"pitch": np.float32(params["pitch"])}
        if isinstance(aug, Tempo):
            return active, {"factor": np.float32(params["factor"])}
        if isinstance(aug, Dropout):
            return active, {
                "rate": np.float32(params["rate"]),
                "seed": np.int32(params["seed"] & 0x7FFFFFFF),
            }
        if isinstance(aug, (Add, Multiply)):
            return active, {
                "stddev": np.float32(params["stddev"]),
                "seed": np.int32(params["seed"] & 0x7FFFFFFF),
            }
        raise NotImplementedError(type(aug).__name__)

    @property
    def chain(self):
        fc = self.feature_config
        return [(aug, fc.n_bins) for aug in self.spec_augs] + [
            (aug, fc.n_mfcc) for aug in self.feat_augs
        ]

    def draw_sample(self, sample_id, length, clock) -> List[Tuple[bool, dict]]:
        """Draw the whole chain's parameters for one sample (called from
        the featurize workers; deterministic per (sample_id, clock))."""
        rng = _random.Random(
            hash((sample_id, round(float(clock), 6), "device_aug"))
        )
        cur = int(length)
        out: List[Tuple[bool, dict]] = []
        for aug, width in self.chain:
            a, p = self._draw_one(aug, (cur, width), clock, rng)
            if a and isinstance(aug, Tempo):
                cur = min(aug.new_time(cur, float(p["factor"])), 1 << 30)
            out.append((a, p))
        return out

    def stack(self, per_sample: List[List[Tuple[bool, dict]]]) -> List[dict]:
        """[B] lists of per-aug (active, params) -> per-aug batch dicts."""
        out: List[dict] = []
        for j in range(len(self.chain)):
            rows = [s[j][1] for s in per_sample]
            stacked = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
            stacked["active"] = np.asarray(
                [s[j][0] for s in per_sample], bool
            )
            out.append(stacked)
        return out

    def draw(self, sample_ids, lengths, clocks) -> List[dict]:
        """Per-batch parameter pytree: one dict per augmentation (in
        chain order, spectrogram then features), each value stacked over
        the batch, plus an 'active' [B] bool array."""
        return self.stack(
            [
                self.draw_sample(sid, l, c)
                for sid, l, c in zip(sample_ids, lengths, clocks)
            ]
        )

    # -- device application ----------------------------------------------

    def _apply_aug_batched(self, aug, x, lens, p):
        def one(spec, length, row_params, active):
            if isinstance(aug, Pitch):
                y, l2 = _pitch_one(spec, length, row_params["pitch"])
            elif isinstance(aug, Tempo):
                y, l2 = _tempo_one(spec, length, row_params["factor"])
            elif isinstance(aug, Warp):
                y, l2 = _warp_one(
                    spec, length, row_params["grid_t"],
                    row_params["grid_f"], row_params["dims_t"],
                    row_params["dims_f"],
                )
            elif isinstance(aug, FrequencyMask):
                y, l2 = _freq_mask_one(
                    spec, length, row_params["starts"], row_params["sizes"]
                )
            elif isinstance(aug, TimeMask):
                y, l2 = _time_mask_one(
                    spec, length, row_params["starts"], row_params["sizes"]
                )
            elif isinstance(aug, Dropout):
                y, l2 = _dropout_one(
                    spec, length, row_params["rate"], row_params["seed"]
                )
            elif isinstance(aug, Add):
                y, l2 = _add_one(
                    spec, length, row_params["stddev"], row_params["seed"]
                )
            elif isinstance(aug, Multiply):
                y, l2 = _multiply_one(
                    spec, length, row_params["stddev"], row_params["seed"]
                )
            else:
                raise NotImplementedError(type(aug).__name__)
            return (
                jnp.where(active, y, spec),
                jnp.where(active, l2, length),
            )

        row = {k: v for k, v in p.items() if k != "active"}
        return jax.vmap(one)(x, lens, row, p["active"])

    def apply(self, spec_batch, lengths, params: List[dict]):
        """[B, T, n_bins] power spectrograms (+ lengths) -> augmented
        [B, T, n_mfcc] features (+ new lengths). Pure jax; callers jit
        it (the trainer wraps it in one compiled program)."""
        x = jnp.asarray(spec_batch)
        lens = jnp.asarray(lengths, jnp.int32)
        i = 0
        for aug in self.spec_augs:
            x, lens = self._apply_aug_batched(aug, x, lens, params[i])
            i += 1
        # the host pipeline clamps augmented spectrograms to >= 0 before
        # the MFCC projection (feeding.featurize_sample)
        x = jnp.maximum(x, 0.0)
        feats = mfcc_from_spectrogram(x, self.feature_config)
        # masked rows must stay zero features, not mfcc(0-spectrum)
        t = feats.shape[1]
        feats = jnp.where(
            (jnp.arange(t)[None, :] < lens[:, None])[..., None], feats, 0.0
        )
        for aug in self.feat_augs:
            feats, lens = self._apply_aug_batched(aug, feats, lens, params[i])
            i += 1
        return feats, lens

    def jitted(self):
        if self._apply is None:
            self._apply = jax.jit(self.apply)
        return self._apply
