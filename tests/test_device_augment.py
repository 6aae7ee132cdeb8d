"""On-device graph augmentation tests (data/device_augment.py):
the jnp batched transforms must reproduce the numpy host transforms on
the SAME drawn parameters (VERDICT r2 item 6 gate)."""

import numpy as np
import pytest

from stt_tpu.data.augmentations import (
    Add,
    Dropout,
    FrequencyMask,
    Multiply,
    Pitch,
    Tempo,
    TimeMask,
    Warp,
)
from stt_tpu.data.device_augment import DeviceAugmentPipeline
from stt_tpu.frontend import FeatureConfig, mfcc_from_spectrogram_numpy

FC = FeatureConfig()
F = FC.n_bins


def make_batch(lens, width, seed=0):
    rng = np.random.RandomState(seed)
    t_max = ((max(lens) + 15) // 16) * 16
    batch = np.zeros((len(lens), t_max, width), np.float32)
    specs = []
    for i, l in enumerate(lens):
        s = np.abs(rng.randn(l, width)).astype(np.float32)
        specs.append(s)
        batch[i, :l] = s
    return specs, batch


def unpad_params(aug, row):
    """Stacked+padded device params row -> the host transform's params."""
    if isinstance(aug, (FrequencyMask, TimeMask)):
        keep = row["sizes"] > 0
        return {"starts": row["starts"][keep], "sizes": row["sizes"][keep]}
    if isinstance(aug, Warp):
        ht, wt = row["dims_t"]
        hf, wf = row["dims_f"]
        return {
            "grid_t": row["grid_t"][:ht, :wt],
            "grid_f": row["grid_f"][:hf, :wf],
        }
    return {k: v for k, v in row.items()}


def host_chain(pipeline, spec, length, drawn):
    """Apply the chain the host way on one unpadded sample."""
    x = spec[:length]
    idx = 0
    for aug, _ in pipeline.chain:
        active, _ = drawn[idx]
        if aug.domain == "spectrogram" and active:
            row = {
                k: v for k, v in drawn[idx][1].items()
            }
            x = aug.transform(x, unpad_params(aug, row))
        idx += 1
    feats = mfcc_from_spectrogram_numpy(np.maximum(x, 0.0), FC)
    idx = 0
    for aug, _ in pipeline.chain:
        active, _ = drawn[idx]
        if aug.domain == "features" and active:
            feats = aug.transform(feats, unpad_params(aug, drawn[idx][1]))
        idx += 1
    return feats


@pytest.mark.parametrize(
    "augs",
    [
        [Pitch(p=1.0, pitch="0.8:1.2")],
        [Tempo(p=1.0, factor="0.9:1.3")],
        [Warp(p=1.0, num_t=2, num_f=2, warp_t=0.2, warp_f=0.1)],
        [FrequencyMask(p=1.0, n=3, size=5)],
        [TimeMask(p=1.0, n=2, size=60.0)],
        [TimeMask(p=1.0, domain="features", n=2, size=40.0)],
        [
            Pitch(p=1.0, pitch="0.9:1.1"),
            Tempo(p=1.0, factor="0.95:1.2"),
            FrequencyMask(p=1.0, n=2, size=4),
            TimeMask(p=1.0, domain="features", n=1, size=40.0),
        ],
        [Pitch(p=0.5, pitch="1.1")],  # probability gate: some rows inactive
    ],
)
def test_device_matches_host_on_same_params(augs):
    pipeline = DeviceAugmentPipeline(augs, FC)
    lens = [40, 25, 33, 48]
    specs, batch = make_batch(lens, F, seed=3)
    clocks = [0.1 * (i + 1) for i in range(len(lens))]
    ids = [f"s{i}" for i in range(len(lens))]

    per_sample = [
        pipeline.draw_sample(ids[i], lens[i], clocks[i])
        for i in range(len(lens))
    ]
    params = pipeline.stack(per_sample)
    feats, new_lens = pipeline.jitted()(batch, np.asarray(lens), params)
    feats, new_lens = np.asarray(feats), np.asarray(new_lens)

    for i in range(len(lens)):
        expect = host_chain(pipeline, specs[i], lens[i], per_sample[i])
        got = feats[i, : new_lens[i]]
        assert new_lens[i] == expect.shape[0], (
            new_lens[i], expect.shape, augs,
        )
        np.testing.assert_allclose(
            got, expect, rtol=2e-3, atol=2e-3,
        )
        # padding rows are exact zeros
        assert not feats[i, new_lens[i] :].any()


def test_random_family_statistics():
    """Dropout/Add/Multiply use jax PRNG (distributional twins of the
    numpy transforms): deterministic per seed, right moments."""
    augs = [Dropout(p=1.0, domain="features", rate=0.25)]
    pipeline = DeviceAugmentPipeline(augs, FC)
    lens = [200, 180]
    specs, batch = make_batch(lens, FC.n_bins, seed=5)
    ids, clocks = ["a", "b"], [0.2, 0.4]
    params = pipeline.draw(ids, lens, clocks)
    run = pipeline.jitted()
    f1, _ = run(batch, np.asarray(lens), params)
    f2, _ = run(batch, np.asarray(lens), params)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    # ~25% of entries zeroed
    feats = np.asarray(f1)[0, : lens[0]]
    frac = (feats == 0.0).mean()
    assert 0.15 < frac < 0.35, frac

    augs = [Add(p=1.0, domain="features", stddev=2.0)]
    pipeline = DeviceAugmentPipeline(augs, FC)
    params = pipeline.draw(ids, lens, clocks)
    base, _ = DeviceAugmentPipeline([], FC), None
    clean = mfcc_from_spectrogram_numpy(specs[0], FC)
    noised = np.asarray(
        pipeline.jitted()(batch, np.asarray(lens), params)[0]
    )[0, : lens[0]]
    delta = noised - clean
    assert 1.5 < delta.std() < 2.5, delta.std()

    augs = [Multiply(p=1.0, domain="features", stddev=0.1)]
    pipeline = DeviceAugmentPipeline(augs, FC)
    params = pipeline.draw(ids, lens, clocks)
    mult = np.asarray(
        pipeline.jitted()(batch, np.asarray(lens), params)[0]
    )[0, : lens[0]]
    ratio = mult / np.where(np.abs(clean) < 1e-6, 1.0, clean)
    assert abs(np.median(ratio) - 1.0) < 0.05


def test_trainer_graph_augs_on_device():
    """--graph_augs_on_device: the trainer consumes spectrogram batches
    plus drawn params and runs the augment+MFCC chain on device; smoke
    training stays finite and steps advance."""
    import os

    csv = "/root/reference/data/smoke_test/ldc93s1.csv"
    if not os.path.isfile(csv):
        pytest.skip("smoke csv missing")
    import jax

    from stt_tpu.config import SttConfig
    from stt_tpu.train.trainer import train

    config = SttConfig(
        train_files=[csv],
        alphabet_config_path="/root/reference/data/alphabet.txt",
        n_hidden=32,
        epochs=2,
        train_batch_size=1,
        dropout_rate=0.0,
        learning_rate=0.001,
        augment=[
            "tempo[factor=0.95:1.05]",
            "frequency_mask[n=2,size=3]",
            "dropout[domain=features,rate=0.02]",
        ],
        graph_augs_on_device=True,
        input_workers=2,
        prefetch_batches=1,
    )
    state = train(config)
    # dummy run + 2 epochs x 1 batch
    assert int(jax.device_get(state.step)) == 3


def test_no_augs_is_plain_mfcc():
    pipeline = DeviceAugmentPipeline([], FC)
    lens = [30, 22]
    specs, batch = make_batch(lens, F, seed=9)
    feats, new_lens = pipeline.jitted()(batch, np.asarray(lens), [])
    feats = np.asarray(feats)
    for i, l in enumerate(lens):
        expect = mfcc_from_spectrogram_numpy(specs[i], FC)
        np.testing.assert_allclose(
            feats[i, :l], expect, rtol=2e-3, atol=2e-3
        )
        assert not feats[i, l:].any()
