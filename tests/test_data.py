"""Data layer tests: sources (CSV/SDB/tar against reference fixtures),
numpy-vs-jnp frontend parity, feeding/batching, augmentations, VAD."""

import os

import numpy as np
import pytest

from stt_tpu.alphabet import Alphabet
from stt_tpu.data.augmentations import (
    parse_augmentation,
    parse_augmentations,
)
from stt_tpu.data.feeding import create_batches, text_to_char_array
from stt_tpu.data.helpers import float_range, int_range, pick_value_from_range
from stt_tpu.data.sources import (
    CSVSource,
    SDBSource,
    SDBWriter,
    Sample,
    TarSource,
    samples_from_sources,
)
from stt_tpu.data.vad import split_audio_file, vad_split
from stt_tpu.frontend import FeatureConfig, audio_to_mfcc, audio_to_mfcc_numpy

SMOKE = "/root/reference/data/smoke_test"


def english():
    return Alphabet("/root/reference/data/alphabet.txt")


def test_csv_source_reference_fixture():
    src = CSVSource(os.path.join(SMOKE, "ldc93s1.csv"))
    samples = list(src)
    assert len(samples) == 1
    s = samples[0]
    assert s.transcript == "she had your dark suit in greasy wash water all year"
    assert s.rate == 16000
    assert 2.0 < s.duration < 4.0


def test_webdataset_tar_reference_fixture():
    path = os.path.join(SMOKE, "ldc93s1_wds.tar")
    if not os.path.isfile(path):
        pytest.skip("webdataset tar missing")
    samples = list(TarSource(path))
    assert len(samples) >= 1
    assert any("she had your dark suit" in (s.transcript or "") for s in samples)


def test_sdb_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    originals = []
    sdb_path = str(tmp_path / "test.sdb")
    with SDBWriter(sdb_path) as w:
        for i in range(3):
            audio = (rng.randn(1000 + 500 * i) * 0.1).astype(np.float32)
            originals.append(audio)
            w.add(Sample(sample_id=f"s{i}", transcript=f"text {i}",
                         _audio=audio, _rate=16000))
    src = SDBSource(sdb_path)
    assert len(src) == 3
    for i, sample in enumerate(src):
        assert sample.transcript == f"text {i}"
        # int16 quantization tolerance
        np.testing.assert_allclose(sample.audio, originals[i], atol=1 / 32000)


def test_multi_source_interleave(tmp_path):
    csv = os.path.join(SMOKE, "ldc93s1.csv")
    samples = list(samples_from_sources([csv, csv], labeled=True))
    assert len(samples) == 2


def test_numpy_frontend_matches_jnp():
    rng = np.random.RandomState(1)
    audio = (rng.randn(20000) * 0.1).astype(np.float32)
    a = audio_to_mfcc_numpy(audio)
    import jax.numpy as jnp

    b = np.asarray(audio_to_mfcc(jnp.asarray(audio)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_text_to_char_array_errors():
    a = english()
    with pytest.raises(ValueError, match="Missing characters.*Ü"):
        text_to_char_array("Übung", a, context="file.wav")
    with pytest.raises(ValueError, match="empty transcript"):
        text_to_char_array("", a, context="file.wav")


def test_create_batches_padding_and_sorting():
    a = english()
    rng = np.random.RandomState(2)
    samples = [
        Sample(sample_id=f"s{i}", transcript="ab cd"[: 2 + i],
               _audio=(rng.randn(8000 + 4000 * i) * 0.1).astype(np.float32),
               _rate=16000)
        for i in range(5)
    ]
    batches = list(
        create_batches(samples, a, FeatureConfig(), batch_size=2,
                       train_phase=False)
    )
    assert len(batches) == 3  # 2 + 2 + 1
    batch, ids = batches[0]
    assert batch.features.shape[0] == 2
    assert batch.features.shape[1] % 16 == 0
    assert batch.labels.shape[1] % 8 == 0
    # ascending duration across batches
    assert int(batches[0][0].feature_lengths[0]) <= int(
        batches[-1][0].feature_lengths[-1]
    )


def test_async_pipeline_equivalence():
    """num_workers/prefetch featurization yields the same batches as the
    serial path, including augmented training batches (per-sample RNG
    seeding is worker-independent) — VERDICT r2 item 3 gate. Labels,
    lengths and ids must match exactly; features to float tolerance
    (OpenBLAS picks different reduction orders under thread
    contention, ~1e-6 relative)."""
    a = english()
    rng = np.random.RandomState(7)
    samples = [
        Sample(sample_id=f"s{i}", transcript="ab cd ab"[: 3 + i % 5],
               _audio=(rng.randn(6000 + 1500 * i) * 0.1).astype(np.float32),
               _rate=16000)
        for i in range(9)
    ]
    augs = parse_augmentations(
        ["volume[dbfs=-6:0]", "frequency_mask[n=2]", "dropout[rate=0.05]"]
    )

    def run(num_workers, prefetch):
        out = []
        for batch, ids in create_batches(
            list(samples), a, FeatureConfig(), batch_size=4,
            augmentations=augs, train_phase=True, epoch=1, total_epochs=3,
            num_workers=num_workers, prefetch=prefetch,
        ):
            out.append((ids, [np.asarray(x) for x in batch]))
        return out

    serial = run(0, 0)
    parallel = run(4, 2)
    assert len(serial) == len(parallel) > 0
    for (ids_s, arrs_s), (ids_p, arrs_p) in zip(serial, parallel):
        assert ids_s == ids_p
        feats_s, flen_s, labels_s, llen_s = arrs_s
        feats_p, flen_p, labels_p, llen_p = arrs_p
        np.testing.assert_allclose(feats_s, feats_p, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(flen_s, flen_p)
        np.testing.assert_array_equal(labels_s, labels_p)
        np.testing.assert_array_equal(llen_s, llen_p)


def test_async_pipeline_abandoned_consumer():
    """Breaking out of the generator early must not deadlock or leak a
    blocked producer (the trainer's dummy-run probe does exactly this)."""
    a = english()
    rng = np.random.RandomState(8)
    samples = [
        Sample(sample_id=f"s{i}", transcript="ab",
               _audio=(rng.randn(4000) * 0.1).astype(np.float32),
               _rate=16000)
        for i in range(12)
    ]
    gen = create_batches(
        list(samples), a, FeatureConfig(), batch_size=2,
        num_workers=3, prefetch=2,
    )
    next(gen)
    gen.close()  # must return promptly


def test_async_pipeline_propagates_errors():
    a = english()
    samples = [
        Sample(sample_id="bad", transcript="§§",  # unencodable
               _audio=np.zeros(4000, np.float32), _rate=16000)
    ]
    with pytest.raises(ValueError, match="Alphabet cannot encode"):
        list(
            create_batches(
                samples, a, FeatureConfig(), batch_size=1,
                num_workers=2, prefetch=2,
            )
        )


def test_value_range_parsing():
    assert float_range("1.5") == (1.5, 1.5, 0.0)
    assert float_range("0.8:1.2~0.1") == (0.8, 1.2, 0.1)
    assert int_range("3~1") == (3, 3, 1)
    vr = float_range("0:1")
    assert pick_value_from_range(vr, clock=0.0) == pytest.approx(0.0)
    assert pick_value_from_range(vr, clock=1.0) == pytest.approx(1.0)


def test_augmentation_spec_parser():
    aug = parse_augmentation("reverb[p=0.5,delay=30.0,decay=5.0]")
    assert aug.probability == 0.5
    assert aug.delay == (30.0, 30.0, 0.0)
    augs = parse_augmentations(["volume", "time_mask[n=2,size=20.0]"])
    assert len(augs) == 2
    with pytest.raises(ValueError):
        parse_augmentation("not_an_augmentation[x=1]")


def test_sample_augmentations_run():
    rng = np.random.RandomState(3)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    for spec in ["volume[dbfs=-6]", "reverb[delay=20,decay=10]",
                 "resample[rate=8000]"]:
        aug = parse_augmentation(spec)
        s = Sample(sample_id="x", transcript="t", _audio=audio.copy(), _rate=16000)
        aug.apply(s, clock=0.5)
        assert s.audio.shape == audio.shape or spec.startswith("resample")
        assert np.isfinite(s.audio).all()
        assert np.abs(s.audio - audio).max() > 1e-6


def test_graph_augmentations_run():
    rng = np.random.RandomState(4)
    spec = np.abs(rng.randn(50, 257)).astype(np.float32)
    feats = rng.randn(50, 26).astype(np.float32)
    import random

    r = random.Random(0)
    for name, tensor in [
        ("pitch[pitch=1.1]", spec),
        ("tempo[factor=1.2]", spec),
        ("warp[num_t=2,num_f=2,warp_t=0.2]", spec),
        ("frequency_mask[n=2,size=5]", spec),
        ("time_mask[n=2,size=40.0]", spec),
        ("dropout[rate=0.1]", feats),
        ("add[stddev=1]", feats),
        ("multiply[stddev=0.1]", feats),
    ]:
        aug = parse_augmentation(name)
        out = aug.apply(tensor, clock=0.5, rng=r)
        assert np.isfinite(out).all(), name
        if name.startswith(("frequency_mask", "time_mask", "dropout")):
            assert (out == 0).sum() > 0, name


def test_feeding_with_augmentation_smoke():
    a = english()
    rng = np.random.RandomState(5)
    samples = [
        Sample(sample_id="s", transcript="hello",
               _audio=(rng.randn(16000) * 0.1).astype(np.float32), _rate=16000)
    ]
    augs = parse_augmentations(
        ["volume[dbfs=-3]", "frequency_mask[n=1,size=3]", "add[stddev=0.1]"]
    )
    [(batch, ids)] = list(
        create_batches(samples, a, batch_size=1, augmentations=augs,
                       train_phase=True)
    )
    assert np.isfinite(np.asarray(batch.features)).all()


def test_vad_split_detects_speech_islands():
    rng = np.random.RandomState(6)
    rate = 16000
    silence = np.zeros(rate, np.float32)
    speech = (np.sin(2 * np.pi * 440 * np.arange(rate) / rate) * 0.3).astype(
        np.float32
    ) * (1 + 0.3 * rng.randn(rate).astype(np.float32))
    audio = np.concatenate([silence, speech, silence, speech, silence])
    segments = list(vad_split(audio, rate))
    assert 1 <= len(segments) <= 3
    for seg, start, end in segments:
        assert end > start
        # each segment should overlap a speech island
        assert np.abs(seg).max() > 0.05


def test_split_audio_file_batches():
    rate = 16000
    speech = (np.sin(2 * np.pi * 300 * np.arange(rate) / rate) * 0.3).astype(
        np.float32
    )
    audio = np.concatenate(
        [np.zeros(rate, np.float32), speech, np.zeros(rate, np.float32)]
    )
    batches = list(split_audio_file(audio, rate, batch_size=4))
    assert len(batches) >= 1
    for batch in batches:
        for start, end, seg in batch:
            assert len(seg) > 0


def test_device_featurize_batches_match_host_features():
    """Raw-audio batches + on-device MFCC equal the host-featurized
    batches (the device/host frontend twins are parity-gated in
    test_frontend; this gates the batch plumbing: padding so the device
    frontend yields exactly the padded frame count, true frame lengths,
    labels)."""
    import jax

    from stt_tpu.alphabet import Alphabet
    from stt_tpu.data.feeding import create_batches
    from stt_tpu.frontend import FeatureConfig, audio_to_mfcc

    alphabet = Alphabet(os.path.join(SMOKE, "../alphabet.txt"))
    fc = FeatureConfig()
    csv = os.path.join(SMOKE, "ldc93s1.csv")
    [(hb, hids)] = list(
        create_batches([csv], alphabet, fc, batch_size=1)
    )
    [(ab, aids)] = list(
        create_batches([csv], alphabet, fc, batch_size=1,
                       device_featurize=True)
    )
    assert hids == aids
    assert ab.features.ndim == 2  # raw audio
    np.testing.assert_array_equal(
        np.asarray(hb.feature_lengths), np.asarray(ab.feature_lengths)
    )
    np.testing.assert_array_equal(
        np.asarray(hb.labels), np.asarray(ab.labels)
    )
    feats = jax.jit(lambda a: audio_to_mfcc(a, fc))(ab.features)
    t = int(ab.feature_lengths[0])
    np.testing.assert_allclose(
        np.asarray(feats)[0, :t],
        np.asarray(hb.features)[0, :t],
        rtol=1e-4, atol=1e-4,
    )
    # padded frame count is exactly the rounded-up bucket
    assert feats.shape[1] == hb.features.shape[1]


def test_trainer_device_featurize_smoke(tmp_path):
    """--device_featurize end to end through the real trainer CLI."""
    from stt_tpu.config import initialize_globals_from_cli
    from stt_tpu.train.trainer import train

    config = initialize_globals_from_cli([
        "--train_files", os.path.join(SMOKE, "ldc93s1.csv"),
        "--alphabet_config_path",
        os.path.join(SMOKE, "../alphabet.txt"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--n_hidden", "32", "--epochs", "2", "--train_batch_size", "1",
        "--learning_rate", "0.001", "--device_featurize",
    ])
    state = train(config)
    # dummy-run OOM probe contributes one extra step before epoch 0
    assert int(state.step) >= 2
