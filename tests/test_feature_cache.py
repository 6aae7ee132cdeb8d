"""Feature cache (--feature_cache / --cache_for_epochs parity,
reference util/feeding.py:223-224 + train.py:467-474): fill on epoch 0,
serve identical batches from disk on later epochs, invalidate on the
cache_for_epochs schedule."""

import os

import numpy as np
import pytest

from stt_tpu.alphabet import Alphabet
from stt_tpu.data.feature_cache import FeatureCache
from stt_tpu.data.feeding import create_batches
from stt_tpu.frontend import FeatureConfig

SMOKE = "/root/reference/data/smoke_test"
CSV = os.path.join(SMOKE, "ldc93s1.csv")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(CSV), reason="smoke data missing"
)


def english():
    return Alphabet("/root/reference/data/alphabet.txt")


def collect(**kw):
    out = []
    for batch, ids in create_batches(
        [CSV], english(), FeatureConfig(), batch_size=1, **kw
    ):
        out.append((np.asarray(batch.features), np.asarray(batch.labels),
                    np.asarray(batch.feature_lengths)))
    return out


def test_ram_cache_roundtrip_identical_batches():
    cache = FeatureCache()
    first = collect(train_phase=True, epoch=0, total_epochs=3,
                    feature_cache=cache)
    assert cache.complete
    second = collect(train_phase=True, epoch=1, total_epochs=3,
                     feature_cache=cache)
    for (f1, l1, n1), (f2, l2, n2) in zip(first, second):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(n1, n2)


def test_disk_cache_persists_across_instances(tmp_path):
    path = str(tmp_path / "feats.cache")
    cache = FeatureCache(path)
    first = collect(train_phase=False, feature_cache=cache)
    assert os.path.isfile(path)

    reloaded = FeatureCache(path)
    assert reloaded.complete
    hit = reloaded.get(0)
    assert hit is not None
    feats, labels = hit
    np.testing.assert_array_equal(feats, first[0][0][0][: feats.shape[0]])
    again = collect(train_phase=False, feature_cache=reloaded)
    for (f1, l1, _), (f2, l2, _) in zip(first, again):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)


def test_cache_for_epochs_invalidation(tmp_path):
    path = str(tmp_path / "feats.cache")
    cache = FeatureCache(path, cache_for_epochs=2)
    collect(train_phase=False, feature_cache=cache)
    assert cache.complete
    assert not cache.maybe_invalidate(1)
    assert cache.complete
    assert cache.maybe_invalidate(2)  # reference train.py:471
    assert not cache.complete
    assert not os.path.isfile(path)
    assert cache.get(0) is None


def test_partial_fill_keeps_accepting(tmp_path):
    cache = FeatureCache(str(tmp_path / "feats.cache"))
    cache.put(3, np.zeros((4, 26), np.float32), np.zeros((2,), np.int32))
    cache.finalize(10)  # incomplete: row 0-2,4-9 missing
    assert not cache.complete
    assert cache.get(3) is not None
    cache.put(0, np.ones((2, 26), np.float32), np.ones((1,), np.int32))
    assert cache.get(0) is not None


def test_dummy_run_does_not_poison_cache():
    """The reversed/limited OOM dummy run keys rows differently — the
    cache must be bypassed there."""
    cache = FeatureCache()
    collect(train_phase=True, epoch=0, total_epochs=1, reverse=True,
            limit=1, feature_cache=cache)
    assert not cache.complete
    assert cache.get(0) is None
