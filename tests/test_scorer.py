"""KenLM reader + .scorer package tests against the reference artifacts
in data/smoke_test/ (golden scores from the kenlm query tool)."""

import math
import os

import numpy as np
import pytest

from stt_tpu.alphabet import Alphabet, UTF8Alphabet

SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"
BYTES_SCORER = "/root/reference/data/smoke_test/pruned_lm.bytes.scorer"


@pytest.fixture(scope="module")
def scorer():
    if not os.path.isfile(SCORER):
        pytest.skip("smoke scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    return KenLMScorer(SCORER)


def test_package_metadata(scorer):
    assert scorer.get_max_order() == 4
    assert not scorer.is_utf8_mode()
    assert scorer.alpha == pytest.approx(0.75)
    assert scorer.beta == pytest.approx(1.85, abs=1e-6)


def test_lm_scores_match_kenlm_query(scorer):
    """Golden values produced by the kenlm `query` tool on this model:
    she=-2.1612275 had=-0.42129627 your=-2.047569 dark=-1.1401069
    suit=-0.8885756 </s>=-1.6090438 (log10)."""
    golden = [-2.1612275, -0.42129627, -2.047569, -1.1401069, -0.8885756]
    total, scores = scorer.lm.score_sentence(
        "she had your dark suit".split(), bos=True, eos=False
    )
    np.testing.assert_allclose(scores, golden, rtol=1e-5)
    eos_total, eos_scores = scorer.lm.score_sentence(
        "she had your dark suit".split(), bos=True, eos=True
    )
    assert eos_scores[-1] == pytest.approx(-1.6090438, rel=1e-5)
    assert eos_total == pytest.approx(-8.267819, rel=1e-5)


def test_cond_prob_natural_log(scorer):
    p10 = scorer.lm.score(
        [scorer.lm.vocab_index(w) for w in ["she", "had", "your", "dark"]],
        scorer.lm.vocab_index("suit"),
    )
    ln = scorer.get_log_cond_prob(["she", "had", "your", "dark", "suit"], bos=False)
    assert ln == pytest.approx(p10 / math.log10(math.e), rel=1e-6)


def test_oov_score(scorer):
    from stt_tpu.decode.scorer import OOV_SCORE

    assert scorer.get_log_cond_prob(["zzzzqq"], bos=True) == OOV_SCORE
    assert scorer.get_log_cond_prob(["she", "zzzzqq"], bos=True) == OOV_SCORE


def test_fst_dictionary_walk(scorer):
    a = Alphabet("/root/reference/data/alphabet.txt")
    d = scorer.dictionary
    st = d.start
    for ch in "she":
        st = d.step(st, a.encode_single(ch))
        assert st is not None
    # completing the word via space resets to start
    assert d.step(st, a.space_index) == d.start
    # nonsense path is pruned within a few characters
    st = d.start
    for ch in "qqqq":
        st = d.step(st, a.encode_single(ch))
        if st is None:
            break
    assert st is None


def test_fst_vocabulary_enumeration(scorer):
    a = Alphabet("/root/reference/data/alphabet.txt")
    words = set(scorer.dictionary.words(a))
    for w in "she had your dark suit in greasy wash water all year".split():
        assert w in words
    assert len(words) > 100


def test_bytes_scorer_utf8_mode():
    if not os.path.isfile(BYTES_SCORER):
        pytest.skip("bytes scorer missing")
    from stt_tpu.decode.scorer_package import KenLMScorer

    s = KenLMScorer(BYTES_SCORER)
    assert s.is_utf8_mode()
    assert s.get_max_order() >= 1
    assert s.dictionary.num_states > 0


def test_invalid_scorer_rejected(tmp_path):
    from stt_tpu.decode.scorer_package import KenLMScorer

    bad = tmp_path / "bad.scorer"
    bad.write_bytes(b"not a scorer at all")
    with pytest.raises(ValueError):
        KenLMScorer(str(bad))
