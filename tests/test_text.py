from stt_tpu.text import cer, levenshtein, wer, wer_cer_batch


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein(["a", "b"], ["b"]) == 1


def test_wer_cer():
    ref = "she had your dark suit"
    assert wer(ref, ref) == 0.0
    assert cer(ref, ref) == 0.0
    assert wer(ref, "she had your dark suits") == 1 / 5
    assert wer("a b c d", "a b") == 0.5


def test_batch_aggregation():
    refs = ["a b", "c d e f"]
    hyps = ["a b", "c d e x"]
    w, c = wer_cer_batch(refs, hyps)
    assert w == 1 / 6
    assert c == 1 / 10


def test_empty_ref_guard():
    assert wer("", "something") >= 0
