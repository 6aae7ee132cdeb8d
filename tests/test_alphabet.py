"""Alphabet tests — mirrors the reference's tests/test_text.py coverage
(encode/decode, cross-platform line endings) plus binary round-trip."""

import os

import pytest

from stt_tpu.alphabet import Alphabet, UTF8Alphabet, make_alphabet

ENGLISH_LABELS = [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["'"]


def make_english():
    return Alphabet().init_from_labels(ENGLISH_LABELS)


def test_sizes_and_space():
    a = make_english()
    assert a.size == 28
    assert a.blank_index == 28
    assert a.space_index == 0
    assert a.is_space(0)
    assert not a.is_space(1)


def test_encode_decode_roundtrip():
    a = make_english()
    text = "she had your dark suit"
    assert a.decode(a.encode(text)) == text
    assert a.encode("a") == [1]
    assert a.decode_single(27) == "'"


def test_can_encode():
    a = make_english()
    assert a.can_encode("hello world")
    assert not a.can_encode("Hello")
    assert not a.can_encode_single("0")


@pytest.mark.parametrize("ending", ["\n", "\r\n", "\r"])
def test_line_endings(tmp_path, ending):
    path = tmp_path / "alphabet.txt"
    content = ending.join(["# comment", " ", "a", "b", "\\#", ""])
    path.write_bytes(content.encode("utf-8"))
    a = Alphabet(str(path))
    assert a.labels == [" ", "a", "b", "#"]
    assert a.space_index == 0


def test_no_trailing_newline(tmp_path):
    path = tmp_path / "alphabet.txt"
    path.write_bytes(b" \na\nb")
    a = Alphabet(str(path))
    assert a.labels == [" ", "a", "b"]


def test_reference_alphabet_file(reference_root):
    path = os.path.join(reference_root, "data/alphabet.txt")
    a = Alphabet(path)
    assert a.size == 28
    assert a.labels[0] == " "
    assert a.labels[1] == "a"
    assert a.labels[-1] == "'"


def test_binary_serialization_roundtrip():
    a = make_english()
    buf = a.serialize()
    b = Alphabet.deserialize(buf)
    assert b.labels == a.labels
    assert b.space_index == a.space_index
    # header: uint16 count little-endian
    assert buf[:2] == (28).to_bytes(2, "little")


def test_serialize_text_roundtrip():
    a = Alphabet().init_from_labels([" ", "a", "#", "'"])
    b = Alphabet().init_from_text(a.serialize_text())
    assert b.labels == a.labels


def test_utf8_alphabet():
    a = UTF8Alphabet()
    assert a.size == 255
    assert a.space_index == ord(" ") - 1
    text = "héllo wörld"
    encoded = a.encode(text)
    assert a.decode(encoded) == text
    # every byte label maps to byte value index+1
    assert a.encode("a") == [ord("a") - 1]


def test_make_alphabet():
    assert isinstance(make_alphabet(None, bytes_output_mode=True), UTF8Alphabet)
