"""Alphabet: bidirectional label<->index mapping.

Behavior-parity notes (reference: native_client/alphabet.{h,cc}):
- Text config format: one label per line; lines starting with '#' are
  comments; a line consisting of exactly '\\#' denotes the literal '#'
  label; empty lines are skipped; any of \n / \r\n / \r line endings are
  accepted (alphabet.cc:7-39,41-68).
- The space label ' ' is tracked specially (GetSpaceLabel).
- Binary serialization: uint16 count, then (uint16 key, uint16 len,
  len bytes) per label, little-endian (alphabet.cc:102-160).
- UTF8Alphabet: 255 single-byte labels, index n -> byte n+1, space index
  = ord(' ')-1 (alphabet.h:80-100).  In UTF-8/bytes output mode the model
  emits raw UTF-8 bytes instead of alphabet characters.
"""

from __future__ import annotations

import struct
from typing import Iterable, List, Sequence


def _split_lines_crossplatform(text: str) -> List[str]:
    """Split on \n, \r\n, or \r — files may come from any platform."""
    return text.replace("\r\n", "\n").replace("\r", "\n").split("\n")


class Alphabet:
    """Maps labels (strings, usually single codepoints) to dense indices."""

    def __init__(self, config_path: str | None = None):
        self._label_to_index: dict[str, int] = {}
        self._index_to_label: dict[int, str] = {}
        self._space_index: int = -2
        if config_path is not None:
            self.init_from_file(config_path)

    # -- construction ------------------------------------------------------

    def _add(self, label: str, index: int) -> None:
        self._label_to_index[label] = index
        self._index_to_label[index] = label
        if label == " ":
            self._space_index = index

    def init_from_file(self, config_path: str) -> "Alphabet":
        with open(config_path, "r", encoding="utf-8", newline="") as fin:
            return self.init_from_text(fin.read())

    def init_from_text(self, text: str) -> "Alphabet":
        index = 0
        lines = _split_lines_crossplatform(text)
        # A trailing empty string after the final newline is a non-line.
        for line in lines:
            if line == "\\#":
                line = "#"
            elif line.startswith("#"):
                continue
            if line == "":
                continue
            self._add(line, index)
            index += 1
        return self

    def init_from_labels(self, labels: Sequence[str]) -> "Alphabet":
        for index, label in enumerate(labels):
            self._add(label, index)
        return self

    # -- queries -----------------------------------------------------------

    def __len__(self) -> int:
        return len(self._label_to_index)

    @property
    def size(self) -> int:
        return len(self._label_to_index)

    @property
    def blank_index(self) -> int:
        """CTC blank = one past the last label (decoder convention:
        ctc_beam_search_decoder.cpp:33)."""
        return self.size

    @property
    def space_index(self) -> int:
        return self._space_index

    def is_space(self, index: int) -> bool:
        return index == self._space_index

    @property
    def labels(self) -> List[str]:
        return [self._index_to_label[i] for i in range(self.size)]

    def can_encode_single(self, label: str) -> bool:
        return label in self._label_to_index

    def can_encode(self, text: str) -> bool:
        return all(self.can_encode_single(ch) for ch in text)

    def encode_single(self, label: str) -> int:
        return self._label_to_index[label]

    def encode(self, text: str) -> List[int]:
        return [self._label_to_index[ch] for ch in text]

    def decode_single(self, index: int) -> str:
        return self._index_to_label[index]

    def decode(self, indices: Iterable[int]) -> str:
        return "".join(self._index_to_label[int(i)] for i in indices)

    # -- serialization -----------------------------------------------------

    def serialize(self) -> bytes:
        """Binary format embedded in exported model artifacts."""
        out = [struct.pack("<H", self.size)]
        for i in range(self.size):
            raw = self._index_to_label[i].encode("utf-8")
            out.append(struct.pack("<HH", i, len(raw)))
            out.append(raw)
        return b"".join(out)

    @classmethod
    def deserialize(cls, buffer: bytes) -> "Alphabet":
        alphabet = cls()
        offset = 0
        (count,) = struct.unpack_from("<H", buffer, offset)
        offset += 2
        for _ in range(count):
            key, length = struct.unpack_from("<HH", buffer, offset)
            offset += 4
            label = buffer[offset : offset + length].decode("utf-8")
            offset += length
            alphabet._add(label, key)
        return alphabet

    def serialize_text(self) -> str:
        header = (
            "# Each line in this file represents the Unicode codepoint (UTF-8 encoded)\n"
            "# associated with a numeric index.\n"
            "# A line that starts with # is a comment. You can escape it with \\# if you wish\n"
            "# to use '#' in the Alphabet.\n"
        )
        body = "".join(
            ("\\#" if label == "#" else label) + "\n" for label in self.labels
        )
        footer = "# The last (non-comment) line needs to end with a newline.\n"
        return header + body + footer


class UTF8Alphabet(Alphabet):
    """Bytes-output mode: 255 labels, one per non-NUL byte value."""

    def __init__(self):
        super().__init__()
        for idx in range(255):
            self._add(chr(idx + 1), idx)
        self._space_index = ord(" ") - 1

    def init_from_file(self, config_path: str) -> "UTF8Alphabet":
        return self  # fixed mapping; config file is ignored

    def can_encode_single(self, label: str) -> bool:
        return len(label.encode("utf-8")) >= 1 and "\x00" not in label

    def can_encode(self, text: str) -> bool:
        return "\x00" not in text

    def encode(self, text: str) -> List[int]:
        return [b - 1 for b in text.encode("utf-8")]

    def decode(self, indices: Iterable[int]) -> str:
        return bytes(int(i) + 1 for i in indices).decode("utf-8", errors="replace")


def make_alphabet(path: str | None, bytes_output_mode: bool = False) -> Alphabet:
    if bytes_output_mode:
        return UTF8Alphabet()
    return Alphabet(path)
