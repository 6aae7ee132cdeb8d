"""Remote IO abstraction, downloader, and KenLM inspection tools."""

import os

import pytest

from stt_tpu.io import (
    MemoryHandler,
    copy_remote,
    glob_remote,
    is_remote_path,
    isdir_remote,
    listdir_remote,
    open_remote,
    path_exists_remote,
    register_scheme,
    remove_remote,
    rmtree_remote,
)

SCORER = "/root/reference/data/smoke_test/pruned_lm.scorer"
ALPHABET = "/root/reference/data/alphabet.txt"


@pytest.fixture()
def mem():
    handler = MemoryHandler()
    register_scheme("mem", handler)
    return handler


def test_is_remote_path():
    assert is_remote_path("gs://bucket/key")
    assert is_remote_path("hdfs://nn/path")
    assert not is_remote_path("/local/path")
    assert not is_remote_path("relative/path.csv")
    assert not is_remote_path("file:///local/path")


def test_local_passthrough(tmp_path):
    p = tmp_path / "x.txt"
    with open_remote(str(p), "w") as f:
        f.write("hello")
    assert path_exists_remote(str(p))
    assert isdir_remote(str(tmp_path))
    assert "x.txt" in listdir_remote(str(tmp_path))
    assert glob_remote(str(tmp_path / "*.txt")) == [str(p)]
    remove_remote(str(p))
    assert not path_exists_remote(str(p))


def test_unregistered_scheme_errors():
    with pytest.raises(ValueError, match="no IO handler"):
        open_remote("s4://bucket/key")


def test_memory_scheme_round_trip(mem):
    with open_remote("mem://b/dir/a.txt", "w") as f:
        f.write("alpha")
    with open_remote("mem://b/dir/b.bin", "wb") as f:
        f.write(b"\x00\x01")
    assert path_exists_remote("mem://b/dir/a.txt")
    assert isdir_remote("mem://b/dir")
    assert listdir_remote("mem://b/dir") == ["a.txt", "b.bin"]
    assert glob_remote("mem://b/dir/*.txt") == ["mem://b/dir/a.txt"]
    with open_remote("mem://b/dir/a.txt") as f:
        assert f.read() == "alpha"
    with open_remote("mem://b/dir/b.bin", "rb") as f:
        assert f.read() == b"\x00\x01"
    remove_remote("mem://b/dir/b.bin")
    assert not path_exists_remote("mem://b/dir/b.bin")
    rmtree_remote("mem://b/dir")
    assert not isdir_remote("mem://b/dir")


def test_copy_local_to_remote_and_back(mem, tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("payload")
    copy_remote(str(src), "mem://b/in.txt")
    with pytest.raises(FileExistsError):
        copy_remote(str(src), "mem://b/in.txt")
    copy_remote(str(src), "mem://b/in.txt", overwrite=True)
    dst = tmp_path / "out.txt"
    copy_remote("mem://b/in.txt", str(dst))
    assert dst.read_text() == "payload"


def test_maybe_download_existing_is_noop(tmp_path, capsys):
    from stt_tpu.tools.downloader import maybe_download

    archive = tmp_path / "corpus.tgz"
    archive.write_bytes(b"cached")
    out = maybe_download("corpus.tgz", str(tmp_path), "http://example.invalid/x")
    assert out == str(archive)
    assert archive.read_bytes() == b"cached"
    assert "not downloading" in capsys.readouterr().out


def test_enumerate_kenlm_vocabulary(tmp_path):
    """Round-trip: trie binary written with the vocabulary-strings section
    (kenlm build_binary default; strings start at end-of-search, layout
    verified against the vendored build_binary) enumerates back."""
    from stt_tpu.lm.arpa import estimate_kneser_ney
    from stt_tpu.lm.kenlm import KenLMModel
    from stt_tpu.lm.trie_writer import write_trie_binary
    from stt_tpu.tools.enumerate_kenlm_vocabulary import main

    sentences = [
        "she had your dark suit in greasy wash water all year".split(),
        "the quick brown fox jumps over the lazy dog".split(),
    ]
    model = estimate_kneser_ney(sentences, order=3)
    lm_path = tmp_path / "vocab.klm"
    lm_path.write_bytes(write_trie_binary(model, include_vocab=True))

    out = tmp_path / "vocab.txt"
    assert main([str(lm_path), str(out)]) == 0
    words = out.read_text().splitlines()
    assert words[0] == "<unk>"
    assert "she" in words and "greasy" in words and "dog" in words
    # id order must match vocab_index (hash-sorted)
    lm = KenLMModel.from_file(str(lm_path))
    for i, w in enumerate(words):
        if w != "<unk>":
            assert lm.vocab_index(w) == i
    # end_of_lm_offset lands exactly at EOF (nothing follows the strings)
    assert lm.end_of_lm_offset == lm_path.stat().st_size

    # models built with -v (no strings) say so instead of mis-parsing
    stripped = tmp_path / "stripped.klm"
    stripped.write_bytes(write_trie_binary(model))
    with pytest.raises(ValueError, match="without vocabulary strings"):
        main([str(stripped), str(out)])


def test_trie_load_harness(capsys):
    if not os.path.isfile(SCORER):
        pytest.skip("reference scorer missing")
    from stt_tpu.tools.trie_load import main

    assert main([SCORER, ALPHABET]) == 0
    assert "order" in capsys.readouterr().err

    assert main([SCORER, ALPHABET, "dump-vocab"]) == 0
    vocab = capsys.readouterr().out.split()
    assert "she" in vocab and "year" in vocab

    assert main([SCORER, ALPHABET, "arcs"]) == 0
    assert "-> state" in capsys.readouterr().out


class _FakeWebHDFS:
    """In-memory WebHDFS namenode: answers HDFSHandler's REST calls.

    Mirrors the JSON shapes of the real API (GETFILESTATUS, OPEN,
    CREATE, LISTSTATUS, DELETE) so the handler's request/parse logic is
    exercised end-to-end minus the socket. CREATE enforces the real
    two-step protocol: the namenode never accepts file data — it hands
    back a datanode Location (as 200 JSON for noredirect=true, or as a
    307 redirect in `redirect_mode='307'`), and only a PUT to the
    datanode host stores bytes."""

    def __init__(self, redirect_mode="json"):
        self.files = {}  # "/path" -> bytes
        self.redirect_mode = redirect_mode

    def __call__(self, url, data=None, method="GET"):
        import io as _io
        import json as _json
        import urllib.error
        import urllib.parse

        parsed = urllib.parse.urlparse(url)
        assert parsed.path.startswith("/webhdfs/v1")
        key = urllib.parse.unquote(parsed.path[len("/webhdfs/v1"):]) or "/"
        q = dict(urllib.parse.parse_qsl(parsed.query))
        op = q["op"]

        def reply(obj):
            return _io.BytesIO(_json.dumps(obj).encode())

        def http404():
            return urllib.error.HTTPError(url, 404, "not found", {}, _io.BytesIO(b""))

        if op == "GETFILESTATUS":
            if key in self.files:
                return reply({"FileStatus": {"type": "FILE", "length": len(self.files[key]), "pathSuffix": ""}})
            prefix = key.rstrip("/") + "/"
            if any(k.startswith(prefix) for k in self.files):
                return reply({"FileStatus": {"type": "DIRECTORY", "length": 0, "pathSuffix": ""}})
            raise http404()
        if op == "OPEN":
            if key not in self.files:
                raise http404()
            return _io.BytesIO(self.files[key])
        if op == "CREATE":
            assert method == "PUT"
            if parsed.netloc != "dn:9864":
                # namenode step: MUST NOT carry the file body
                assert data is None, "namenode CREATE must not carry data"
                location = urllib.parse.urlunparse(
                    parsed._replace(netloc="dn:9864")
                )
                if self.redirect_mode == "307":
                    raise urllib.error.HTTPError(
                        url, 307, "TEMPORARY_REDIRECT",
                        {"Location": location}, _io.BytesIO(b""),
                    )
                return reply({"Location": location})
            # datanode step: the actual write
            self.files[key] = data or b""
            return _io.BytesIO(b"")
        if op == "LISTSTATUS":
            prefix = key.rstrip("/") + "/" if key != "/" else "/"
            names = {}
            for k in self.files:
                if not k.startswith(prefix):
                    continue
                rest = k[len(prefix):]
                head = rest.split("/", 1)[0]
                names[head] = "DIRECTORY" if "/" in rest else "FILE"
            if not names and key not in self.files:
                raise http404()
            return reply({"FileStatuses": {"FileStatus": [
                {"pathSuffix": n, "type": t, "length": 0} for n, t in sorted(names.items())
            ]}})
        if op == "DELETE":
            if q.get("recursive") == "true":
                prefix = key.rstrip("/") + "/"
                doomed = [k for k in self.files if k == key or k.startswith(prefix)]
            else:
                doomed = [key] if key in self.files else []
            for k in doomed:
                del self.files[k]
            return reply({"boolean": bool(doomed)})
        raise AssertionError(f"unexpected op {op}")


@pytest.mark.parametrize("redirect_mode", ["json", "307"])
def test_hdfs_handler_webhdfs(monkeypatch, redirect_mode):
    from stt_tpu.io import HDFSHandler

    fake = _FakeWebHDFS(redirect_mode)
    handler = HDFSHandler()
    monkeypatch.setattr(handler, "_request", fake)
    register_scheme("hdfs", handler)

    assert is_remote_path("hdfs://nn:8020/data/x.csv")
    with open_remote("hdfs://nn:8020/data/x.csv", "w") as f:
        f.write("a,b\n1,2\n")
    with open_remote("hdfs://nn:8020/data/y.bin", "wb") as f:
        f.write(b"\x00\x01")
    assert path_exists_remote("hdfs://nn:8020/data/x.csv")
    assert not path_exists_remote("hdfs://nn:8020/data/missing")
    assert isdir_remote("hdfs://nn:8020/data")
    assert not isdir_remote("hdfs://nn:8020/data/x.csv")
    assert listdir_remote("hdfs://nn:8020/data") == ["x.csv", "y.bin"]
    assert glob_remote("hdfs://nn:8020/data/*.csv") == ["hdfs://nn/data/x.csv"]
    with open_remote("hdfs://nn:8020/data/x.csv") as f:
        assert f.read() == "a,b\n1,2\n"
    remove_remote("hdfs://nn:8020/data/y.bin")
    assert not path_exists_remote("hdfs://nn:8020/data/y.bin")
    rmtree_remote("hdfs://nn:8020/data")
    assert not isdir_remote("hdfs://nn:8020/data")
