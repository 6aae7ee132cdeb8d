"""Language-binding parity gates (bindings/ vs the C API).

The reference ships six bindings over one C header (coqui-stt.h); ours ship
over stt_tpu/native/stt_tpu.h. This image has no node/JDK/dotnet/swift/emcc
toolchains, so the runnable gates are:

  * symbol parity — every STT_* function exported by the header is bound by
    every binding (so no binding silently lags the C surface as it grows);
  * error-enum parity — the .NET enum mirrors the header's codes by value;
  * struct-layout parity — marshaling declarations match the header fields;
  * compile smoke — run only when the relevant toolchain is installed.
"""

import re
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
HEADER = REPO / "stt_tpu" / "native" / "stt_tpu.h"
BINDINGS = REPO / "bindings"

# Each binding's file that must reference the full C surface.
BINDING_SOURCES = {
    "javascript": BINDINGS / "javascript" / "addon.c",
    "java": BINDINGS / "java" / "jni" / "stt_jni.c",
    "dotnet": BINDINGS / "dotnet" / "STTClient" / "STT.cs",
    "swift": BINDINGS / "swift" / "STT.swift",
    "wasm": BINDINGS / "wasm" / "bindings.cc",
}


def header_functions():
    text = HEADER.read_text()
    names = re.findall(r"\b(STT_[A-Za-z0-9_]+)\s*\(", text)
    # drop macro/enum artifacts, keep unique order
    seen = []
    for n in names:
        if n not in seen:
            seen.append(n)
    assert len(seen) >= 20, seen
    return seen


def header_error_codes():
    text = HEADER.read_text()
    return dict(
        (name, int(value, 16))
        for name, value in re.findall(
            r"(STT_ERR_[A-Z_0-9]+)\s*=\s*(0x[0-9a-fA-F]+)", text
        )
    )


@pytest.mark.parametrize("name", sorted(BINDING_SOURCES))
def test_binding_covers_full_c_surface(name):
    source = BINDING_SOURCES[name].read_text()
    missing = [fn for fn in header_functions() if fn not in source]
    assert not missing, f"{name} binding misses C API functions: {missing}"


def test_dotnet_error_enum_matches_header():
    src = (BINDINGS / "dotnet" / "STTClient" / "STT.cs").read_text()
    cs_codes = dict(
        (name, int(value, 16))
        for name, value in re.findall(
            r"(STT_ERR_[A-Z_0-9]+)\s*=\s*(0x[0-9a-fA-F]+)", src
        )
    )
    assert cs_codes == header_error_codes()


def test_marshaling_struct_layouts_match_header():
    """TokenMetadata/CandidateTranscript/Metadata field order must agree."""
    header = HEADER.read_text()

    def header_fields(struct):
        body = re.search(
            r"typedef struct %s \{(.*?)\} %s;" % (struct, struct),
            header,
            re.S,
        ).group(1)
        return re.findall(r"(\w+);", body)

    assert header_fields("TokenMetadata") == ["text", "timestep", "start_time"]
    assert header_fields("CandidateTranscript") == [
        "tokens",
        "num_tokens",
        "confidence",
    ]
    assert header_fields("Metadata") == ["transcripts", "num_transcripts"]

    # .NET raw structs must marshal the same fields in the same order.
    cs = (BINDINGS / "dotnet" / "STTClient" / "STT.cs").read_text()
    raw_token = re.search(r"struct RawToken\s*\{(.*?)\}", cs, re.S).group(1)
    assert re.findall(r"internal \w+ (\w+);", raw_token) == [
        "text",
        "timestep",
        "start_time",
    ]
    raw_ct = re.search(r"struct RawTranscript\s*\{(.*?)\}", cs, re.S).group(1)
    assert re.findall(r"internal \w+ (\w+);", raw_ct) == [
        "tokens",
        "num_tokens",
        "confidence",
    ]


def test_struct_abi_offsets_match_compiled_header(tmp_path):
    """Runtime ABI gate (VERDICT r2 item 7): the C compiler's actual
    offsetof/sizeof for TokenMetadata/CandidateTranscript/Metadata is
    the ground truth; every layer that RE-DECLARES the structs (the
    .NET P/Invoke raw structs, the ctypes mirror the test/client
    harnesses use) must reproduce byte-exact offsets — field-order
    string checks cannot catch a padding or type-width bug."""
    import ctypes
    import json
    import subprocess

    header_dir = Path(__file__).resolve().parent.parent / "stt_tpu" / "native"
    src = tmp_path / "abi.c"
    src.write_text(
        '#include <stdio.h>\n#include <stddef.h>\n#include "stt_tpu.h"\n'
        "int main(){printf(\""
        '{\\"TokenMetadata\\":{\\"size\\":%zu,\\"text\\":%zu,'
        '\\"timestep\\":%zu,\\"start_time\\":%zu},'
        '\\"CandidateTranscript\\":{\\"size\\":%zu,\\"tokens\\":%zu,'
        '\\"num_tokens\\":%zu,\\"confidence\\":%zu},'
        '\\"Metadata\\":{\\"size\\":%zu,\\"transcripts\\":%zu,'
        '\\"num_transcripts\\":%zu}}\\n",'
        "sizeof(TokenMetadata),offsetof(TokenMetadata,text),"
        "offsetof(TokenMetadata,timestep),offsetof(TokenMetadata,start_time),"
        "sizeof(CandidateTranscript),offsetof(CandidateTranscript,tokens),"
        "offsetof(CandidateTranscript,num_tokens),"
        "offsetof(CandidateTranscript,confidence),"
        "sizeof(Metadata),offsetof(Metadata,transcripts),"
        "offsetof(Metadata,num_transcripts));return 0;}\n"
    )
    exe = tmp_path / "abi"
    subprocess.run(
        ["cc", f"-I{header_dir}", str(src), "-o", str(exe)], check=True
    )
    truth = json.loads(subprocess.run(
        [str(exe)], capture_output=True, text=True, check=True
    ).stdout)

    # ctypes mirror (what test_c_api.py / the python client marshal with)
    class TokenMetadata(ctypes.Structure):
        _fields_ = [
            ("text", ctypes.c_char_p),
            ("timestep", ctypes.c_uint),
            ("start_time", ctypes.c_float),
        ]

    class CandidateTranscript(ctypes.Structure):
        _fields_ = [
            ("tokens", ctypes.POINTER(TokenMetadata)),
            ("num_tokens", ctypes.c_uint),
            ("confidence", ctypes.c_double),
        ]

    class Metadata(ctypes.Structure):
        _fields_ = [
            ("transcripts", ctypes.POINTER(CandidateTranscript)),
            ("num_transcripts", ctypes.c_uint),
        ]

    for cls, name in [
        (TokenMetadata, "TokenMetadata"),
        (CandidateTranscript, "CandidateTranscript"),
        (Metadata, "Metadata"),
    ]:
        assert ctypes.sizeof(cls) == truth[name]["size"], name
        for field, _ in cls._fields_:
            assert (
                getattr(cls, field).offset == truth[name][field]
            ), (name, field)

    # .NET raw structs: map the C# field types onto ctypes and demand
    # the same layout the C compiler produced
    cs = (BINDINGS / "dotnet" / "STTClient" / "STT.cs").read_text()
    cs_to_ctypes = {
        "IntPtr": ctypes.c_void_p,
        "uint": ctypes.c_uint32,
        "int": ctypes.c_int32,
        "float": ctypes.c_float,
        "double": ctypes.c_double,
    }
    for cs_struct, c_struct in [
        ("RawToken", "TokenMetadata"),
        ("RawTranscript", "CandidateTranscript"),
        ("RawMetadata", "Metadata"),
    ]:
        body = re.search(
            r"struct %s\s*\{(.*?)\}" % cs_struct, cs, re.S
        ).group(1)
        fields = re.findall(r"internal (\w+) (\w+);", body)
        assert fields, cs_struct
        ct_fields = [
            (fname, cs_to_ctypes[ftype]) for ftype, fname in fields
        ]
        mirrored = type(
            f"Cs{cs_struct}",
            (ctypes.Structure,),
            {"_fields_": ct_fields},
        )
        assert ctypes.sizeof(mirrored) == truth[c_struct]["size"], cs_struct
        for fname, _ in ct_fields:
            assert (
                getattr(mirrored, fname).offset == truth[c_struct][fname]
            ), (cs_struct, fname)


def test_js_class_surface_matches_reference_shape():
    """index.js must expose the reference's Model/Stream method names."""
    js = (BINDINGS / "javascript" / "index.js").read_text()
    for method in [
        "beamWidth",
        "setBeamWidth",
        "sampleRate",
        "enableExternalScorer",
        "disableExternalScorer",
        "setScorerAlphaBeta",
        "addHotWord",
        "eraseHotWord",
        "clearHotWords",
        "stt(",
        "sttWithMetadata",
        "createStream",
        "feedAudioContent",
        "intermediateDecode",
        "finishStream",
    ]:
        assert method in js, f"index.js missing {method}"


def test_jni_natives_match_java_declarations():
    """Every `private static native` in STTModel.java has a JNI export."""
    java = (BINDINGS / "java" / "src" / "ai" / "stt_tpu" / "STTModel.java").read_text()
    shim = (BINDINGS / "java" / "jni" / "stt_jni.c").read_text()
    natives = re.findall(r"native \w+(?:\[\])? (\w+)\(", java)
    assert len(natives) >= 20
    for fn in natives:
        assert fn in shim, f"JNI shim missing native implementation: {fn}"


@pytest.mark.skipif(shutil.which("gcc") is None, reason="gcc not installed")
@pytest.mark.parametrize(
    "source",
    [BINDINGS / "javascript" / "addon.c", BINDINGS / "java" / "jni" / "stt_jni.c"],
    ids=["node-addon", "jni-shim"],
)
def test_c_bindings_compile_against_stub_headers(source):
    """Full -Wall -Werror syntax check against the real API shapes.

    node_api.h / jni.h are not in this image, so stubs in
    tests/binding_stubs/ declare exactly the toolchain surface the shims
    use; any type error, missing prototype, or warning in the binding C
    code fails here without needing node-gyp or a JDK.
    """
    subprocess.run(
        [
            "gcc",
            "-fsyntax-only",
            "-Wall",
            "-Werror",
            "-I",
            str(REPO / "tests" / "binding_stubs"),
            str(source),
        ],
        check=True,
    )


@pytest.mark.skipif(shutil.which("node") is None, reason="node not installed")
def test_node_addon_builds(tmp_path):
    subprocess.run(
        ["node-gyp", "rebuild"],
        cwd=BINDINGS / "javascript",
        check=True,
    )
    out = subprocess.run(
        ["node", "-e", "console.log(require('./index.js').Version())"],
        cwd=BINDINGS / "javascript",
        check=True,
        capture_output=True,
        text=True,
    )
    assert out.stdout.strip()


@pytest.mark.skipif(shutil.which("javac") is None, reason="JDK not installed")
def test_java_classes_compile(tmp_path):
    srcs = list((BINDINGS / "java" / "src").rglob("*.java"))
    subprocess.run(
        ["javac", "-d", str(tmp_path)] + [str(s) for s in srcs], check=True
    )
