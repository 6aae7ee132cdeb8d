"""Corpus importers against synthetic on-disk corpora (the reference's
import_*.py behaviors: layout discovery, transcript mapping, filtering,
deterministic splits, CSV schema)."""

import csv
import os
import shutil

import numpy as np
import pytest

from stt_tpu.data.audio import write_wav

SMOKE_FLAC = "/root/reference/data/smoke_test/LDC93S1.flac"
SMOKE_OPUS = "/root/reference/data/smoke_test/LDC93S1.opus"


def read_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    return rows


def make_wav(path, seconds=1.0, rate=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = int(seconds * rate)
    audio = (0.1 * np.sin(np.arange(n) * 0.05)).astype(np.float32)
    write_wav(path, audio, rate)


def test_import_librivox(tmp_path):
    from stt_tpu.tools.import_librivox import import_sets

    set_dir = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    set_dir.mkdir(parents=True)
    shutil.copy(SMOKE_FLAC, set_dir / "84-121123-0000.flac")
    shutil.copy(SMOKE_FLAC, set_dir / "84-121123-0001.flac")
    (set_dir / "84-121123.trans.txt").write_text(
        "84-121123-0000 GO DO YOU HEAR Café\n"
        "84-121123-0001 BUT IN LESS THAN FIVE MINUTES\n"
    )
    [csv_path] = import_sets(str(tmp_path), ["dev-clean"], base_url=None)
    rows = read_csv(csv_path)
    assert len(rows) == 2
    # diacritics folded, lowercased
    assert rows[0]["transcript"] == "go do you hear cafe"
    assert os.path.isfile(rows[0]["wav_filename"])
    assert int(rows[0]["wav_filesize"]) > 44


def test_import_aishell(tmp_path):
    from stt_tpu.tools.import_aishell import preprocess_data

    main = tmp_path / "data_aishell"
    (main / "transcript").mkdir(parents=True)
    lines = []
    for subset, n in (("train", 3), ("dev", 2), ("test", 2)):
        for i in range(n):
            utt = f"BAC009S0002W0{subset[:2]}{i}"
            make_wav(str(main / subset / "S0002" / f"{utt}.wav"),
                     seconds=12.0 if subset == "train" and i == 0 else 2.0)
            lines.append(f"{utt} 今天 天气\n")
    (main / "transcript" / "aishell_transcript_v0.8.txt").write_text(
        "".join(lines), encoding="utf-8"
    )
    csvs = preprocess_data(str(tmp_path / "missing.tgz"), str(tmp_path))
    train = read_csv(csvs[0])
    assert len(train) == 2  # the 12 s sample was trimmed
    assert len(read_csv(csvs[1])) == 2
    assert "今天" in train[0]["transcript"]


def test_import_freestmandarin_split(tmp_path):
    from stt_tpu.tools.import_freestmandarin import preprocess_data

    main = tmp_path / "ST-CMDS-20170001_1-OS"
    main.mkdir()
    for i in range(10):
        make_wav(str(main / f"20170001P{i:05d}.wav"), seconds=1.0)
        (main / f"20170001P{i:05d}.txt").write_text(
            f"句子{i}", encoding="utf-8"
        )
    csvs = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=2, n_test=2
    )
    train, dev, test = (read_csv(c) for c in csvs)
    assert (len(train), len(dev), len(test)) == (6, 2, 2)
    # deterministic: same split on re-run
    csvs2 = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=2, n_test=2
    )
    assert read_csv(csvs2[2]) == test
    all_files = {r["wav_filename"] for r in train + dev + test}
    assert len(all_files) == 10  # disjoint, complete


def test_import_primewords(tmp_path):
    import json

    from stt_tpu.tools.import_primewords import preprocess_data

    main = tmp_path / "primewords_md_2018_set1"
    entries = []
    for i in range(6):
        name = f"a{i}.wav"
        make_wav(str(main / "audio_files" / "0" / "00" / name))
        entries.append({"file": name, "text": f"文本 {i}"})
    (main / "set1_transcript.json").write_text(
        json.dumps(entries), encoding="utf-8"
    )
    csvs = preprocess_data(
        str(tmp_path / "missing.tgz"), str(tmp_path), n_dev=1, n_test=1
    )
    assert [len(read_csv(c)) for c in csvs] == [4, 1, 1]


def test_import_magicdata(tmp_path):
    from stt_tpu.tools.import_magicdata import preprocess_data

    for subset in ("train", "dev", "test"):
        d = tmp_path / subset
        (d / "S01").mkdir(parents=True)
        rows = ["UtteranceID\tSpeakerID\tTranscription"]
        for i in range(3):
            name = f"{subset}_{i}.wav"
            make_wav(str(d / "S01" / name), seconds=2.0)
            text = "[FIL] 嗯" if subset == "train" and i == 0 else "好"
            rows.append(f"{name}\tS01\t{text}")
        (d / "TRANS.txt").write_text("\n".join(rows), encoding="utf-8")
    csvs = preprocess_data(str(tmp_path), str(tmp_path))
    train = read_csv(csvs[0])
    assert len(train) == 2  # noise-tagged row removed
    assert all("[FIL]" not in r["transcript"] for r in train)
    assert len(read_csv(csvs[1])) == 3


def make_sph(path, seconds=2.0, rate=16000, channels=1, coding="pcm"):
    from stt_tpu.data.sph import write_sph

    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = int(seconds * rate)
    tone = (0.1 * np.sin(np.arange(n) * 0.03)).astype(np.float32)
    audio = tone if channels == 1 else np.stack([tone, -tone], axis=-1)
    write_sph(path, audio, rate, coding=coding)


def test_import_ted(tmp_path):
    from stt_tpu.tools.import_ted import import_release

    rel = tmp_path / "TEDLIUM_release2"
    for subset in ("train", "dev", "test"):
        (rel / subset / "stm").mkdir(parents=True)
        (rel / subset / "sph").mkdir(parents=True)
    make_sph(str(rel / "dev" / "sph" / "TalkA.sph"), seconds=10.0)
    (rel / "dev" / "stm" / "TalkA.stm").write_text(
        "TalkA 1 spk 1.00 3.50 <o,f0,male> hello there world\n"
        "TalkA 1 spk 4.00 6.00 <o,f0,male> ignore_time_segment_in_scoring\n"
        "TalkA 1 spk 6.50 9.00 <o,f0,male> second segment text\n"
    )
    csvs = import_release(str(tmp_path))
    dev = read_csv(csvs[1])
    texts = [r["transcript"] for r in dev]
    assert "hello there world" in texts and "second segment text" in texts
    # the 2.5 s slice is 2.5 s of 16 kHz pcm
    first = next(r for r in dev if r["transcript"] == "hello there world")
    assert int(first["wav_filesize"]) == pytest.approx(
        44 + int(2.5 * 16000) * 2, abs=64
    )


def test_import_timit(tmp_path):
    from stt_tpu.tools.import_timit import preprocess_data

    for subset, spk, utt in (
        ("TRAIN", "DR1/FCJF0", "SI1027"),
        ("TRAIN", "DR1/FCJF0", "SA1"),  # excluded
        ("TEST", "DR2/MABW0", "SX134"),
    ):
        d = tmp_path / "TIMIT" / subset / spk
        make_sph(str(d / f"{utt}.WAV"), seconds=2.0)
        (d / f"{utt}.TXT").write_text(f"0 32000 She said: Hello, world!\n")
    csvs = preprocess_data(str(tmp_path))
    train, test = read_csv(csvs[0]), read_csv(csvs[1])
    assert len(train) == 1 and len(test) == 1  # SA excluded
    assert train[0]["transcript"] == "she said hello world"
    assert os.path.isfile(train[0]["wav_filename"])


def test_import_voxforge(tmp_path):
    from stt_tpu.tools.import_voxforge import preprocess_data

    for i in range(4):
        session = tmp_path / f"spk{i}-2024"
        (session / "etc").mkdir(parents=True)
        (session / "etc" / "PROMPTS").write_text(
            f"mfc/u{i} HELLO WORLD NUMBER\n"
        )
        make_wav(str(session / "wav" / f"u{i}.wav"), seconds=2.0)
    csvs = preprocess_data(str(tmp_path), number_of_test=1, number_of_dev=1)
    train, dev, test = (read_csv(c) for c in csvs)
    assert (len(train), len(dev), len(test)) == (2, 1, 1)
    assert train[0]["transcript"] == "hello world number"


def test_import_vctk(tmp_path):
    from stt_tpu.tools.import_vctk import preprocess_data

    corpus = tmp_path / "VCTK-Corpus"
    for i in range(4):
        utt = f"p225_{i:03d}"
        wav48 = corpus / "wav48" / "p225" / f"{utt}.wav"
        os.makedirs(wav48.parent, exist_ok=True)
        n = 48000 * 2
        silence = np.zeros(12000, np.float32)
        tone = (0.2 * np.sin(np.arange(n) * 0.02)).astype(np.float32)
        write_wav(str(wav48), np.concatenate([silence, tone, silence]), 48000)
        txt = corpus / "txt" / "p225" / f"{utt}.txt"
        os.makedirs(txt.parent, exist_ok=True)
        txt.write_text("Please call Stella.")
    csvs = preprocess_data(str(tmp_path))
    rows = [r for c in csvs for r in read_csv(c)]
    assert len(rows) == 4
    assert rows[0]["transcript"] == "please call stella"
    # trimmed + resampled to ~2 s of 16 kHz
    assert int(rows[0]["wav_filesize"]) == pytest.approx(
        44 + 32000 * 2, rel=0.15
    )


def test_import_tuda(tmp_path):
    from stt_tpu.tools.import_tuda import write_csvs

    extracted = tmp_path / "german-speechdata-package-v2"
    for subset in ("train", "dev", "test"):
        d = extracted / subset
        d.mkdir(parents=True)
        (d / "rec1.xml").write_text(
            "<recording><cleaned_sentence>Schöne Grüße aus Köln"
            "</cleaned_sentence></recording>",
            encoding="utf-8",
        )
        make_wav(str(d / "rec1_Kinect-Beam.wav"), seconds=3.0)
        make_wav(str(d / "rec1_Realtek.wav"), seconds=3.0)
    csvs = write_csvs(str(extracted), str(tmp_path))
    train = read_csv(csvs[0])
    assert len(train) == 2  # both mics kept
    assert train[0]["transcript"] == "schöne grüße aus köln"


def test_import_slr57(tmp_path):
    from stt_tpu.tools.import_slr57 import preprocess_data
    from stt_tpu.tools.importers import validate_label_eng

    corpus = tmp_path / "African_Accented_French"
    tdir = corpus / "transcripts" / "test" / "ca16"
    tdir.mkdir(parents=True)
    lines = []
    for i in range(5):
        name = f"caf_{i:04d}"
        make_wav(str(corpus / "speech" / "test" / f"{name}.wav"), seconds=3.0)
        lines.append(f"{name} bonjour le monde encore\n")
    (tdir / "prompts.txt").write_text("".join(lines))
    csvs = preprocess_data(str(tmp_path), validate_label_eng)
    rows = [r for c in csvs for r in read_csv(c)]
    assert len(rows) == 5
    assert rows[0]["transcript"] == "bonjour le monde encore"


def test_import_m_ailabs(tmp_path):
    from stt_tpu.tools.import_m_ailabs import preprocess_data
    from stt_tpu.tools.importers import validate_label_eng

    book = tmp_path / "by_book" / "female" / "spk" / "book1"
    (book / "wavs").mkdir(parents=True)
    lines = []
    for i in range(10):
        name = f"b1_{i:03d}"
        make_wav(str(book / "wavs" / f"{name}.wav"), seconds=3.0)
        lines.append(f"{name}|Raw text.|clean text variant number {chr(97 + i)}\n")
    (book / "metadata.csv").write_text("".join(lines))
    csvs = preprocess_data(str(tmp_path), validate_label_eng)
    train, dev, test = (read_csv(c) for c in csvs)
    assert (len(train), len(dev), len(test)) == (8, 1, 1)
    assert train[0]["transcript"].startswith("clean text variant number")


def test_import_cv_v1(tmp_path, capsys):
    from stt_tpu.tools.import_cv import preprocess_data

    extracted = tmp_path / "cv_corpus_v1"
    clips = extracted / "cv-valid-dev"
    clips.mkdir(parents=True)
    rows = ["filename,text,up_votes,down_votes,age,gender,accent,duration"]
    for i in range(3):
        stem = f"sample-{i:06d}"
        (clips / f"{stem}.mp3").write_bytes(b"\xff\xfbfake")
        if i < 2:  # one clip stays unconverted
            make_wav(str(clips / f"{stem}.wav"), seconds=3.0)
        rows.append(f"cv-valid-dev/{stem}.mp3,hello common voice,1,0,,,,")
    (extracted / "cv-valid-dev.csv").write_text("\n".join(rows))
    [csv_path] = preprocess_data(str(tmp_path))
    out = read_csv(csv_path)
    # the fake mp3 bytes can't decode, so the third clip is dropped with
    # a warning; the two with wavs import
    assert len(out) == 2
    assert "could not be decoded" in capsys.readouterr().out


def test_import_ts(tmp_path):
    from stt_tpu.tools.import_ts import preprocess_data

    for i in range(5):
        make_wav(str(tmp_path / "audio" / f"s{i}.wav"), seconds=3.0)
    lines = ["path,text"]
    for i in range(5):
        lines.append(f'audio/s{i}.wav,"Voilà — l’énoncé numéro {i}!"')
    (tmp_path / "data.csv").write_text("\n".join(lines), encoding="utf-8")
    csvs = preprocess_data(str(tmp_path))
    rows = [r for c in csvs for r in read_csv(c)]
    assert len(rows) == 5
    assert rows[0]["transcript"].startswith("voilà l'énoncé numéro")


def test_import_fisher(tmp_path):
    from stt_tpu.tools.import_fisher import preprocess_data

    make_sph(str(tmp_path / "fisher_audio" / "fe_03_00001.sph"),
             seconds=8.0, rate=8000, channels=2, coding="ulaw")
    trans = tmp_path / "trans"
    trans.mkdir()
    (trans / "fe_03_00001.txt").write_text(
        "# header\n"
        "0.50 2.50 A: hello how are you\n"
        "3.00 5.00 B: i am [laughter] fine thanks\n"
    )
    csvs = preprocess_data(str(tmp_path), n_dev=1, n_test=1)
    rows = [r for c in csvs for r in read_csv(c)]
    assert len(rows) == 2
    texts = {r["transcript"] for r in rows}
    assert "hello how are you" in texts
    assert "i am fine thanks" in texts  # [laughter] dropped
    # 2 s slice at 16 kHz after upsampling from 8 kHz
    assert int(rows[0]["wav_filesize"]) == pytest.approx(
        44 + 32000 * 2, rel=0.05
    )


def test_import_swb(tmp_path):
    from stt_tpu.tools.import_swb import preprocess_data

    make_sph(str(tmp_path / "swb1_d1" / "data" / "sw02001.sph"),
             seconds=8.0, rate=8000, channels=2, coding="ulaw")
    tdir = tmp_path / "swb_ms98_transcriptions" / "20" / "2001"
    tdir.mkdir(parents=True)
    (tdir / "sw2001A-ms98-a-trans.text").write_text(
        "sw2001A-ms98-a-0001 0.50 2.50 yeah [silence] i think so\n"
        "sw2001A-ms98-a-0002 3.00 4.00 [noise]\n"
    )
    (tdir / "sw2001B-ms98-a-trans.text").write_text(
        "sw2001B-ms98-a-0001 4.50 6.50 right exactly\n"
    )
    csvs = preprocess_data(str(tmp_path), n_dev=1, n_test=1)
    rows = [r for c in csvs for r in read_csv(c)]
    texts = {r["transcript"] for r in rows}
    assert texts == {"yeah i think so", "right exactly"}


def test_import_atthack(tmp_path):
    from stt_tpu.tools.import_atthack import preprocess_data

    (tmp_path / "txt").mkdir()
    for i in range(10):
        name = f"F01_a1_s{i:03d}"
        make_wav(str(tmp_path / "wav" / f"{name}.wav"), seconds=3.0)
        (tmp_path / "txt" / f"{name}.txt").write_text("je vous remercie")
    csvs = preprocess_data(str(tmp_path), lambda s: s.strip().lower() or None)
    train, dev, test = (read_csv(c) for c in csvs)
    assert (len(train), len(dev), len(test)) == (8, 1, 1)
    assert train[0]["transcript"] == "je vous remercie"


def test_import_lingua_libre(tmp_path, capsys):
    from stt_tpu.tools.import_lingua_libre import preprocess_data

    spk = tmp_path / "speaker1"
    spk.mkdir()
    for stem in ("bonjour tout le monde", "Q12345", "encore une phrase"):
        (spk / f"{stem}.ogg").write_bytes(b"OggS fake")
        if stem != "Q12345":
            make_wav(str(spk / f"{stem}.wav"), seconds=2.0)
    csvs = preprocess_data(
        str(tmp_path), lambda s: s.strip().lower() or None,
        bogus_regex=r"^Q[0-9]+",
    )
    rows = [r for c in csvs for r in read_csv(c)]
    assert {r["transcript"] for r in rows} == {
        "bonjour tout le monde", "encore une phrase",
    }


def test_import_cv_personal(tmp_path, capsys):
    from stt_tpu.tools.import_cv_personal import convert_set
    from stt_tpu.tools.importers import validate_label_eng

    audio = tmp_path / "clips"
    audio.mkdir()
    lines = ["original_sentence_id\tsentence\tlocale"]
    for i in range(3):
        sid = f"sent{i}"
        (audio / f"{sid}.mp3").write_bytes(b"\xff\xfbfake")
        if i < 2:
            make_wav(str(audio / f"{sid}.wav"), seconds=3.0)
        lines.append(f"{sid}\thello there friend\ten")
    tsv = tmp_path / "sentences.tsv"
    tsv.write_text("\n".join(lines))
    out = convert_set(str(tsv), str(audio), validate_label_eng)
    rows = read_csv(out)
    assert len(rows) == 2

    out2 = convert_set(str(tsv), str(audio), validate_label_eng,
                       space_after_every_character=True)
    rows2 = read_csv(out2)
    assert rows2[0]["transcript"].startswith("h e l l o")


def test_import_gram_vaani(tmp_path):
    from stt_tpu.tools.import_gram_vaani import preprocess_data

    lines = ['"id","audio_url","labelled","transcript","labels","file","len","user"']
    for i in range(5):
        name = f"clip{i}.mp3"
        make_wav(str(tmp_path / f"clip{i}.wav"), seconds=3.0)
        lines.append(
            f'"{i}","http://x/{name}","y","नमस्ते दुनिया","l","{name}","3","u"'
        )
    catalog = tmp_path / "catalog.csv"
    catalog.write_text("\n".join(lines), encoding="utf-8")
    csvs = preprocess_data(
        str(catalog), str(tmp_path), lambda s: s.strip() or None
    )
    rows = [r for c in csvs for r in read_csv(c)]
    assert len(rows) == 5
    assert rows[0]["transcript"] == "नमस्ते दुनिया"


def test_import_swc(tmp_path):
    from stt_tpu.tools.import_swc import prepare_language

    art = tmp_path / "article1"
    art.mkdir()
    make_wav(str(art / "audio.wav"), seconds=12.0)
    (art / "aligned.swc").write_text(
        """<article>
        <meta><prop key="reader.name" value="alice"/></meta>
        <d><s>
          <t text="hello"><n start="500" end="1200" pronunciation="hello"/></t>
          <t text="spoken"><n start="1300" end="2100" pronunciation="spoken"/></t>
          <t text="wikipedia"><n start="2200" end="3400" pronunciation="wikipedia"/></t>
        </s>
        <s>
          <t text="another"><n start="4000" end="4900" pronunciation="another"/></t>
          <t text="sentence"><n start="5000" end="6200" pronunciation="sentence"/></t>
        </s></d>
        </article>"""
    )
    csvs = prepare_language(str(tmp_path), "english")
    rows = [r for c in csvs for r in read_csv(c)]
    assert {r["transcript"] for r in rows} == {
        "hello spoken wikipedia", "another sentence",
    }


def test_ccpmf_french_numbers():
    from stt_tpu.tools.import_ccpmf import french_number_words, maybe_normalize

    assert french_number_words(0) == "zéro"
    assert french_number_words(21) == "vingt et un"
    assert french_number_words(71) == "soixante et onze"
    assert french_number_words(80) == "quatre-vingts"
    assert french_number_words(95) == "quatre-vingt-quinze"
    assert french_number_words(200) == "deux cents"
    assert french_number_words(1959) == "mille neuf cent cinquante-neuf"
    assert french_number_words(50000) == "cinquante mille"
    assert maybe_normalize("le budget de 50 000 euros") == \
        "le budget de cinquante mille euros"
    assert "virgule" in maybe_normalize("croissance de 1,5")


def test_import_ccpmf(tmp_path):
    from stt_tpu.tools.import_ccpmf import preprocess_data

    make_wav(str(tmp_path / "session1.wav"), seconds=20.0)
    (tmp_path / "session1.xml").write_text(
        '<data>'
        '<row timestamp="0.2" timedur="2.0">bonjour à tous </row>'
        '<row timestamp="2.4" timedur="2.0">et bienvenue</row>'
        '<row timestamp="14.0" timedur="3.0">le budget est de 200 euros</row>'
        '</data>'
    )
    csvs = preprocess_data(str(tmp_path))
    rows = [r for c in csvs for r in read_csv(c)]
    texts = {r["transcript"] for r in rows}
    # contiguous rows merged; distant row separate; digits spelled out
    assert "bonjour à tous et bienvenue" in texts
    assert "le budget est de deux cents euros" in texts


def test_import_mls_flac_and_opus(tmp_path, capsys):
    from stt_tpu.tools.import_mls import import_language

    split = tmp_path / "dev"
    audio = split / "audio" / "9" / "12"
    audio.mkdir(parents=True)
    shutil.copy(SMOKE_FLAC, audio / "9_12_000001.flac")
    shutil.copy(SMOKE_OPUS, audio / "9_12_000002.opus")
    (split / "transcripts.txt").write_text(
        "9_12_000001\tfirst utterance text\n"
        "9_12_000002\tsecond utterance text\n"
    )
    [csv_path] = import_language(str(tmp_path), "english")
    rows = read_csv(csv_path)
    assert len(rows) == 2
    # both releases convert to 16 kHz wavs (opus decodes via libopus)
    assert rows[0]["wav_filename"].endswith(".wav")
    assert rows[1]["wav_filename"].endswith(".wav")
    assert "libopus" not in capsys.readouterr().out
