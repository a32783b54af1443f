"""Corpus loader + aggregation tests on a synthetic corpus tree."""

import os
import struct
import wave

import numpy as np
import pandas as pd
import pytest

from robust_speech_analysis_framework_tpu.data import (
    aggregate_clip_features,
    aggregate_interview_sequences,
    load_androids_corpus,
    parse_androids_filename,
)
from robust_speech_analysis_framework_tpu.data.corpus import load_fold_lists


def _write_wav(path, n=1600, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack(f"<{n}h", *([0] * n)))


@pytest.fixture
def corpus(tmp_path):
    root = tmp_path / "Androids-Corpus"
    hc = root / "Reading-Task" / "audio" / "HC"
    pt = root / "Reading-Task" / "audio" / "PT"
    clips = root / "Interview-Task" / "audio_clip"
    for d in (hc, pt, clips):
        d.mkdir(parents=True)
    _write_wav(hc / "01_CF56_1.wav")
    _write_wav(hc / "02_CM57_2.wav")
    _write_wav(pt / "10_PF44_3.wav")
    (hc / "bad_name.wav").write_bytes(b"")
    sess = clips / "01_CF56_1"
    sess.mkdir()
    _write_wav(sess / "clip_001.wav")
    _write_wav(sess / "clip_002.wav")
    bad_sess = clips / "59_PF36_x"
    bad_sess.mkdir()
    _write_wav(bad_sess / "clip_001.wav")
    (root / "fold-lists.csv").write_text(
        "reading,,,,,interview,,,,\n"
        "fold1,fold2,fold3,fold4,fold5,fold1.1,fold2.1,fold3.1,fold4.1,fold5.1\n"
        "01_CF56_1.wav,02_CM57_2,,,,'01_CF56_1',,,,\n"
    )
    return root


def test_parse_filename_fields():
    m = parse_androids_filename("01_CF56_1.wav")
    assert m.unique_participant_id == "01_C"
    assert m.label == "Control"
    assert m.gender == "Female"
    assert m.age == 56
    assert m.education == 1
    assert parse_androids_filename("59_PF36_x.wav") is None
    p = parse_androids_filename("10_PF44_3.wav")
    assert p.label == "Patient"
    x = parse_androids_filename("11_XM20_0.wav")
    assert x.label == "Unknown"


def test_fold_lists(corpus):
    r, i = load_fold_lists(str(corpus / "fold-lists.csv"))
    assert r == {"01_CF56_1": 1, "02_CM57_2": 2}
    assert i == {"01_CF56_1": 1}


def test_load_corpus(corpus):
    reading_df, interview_df = load_androids_corpus(str(corpus), verbose=False)
    assert len(reading_df) == 3  # bad_name.wav skipped
    assert set(reading_df["task_type"]) == {"Reading"}
    row = reading_df[reading_df["filename"] == "01_CF56_1.wav"].iloc[0]
    assert row["fold"] == 1
    assert row["label"] == "Control"
    # file not in fold list gets -1
    assert reading_df[reading_df["filename"] == "10_PF44_3.wav"].iloc[0]["fold"] == -1
    # unparseable session folder skipped entirely
    assert len(interview_df) == 2
    assert set(interview_df["original_session_filename"]) == {"01_CF56_1"}
    assert interview_df.iloc[0]["fold"] == 1


def test_aggregate_clip_features():
    meta = pd.DataFrame(
        {
            "filename": ["a.wav", "b.wav", "c.wav"],
            "unique_participant_id": ["01_C", "01_C", "02_P"],
        }
    )
    feats = pd.DataFrame(
        {"filename": ["a.wav", "b.wav", "c.wav"], "f0": [1.0, 3.0, 5.0], "hnr": [2.0, 2.0, 7.0]}
    )
    agg = aggregate_clip_features(feats, meta)
    assert list(agg.columns) == ["unique_participant_id", "f0_mean", "f0_std", "hnr_mean", "hnr_std"]
    r = agg[agg["unique_participant_id"] == "01_C"].iloc[0]
    assert r["f0_mean"] == 2.0
    assert r["f0_std"] == pytest.approx(np.std([1.0, 3.0], ddof=1))
    assert aggregate_clip_features(pd.DataFrame(), meta).empty


def test_aggregate_sequences():
    meta = pd.DataFrame(
        {
            "filename": ["a.wav", "b.wav", "c.wav", "d.wav"],
            "unique_participant_id": ["01_C", "01_C", "02_P", "03_P"],
        }
    )
    seqs = {
        "a.wav": np.ones((3, 4)),
        "b.wav": 2 * np.ones((2, 4)),
        "c.wav": np.zeros((5, 4)),
        # d.wav missing -> participant 03_P dropped
    }
    out = aggregate_interview_sequences(seqs, meta)
    assert set(out) == {"01_C", "02_P"}
    assert out["01_C"].shape == (5, 4)
    np.testing.assert_array_equal(out["01_C"][:3], 1.0)
    np.testing.assert_array_equal(out["01_C"][3:], 2.0)


def test_fold_lists_duplicate_headers(tmp_path):
    """The real fold-lists.csv repeats `fold1..fold5` for both tasks; the
    reference resolves the second group via pandas duplicate mangling
    (`fold1.1`). Our parser must replicate that (src/data_loader.py:31-35)."""
    p = tmp_path / "fold-lists.csv"
    p.write_text(
        "reading,,,,,interview,,,,\n"
        "fold1,fold2,fold3,fold4,fold5,fold1,fold2,fold3,fold4,fold5\n"
        "01_CF56_1.wav,02_CM57_2,,,,'07_PM41_2',,,08_CF30_1,\n"
    )
    r, i = load_fold_lists(str(p))
    assert r == {"01_CF56_1": 1, "02_CM57_2": 2}
    assert i == {"07_PM41_2": 1, "08_CF30_1": 4}
