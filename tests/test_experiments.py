"""Full-pipeline integration: synthetic corpus → extraction → SVM + DL CV.

The framework's flagship end-to-end test (reference workflow nb01→nb02→nb03
on a miniature corpus). Uses same-length synthetic files so each jitted op
compiles once, and a 2-layer Wav2Vec2 for speed.
"""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

from robust_speech_analysis_framework_tpu.audio.io import write_wav
from robust_speech_analysis_framework_tpu.experiments import (
    build_svm_datasets,
    build_sequence_sets,
    extract_all_features,
    run_all_svm_experiments,
)

SR = 16000
N_PER_CLASS = 6


def _speech(f0, seed, seconds=1.2):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    v = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 10))
    gate = np.where((t % 0.5) < 0.35, 1.0, 0.02)
    return (0.3 * gate * v / np.abs(v).max() + 0.002 * rng.normal(size=len(t))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    hc = root / "Reading-Task" / "audio" / "HC"
    pt = root / "Reading-Task" / "audio" / "PT"
    clips = root / "Interview-Task" / "audio_clip"
    hc.mkdir(parents=True)
    pt.mkdir(parents=True)
    clips.mkdir(parents=True)
    for i in range(N_PER_CLASS):
        # controls higher-pitched than patients → separable features
        write_wav(str(hc / f"{i+1:02d}_CF3{i}_1.wav"), _speech(190 + 6 * i, i), SR)
        write_wav(
            str(pt / f"{i+21:02d}_PM4{i}_2.wav"), _speech(110 + 6 * i, 100 + i), SR
        )
        for pid, cond in ((f"{i+1:02d}_CF3{i}_1", 0), (f"{i+21:02d}_PM4{i}_2", 1)):
            sess = clips / pid
            sess.mkdir(exist_ok=True)
            for c in range(2):
                f0 = (190 if cond == 0 else 110) + 5 * c
                # clip basenames are globally unique in the real corpus — the
                # reference's aggregation merges on bare 'filename'
                # (src/utils.py:39), which a repeated basename would corrupt
                write_wav(
                    str(sess / f"{pid}_clip_{c:03d}.wav"),
                    _speech(f0, 200 + i * 2 + c, 0.9), SR,
                )
    (root / "fold-lists.csv").write_text("banner,,\nfold1,fold2,fold1.1\n,,\n")
    return str(root)


@pytest.fixture(scope="module")
def processed(corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("processed"))
    from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor
    from robust_speech_analysis_framework_tpu.models.wav2vec2 import Wav2Vec2Config

    ex = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=4, allow_random_init=True)
    paths = extract_all_features(
        corpus, out, features=("mshds", "opensmile", "wav2vec2"),
        wav2vec2_extractor=ex, verbose=False,
    )
    return out, paths


def test_extraction_artifacts(processed):
    out, paths = processed
    for name in (
        "features_mshds_reading_task.csv",
        "features_opensmile_reading_task.csv",
        "features_wav2vec2_reading_task.csv",
        "features_mshds_interview_task_aggregated.csv",
        "features_opensmile_interview_task_aggregated.csv",
        "features_wav2vec2_interview_task_aggregated.csv",
        "sequences_wav2vec2_reading.pkl",
        "sequences_wav2vec2_interview.pkl",
    ):
        assert os.path.exists(paths[name]), name
    reading = pd.read_csv(paths["features_mshds_reading_task.csv"])
    assert len(reading) == 2 * N_PER_CLASS
    assert "mean_F0" in reading.columns and "label" in reading.columns
    osm = pd.read_csv(paths["features_opensmile_reading_task.csv"])
    assert sum(c.endswith("_sma_amean") for c in osm.columns) == 38
    agg = pd.read_csv(paths["features_mshds_interview_task_aggregated.csv"])
    assert "mean_F0_mean" in agg.columns and "mean_F0_std" in agg.columns
    with open(paths["sequences_wav2vec2_reading.pkl"], "rb") as fh:
        seqs = pickle.load(fh)
    assert len(seqs) == 2 * N_PER_CLASS
    assert next(iter(seqs.values())).shape[1] == 768


def test_extraction_caching(processed, corpus):
    out, paths = processed
    p = paths["features_mshds_reading_task.csv"]
    mtime = os.path.getmtime(p)
    extract_all_features(corpus, out, features=("mshds",), verbose=False)
    assert os.path.getmtime(p) == mtime  # skip-if-exists honored


def test_svm_dataset_building(processed):
    out, _ = processed
    datasets = build_svm_datasets(out)
    assert set(datasets) == {
        f"{fs}_{kind}"
        for fs in ("mshds", "opensmile", "wav2vec2")
        for kind in ("reading", "interview", "combined")
    }
    d = datasets["mshds_reading"]
    assert d["X"].shape == (2 * N_PER_CLASS, 25)
    assert d["y"].sum() == N_PER_CLASS
    assert datasets["wav2vec2_reading"]["X"].shape[1] == 768
    assert datasets["mshds_interview"]["X"].shape[1] == 50
    assert datasets["mshds_combined"]["X"].shape[1] == 75
    # no metadata columns leaked into X
    for name, dd in datasets.items():
        assert not any("label" in c or "fold" in c for c in dd["X"].columns), name


def test_svm_experiments_on_mshds(processed, tmp_path):
    out, _ = processed
    # restrict to one dataset by pointing at the built datasets directly
    from robust_speech_analysis_framework_tpu.eval.svm_cv import (
        run_svm_standard_kfold_cv,
    )

    datasets = build_svm_datasets(out)
    d = datasets["mshds_reading"]
    df, preds = run_svm_standard_kfold_cv(
        d["X"], d["y"], n_splits=3, n_features_to_select=10
    )
    # pitch-separated classes → near-perfect CV accuracy
    assert df["accuracy"].mean() > 0.9


def test_sequence_sets(processed, corpus):
    out, _ = processed
    sets, meta = build_sequence_sets(out, corpus, verbose=False)
    assert set(sets) == {"reading", "interview", "combined"}
    assert len(sets["reading"]) == 2 * N_PER_CLASS
    assert len(sets["combined"]) == 2 * N_PER_CLASS
    pid = next(iter(sets["combined"]))
    t_r = sets["reading"][pid].shape[0]
    t_i = sets["interview"][pid].shape[0]
    assert sets["combined"][pid].shape == (t_r + t_i, 768)
    assert set(meta.columns) == {"unique_participant_id", "label"}
