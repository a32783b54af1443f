"""Reference parity fixtures.

Golden values transcribed from the reference's notebook outputs (the corpus
audio itself is not distributed — the reference checkout carries only LFS
pointers — so the numeric parity tests activate only when a real
Androids-Corpus directory is supplied via ``RSAF_CORPUS_DIR``).

Sources: nb01 cell 7 (5-file MSHDS golden rows), nb02 cell 2 (dataset
shapes), nb03 cells 1-2 (sequence shapes, participant counts). See
SURVEY.md §2.4/§6.4.
"""

import os

import numpy as np
import pandas as pd
import pytest

CORPUS = os.environ.get("RSAF_CORPUS_DIR")

# nb01 cell 7: golden MSHDS values for the first five reading-task files
# (subset of columns shown in the notebook output; full-precision).
GOLDEN_MSHDS = pd.DataFrame(
    [
        {"filename": "01_CF56_1.wav", "Speaking_Rate": 3.221843,
         "Articulation_Rate": 4.078672, "Phonation_Ratio": 0.789924,
         "Pause_Rate": 0.342143, "Mean_Pause_Duration": 0.614000,
         "mean_F0": 135.486474, "stdev_F0_Semitone": 3.477464,
         "mean_dB": 63.951329, "range_ratio_dB": 2.155580,
         "mean_B1_Loc": 255.168680, "std_B1_Loc": 286.616317,
         "mean_F2_Loc": 1633.716904, "std_F2_Loc": 488.536986,
         "mean_B2_Loc": 594.657072, "std_B2_Loc": 716.782932,
         "Spectral_Gravity": 355.206497, "Spectral_Std_Dev": 337.788948,
         "Spectral_Skewness": 5.964434, "Spectral_Kurtosis": 70.606271},
        {"filename": "02_CM57_2.wav", "Speaking_Rate": 3.402797,
         "Articulation_Rate": 4.119856, "Phonation_Ratio": 0.825951,
         "Pause_Rate": 0.253400, "Mean_Pause_Duration": 0.686857,
         "mean_F0": 95.854561, "stdev_F0_Semitone": 3.352660,
         "mean_dB": 65.361857, "range_ratio_dB": 2.016766,
         "mean_B1_Loc": 242.927026, "std_B1_Loc": 253.067458,
         "mean_F2_Loc": 1614.980076, "std_F2_Loc": 448.984263,
         "mean_B2_Loc": 492.187366, "std_B2_Loc": 439.490258,
         "Spectral_Gravity": 363.889176, "Spectral_Std_Dev": 393.584860,
         "Spectral_Skewness": 6.691924, "Spectral_Kurtosis": 121.864942},
        {"filename": "03_CF30_3.wav", "Speaking_Rate": 4.388955,
         "Articulation_Rate": 5.117387, "Phonation_Ratio": 0.857656,
         "Pause_Rate": 0.177931, "Mean_Pause_Duration": 0.800000,
         "mean_F0": 201.023993, "stdev_F0_Semitone": 2.082710,
         "mean_dB": 65.586717, "range_ratio_dB": 2.360642,
         "mean_B1_Loc": 260.924023, "std_B1_Loc": 288.588630,
         "mean_F2_Loc": 1704.686010, "std_F2_Loc": 484.051893,
         "mean_B2_Loc": 662.627477, "std_B2_Loc": 905.501959,
         "Spectral_Gravity": 460.918213, "Spectral_Std_Dev": 421.403730,
         "Spectral_Skewness": 5.051323, "Spectral_Kurtosis": 55.662546},
        {"filename": "04_CF57_3.wav", "Speaking_Rate": 4.384482,
         "Articulation_Rate": 5.207409, "Phonation_Ratio": 0.841970,
         "Pause_Rate": 0.259297, "Mean_Pause_Duration": 0.609455,
         "mean_F0": 173.834010, "stdev_F0_Semitone": 2.489167,
         "mean_dB": 68.230038, "range_ratio_dB": 3.053060,
         "mean_B1_Loc": 147.257021, "std_B1_Loc": 133.237838,
         "mean_F2_Loc": 1553.763156, "std_F2_Loc": 398.784342,
         "mean_B2_Loc": 371.078992, "std_B2_Loc": 485.221797,
         "Spectral_Gravity": 576.765021, "Spectral_Std_Dev": 477.447754,
         "Spectral_Skewness": 4.396186, "Spectral_Kurtosis": 39.211027},
        {"filename": "05_CF41_3.wav", "Speaking_Rate": 4.676964,
         "Articulation_Rate": 5.254031, "Phonation_Ratio": 0.890167,
         "Pause_Rate": 0.201160, "Mean_Pause_Duration": 0.546000,
         "mean_F0": 197.308449, "stdev_F0_Semitone": 3.552315,
         "mean_dB": 69.091985, "range_ratio_dB": 3.231895,
         "mean_B1_Loc": 179.709255, "std_B1_Loc": 253.194893,
         "mean_F2_Loc": 1557.978158, "std_F2_Loc": 543.890373,
         "mean_B2_Loc": 571.127516, "std_B2_Loc": 632.109680,
         "Spectral_Gravity": 457.281058, "Spectral_Std_Dev": 344.699651,
         "Spectral_Skewness": 6.319892, "Spectral_Kurtosis": 83.131251},
    ]
)

# nb02 cell 2: X shapes per dataset configuration; nb03: sequence facts.
EXPECTED_DATASET_SHAPES = {
    "mshds_reading": (111, 25), "mshds_interview": (109, 50),
    "mshds_combined": (109, 75),
    "opensmile_reading": (111, 911), "opensmile_interview": (109, 1822),
    "opensmile_combined": (109, 2733),
    "wav2vec2_reading": (111, 768), "wav2vec2_interview": (109, 1536),
    "wav2vec2_combined": (109, 2304),
}
EXPECTED_CORPUS_FACTS = {
    "reading_files": 111, "interview_clips": 866,
    "class_balance": (57, 54),  # Patient / Control
    "example_sequence": ("01_CF56_1.wav", (4378, 768)),
}


def test_golden_table_well_formed():
    assert len(GOLDEN_MSHDS) == 5
    assert GOLDEN_MSHDS["mean_F0"].between(90, 210).all()


@pytest.mark.skipif(CORPUS is None, reason="set RSAF_CORPUS_DIR to run corpus parity")
def test_corpus_counts():
    from robust_speech_analysis_framework_tpu.data import load_androids_corpus

    reading_df, interview_df = load_androids_corpus(CORPUS, verbose=False)
    assert len(reading_df) == EXPECTED_CORPUS_FACTS["reading_files"]
    assert len(interview_df) == EXPECTED_CORPUS_FACTS["interview_clips"]
    n_p = (reading_df["label"] == "Patient").sum()
    n_c = (reading_df["label"] == "Control").sum()
    assert (n_p, n_c) == EXPECTED_CORPUS_FACTS["class_balance"]


@pytest.mark.skipif(CORPUS is None, reason="set RSAF_CORPUS_DIR to run corpus parity")
def test_mshds_golden_values():
    """Our MSHDS features vs the reference's Praat values on real audio.

    Tolerances are per-feature: frame-grid and algorithmic details differ
    from Praat at the margins, so rates/means must land within a few percent
    rather than bit-exactly.
    """
    from robust_speech_analysis_framework_tpu.data import load_androids_corpus
    from robust_speech_analysis_framework_tpu.features.mshds import (
        extract_mshds_features,
    )

    reading_df, _ = load_androids_corpus(CORPUS, verbose=False)
    sub = reading_df[reading_df["filename"].isin(GOLDEN_MSHDS["filename"])]
    ours = extract_mshds_features(sub, verbose=False).set_index("filename")
    gold = GOLDEN_MSHDS.set_index("filename")
    rel_tol = {"mean_F0": 0.03, "mean_dB": 0.05, "Speaking_Rate": 0.25,
               "Phonation_Ratio": 0.15, "Spectral_Gravity": 0.25}
    for feat, tol in rel_tol.items():
        for name in gold.index:
            a, b = ours.loc[name, feat], gold.loc[name, feat]
            assert abs(a - b) / abs(b) < tol, (feat, name, a, b)


@pytest.mark.skipif(CORPUS is None, reason="set RSAF_CORPUS_DIR to run corpus parity")
def test_wav2vec2_example_sequence_shape():
    from robust_speech_analysis_framework_tpu.data import load_androids_corpus
    from robust_speech_analysis_framework_tpu.features.wav2vec2 import (
        extract_wav2vec2_sequences,
    )

    reading_df, _ = load_androids_corpus(CORPUS, verbose=False)
    name, shape = EXPECTED_CORPUS_FACTS["example_sequence"]
    sub = reading_df[reading_df["filename"] == name]
    seqs = extract_wav2vec2_sequences(sub, verbose=False)
    assert seqs[name].shape == shape
