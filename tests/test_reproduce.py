"""Reproduction-harness comparison logic (eval/reproduce.py)."""

import numpy as np
import pandas as pd

from robust_speech_analysis_framework_tpu.eval.reproduce import (
    PUBLISHED_CNN_LSTM,
    PUBLISHED_SVM,
    compare_to_published,
    reproduction_report,
)


def _fake_results(names, acc=0.74, f1=0.73, auc=0.81):
    return {
        n: {"results_df": pd.DataFrame({
            "fold": range(1, 6),
            "accuracy": [acc] * 5,
            "f1_score": [f1] * 5,
            "auc": [auc] * 5,
        })}
        for n in names
    }


def test_published_tables_complete():
    assert len(PUBLISHED_SVM) == 18
    assert len(PUBLISHED_CNN_LSTM) == 6
    for pub in PUBLISHED_SVM.values():
        assert set(pub) == {"accuracy", "f1_macro", "auc"}


def test_compare_within_noise_flags():
    res = _fake_results(["mshds_reading_standard"], acc=0.738, f1=0.735, auc=0.810)
    cmp_df = compare_to_published(res, {"mshds_reading_standard":
                                        PUBLISHED_SVM["mshds_reading_standard"]})
    assert cmp_df["within_noise"].all()
    # 5 sigma off -> flagged
    res_bad = _fake_results(["mshds_reading_standard"], acc=0.3, f1=0.3, auc=0.3)
    cmp_bad = compare_to_published(res_bad, {"mshds_reading_standard":
                                             PUBLISHED_SVM["mshds_reading_standard"]})
    assert not cmp_bad["within_noise"].any()


def test_missing_experiments_reported():
    cmp_df = compare_to_published({}, None)
    assert cmp_df["missing"].all()
    rep = reproduction_report(cmp_df)
    assert rep["experiments_total"] == 24
    assert rep["experiments_run"] == 0


def test_full_battery_report_counts():
    names = list(PUBLISHED_SVM) + list(PUBLISHED_CNN_LSTM)
    res = _fake_results(names)
    rep = reproduction_report(compare_to_published(res))
    assert rep["experiments_run"] == 24
    assert rep["metrics_compared"] == rep["metrics_total"]
    assert len(rep["worst_diffs"]) == 5
