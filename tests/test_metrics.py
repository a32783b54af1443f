"""Metric implementations must agree with scikit-learn."""

import numpy as np
import pytest
import sklearn.metrics as skm

from robust_speech_analysis_framework_tpu.eval import metrics as M


@pytest.mark.parametrize("seed", range(5))
def test_binary_metrics_match_sklearn(seed):
    rng = np.random.default_rng(seed)
    y_true = rng.integers(0, 2, size=40)
    y_pred = rng.integers(0, 2, size=40)
    y_prob = rng.random(40)
    if len(np.unique(y_true)) < 2:
        return
    assert M.accuracy_score(y_true, y_pred) == pytest.approx(
        skm.accuracy_score(y_true, y_pred)
    )
    p, r, f = M.precision_recall_f1_macro(y_true, y_pred)
    assert p == pytest.approx(skm.precision_score(y_true, y_pred, average="macro", zero_division=0))
    assert r == pytest.approx(skm.recall_score(y_true, y_pred, average="macro", zero_division=0))
    assert f == pytest.approx(skm.f1_score(y_true, y_pred, average="macro"))
    assert M.roc_auc_score(y_true, y_prob) == pytest.approx(
        skm.roc_auc_score(y_true, y_prob)
    )


def test_auc_with_ties():
    y_true = np.array([0, 0, 1, 1, 0, 1])
    y_prob = np.array([0.5, 0.5, 0.5, 0.8, 0.2, 0.8])
    assert M.roc_auc_score(y_true, y_prob) == pytest.approx(
        skm.roc_auc_score(y_true, y_prob)
    )


def test_roc_curve_matches_sklearn_auc():
    rng = np.random.default_rng(3)
    y_true = rng.integers(0, 2, size=60)
    y_prob = np.round(rng.random(60), 2)  # force ties
    fpr, tpr, _ = M.roc_curve(y_true, y_prob)
    auc_trapz = np.trapezoid(tpr, fpr)
    assert auc_trapz == pytest.approx(skm.roc_auc_score(y_true, y_prob))


def test_zero_division_precision():
    y_true = np.array([0, 1, 1, 1])
    y_pred = np.array([1, 1, 1, 1])  # class 0 never predicted
    p, r, f = M.precision_recall_f1_macro(y_true, y_pred)
    assert p == pytest.approx(
        skm.precision_score(y_true, y_pred, average="macro", zero_division=0)
    )


def test_mean_roc_interpolated_shape():
    rng = np.random.default_rng(0)
    folds = [
        {"y_true": rng.integers(0, 2, 20), "y_prob": rng.random(20)}
        for _ in range(5)
    ]
    grid, mean_tpr, std_tpr = M.mean_roc_interpolated(folds)
    assert grid.shape == mean_tpr.shape == std_tpr.shape == (100,)
    assert mean_tpr[-1] == 1.0


def test_roc_auc_pos_label_is_greater_class():
    """sklearn semantics: positive label is the greater class, whatever the
    encoding (regression: label 1 was hardcoded positive)."""
    from sklearn.metrics import roc_auc_score as sk_auc

    rng = np.random.default_rng(11)
    y01 = rng.integers(0, 2, 40)
    score = rng.random(40)
    for remap in (lambda y: y + 1, lambda y: np.where(y == 1, "Patient", "Control")):
        y = remap(y01)
        ours = M.roc_auc_score(y, score)
        try:
            theirs = sk_auc(y01, score)
        except ValueError:
            continue
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_roc_auc_three_classes_raise():
    with pytest.raises(ValueError, match="2 classes"):
        M.roc_auc_score([0, 1, 2, 1], [0.1, 0.5, 0.9, 0.4])
