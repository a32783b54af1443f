"""StratifiedKFold must match scikit-learn's fold assignment exactly."""

import numpy as np
import pytest
import sklearn.model_selection as skms

from robust_speech_analysis_framework_tpu.eval.splits import (
    StratifiedKFold,
    train_test_indices,
)


@pytest.mark.parametrize("n", [17, 111, 109, 114])
@pytest.mark.parametrize("n_splits", [3, 5])
@pytest.mark.parametrize("seed", [0, 42])
def test_matches_sklearn_shuffled(n, n_splits, seed):
    rng = np.random.default_rng(seed + n)
    y = rng.integers(0, 2, size=n)
    while min(np.bincount(y)) < n_splits:
        y = rng.integers(0, 2, size=n)
    X = np.zeros((n, 3))
    ours = list(StratifiedKFold(n_splits, shuffle=True, random_state=seed).split(X, y))
    theirs = list(
        skms.StratifiedKFold(n_splits, shuffle=True, random_state=seed).split(X, y)
    )
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_matches_sklearn_unshuffled():
    y = np.array([0, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0])
    X = np.zeros((len(y), 1))
    ours = list(StratifiedKFold(3).split(X, y))
    theirs = list(skms.StratifiedKFold(3).split(X, y))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_string_labels_match_sklearn():
    y = np.array(["Patient", "Control"] * 20 + ["Patient"])
    X = np.zeros((len(y), 1))
    ours = list(StratifiedKFold(5, shuffle=True, random_state=42).split(X, y))
    theirs = list(
        skms.StratifiedKFold(5, shuffle=True, random_state=42).split(X, y)
    )
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(te_a, te_b)


def test_train_test_indices_is_first_fold():
    y = np.array([0, 1] * 20)
    tr, te = train_test_indices(y, n_splits=5, seed=42)
    skf = skms.StratifiedKFold(5, shuffle=True, random_state=42)
    tr_ref, te_ref = next(iter(skf.split(np.zeros(len(y)), y)))
    np.testing.assert_array_equal(tr, tr_ref)
    np.testing.assert_array_equal(te, te_ref)


def test_rejects_small_class():
    y = np.array([0] * 10 + [1])
    with pytest.raises(ValueError):
        list(StratifiedKFold(5).split(np.zeros((11, 1)), y))
