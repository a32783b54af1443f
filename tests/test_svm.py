"""SVM stack vs scikit-learn oracles."""

import warnings

import numpy as np
import pytest
import sklearn.feature_selection as skfs
import sklearn.preprocessing as skpre
from sklearn.svm import SVC

from robust_speech_analysis_framework_tpu.models.svm import (
    LinearSVC,
    SelectKBest,
    StandardScaler,
    SVMPipeline,
    f_classif,
    fit_platt_sigmoid,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(90, 25))
    y = (X[:, 0] + 0.5 * X[:, 1] - 0.3 * X[:, 4] + rng.normal(0, 0.6, 90) > 0).astype(int)
    return X, y


def test_standard_scaler_matches_sklearn(data):
    X, _ = data
    ours = StandardScaler().fit_transform(X)
    theirs = skpre.StandardScaler().fit_transform(X)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_scaler_constant_feature():
    X = np.ones((10, 2))
    X[:, 1] = np.arange(10)
    out = StandardScaler().fit_transform(X)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, 0], 0.0)


def test_f_classif_matches_sklearn(data):
    X, y = data
    ours, _ = f_classif(X, y)
    theirs, _ = skfs.f_classif(X, y)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_selectkbest_matches_sklearn(data):
    X, y = data
    ours = SelectKBest(f_classif, k=10).fit(X, y)
    theirs = skfs.SelectKBest(skfs.f_classif, k=10).fit(X, y)
    np.testing.assert_array_equal(ours.get_support(), theirs.get_support())


def test_linear_svc_matches_sklearn(data):
    X, y = data
    ours = LinearSVC().fit(X, y)
    ref = SVC(kernel="linear").fit(X, y)
    np.testing.assert_allclose(ours.coef_, ref.coef_[0], atol=5e-3)
    assert abs(ours.intercept_ - ref.intercept_[0]) < 5e-3
    dec_ours = ours.decision_function(X)
    dec_ref = ref.decision_function(X)
    np.testing.assert_allclose(dec_ours, dec_ref, atol=2e-2)
    assert (ours.predict(X) == ref.predict(X)).mean() == 1.0


def test_linear_svc_string_labels(data):
    X, y = data
    ys = np.where(y == 1, "Patient", "Control")
    model = LinearSVC().fit(X, ys)
    assert set(model.predict(X)) <= {"Patient", "Control"}


def test_probabilities_track_sklearn(data):
    X, y = data
    ours = LinearSVC(probability=True, random_state=42).fit(X, y)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = SVC(kernel="linear", probability=True, random_state=42).fit(X, y)
    po = ours.predict_proba(X)[:, 1]
    pr = ref.predict_proba(X)[:, 1]
    # Calibration CV shuffles differ (libsvm internal RNG); ranking must agree
    assert np.corrcoef(po, pr)[0, 1] > 0.99
    assert np.abs(po - pr).mean() < 0.06
    assert np.all((po >= 0) & (po <= 1))


def test_platt_sigmoid_sane():
    rng = np.random.default_rng(2)
    f = np.concatenate([rng.normal(-2, 1, 50), rng.normal(2, 1, 50)])
    y = np.concatenate([np.zeros(50), np.ones(50)])
    A, B = fit_platt_sigmoid(f, y)
    assert A < 0  # larger decision value → higher P(y=1)
    p_hi = 1 / (1 + np.exp(A * 3 + B))
    p_lo = 1 / (1 + np.exp(A * -3 + B))
    assert p_hi > 0.9 and p_lo < 0.1


def test_pipeline_fit_predict(data):
    X, y = data
    pipe = SVMPipeline(k=10).fit(X, y)
    assert pipe.get_support().sum() == 10
    acc = (pipe.predict(X) == y).mean()
    assert acc > 0.8
    probs = pipe.predict_proba(X)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)
