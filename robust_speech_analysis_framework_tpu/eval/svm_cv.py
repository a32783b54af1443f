"""SVM cross-validation engines (standard + nested with grid search).

Capability parity with reference src/cv_strategies.py:

* :func:`run_svm_standard_kfold_cv` (:13-80) — stratified 5-fold; per fold
  fit scaler→SelectKBest(k fixed)→linear SVC with Platt probabilities on the
  train split, record acc/F1/precision/recall/AUC plus the selected feature
  names and raw (y_true, y_prob) for ROC analysis.
* :func:`run_svm_nested_kfold_cv` (:83-167) — outer 5-fold; inner 3-fold
  grid search over k ∈ {10,20,30,40,50} (adapted to {5,10,15,20,min(25,d)}
  when d<50, :122-124) scored by macro-F1; best-k pipeline refit on the full
  outer train split and evaluated on the outer test fold, recording
  ``best_k_found``.

All stages are first-party (models/svm.py); fold assignment is bit-identical
to the reference's seeded sklearn splitters (eval/splits.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..models.svm import SVMPipeline
from .metrics import classification_metrics, f1_macro
from .splits import StratifiedKFold


def _column_names(X) -> List[str]:
    if isinstance(X, pd.DataFrame):
        return list(X.columns)
    return [f"f{i}" for i in range(np.asarray(X).shape[1])]


def _values(X) -> np.ndarray:
    return X.to_numpy(dtype=float) if isinstance(X, pd.DataFrame) else np.asarray(X, dtype=float)


def default_k_grid(n_features: int) -> List[int]:
    """Reference k grids (cv_strategies.py:122-126), clamped to the feature
    count and de-duplicated: SelectKBest would silently clamp k>d, making the
    grid search fit identical duplicate models and report a best_k_found
    larger than the actual number of selected features."""
    grid = [5, 10, 15, 20, 25] if n_features < 50 else [10, 20, 30, 40, 50]
    seen, out = set(), []
    for k in grid:
        k = min(k, n_features)
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def run_svm_standard_kfold_cv(
    X,
    y,
    n_splits: int = 5,
    n_features_to_select: int = 50,
    C: float = 1.0,
    seed: int = 42,
) -> Tuple[pd.DataFrame, List[dict]]:
    """Fixed-k stratified K-fold SVM evaluation."""
    cols = _column_names(X)
    Xv, yv = _values(X), np.asarray(y)
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    results, fold_predictions = [], []
    for fold, (tr, te) in enumerate(skf.split(Xv, yv)):
        pipe = SVMPipeline(
            k=n_features_to_select, C=C, probability=True, random_state=seed
        ).fit(Xv[tr], yv[tr])
        y_pred = pipe.predict(Xv[te])
        y_prob = pipe.predict_proba(Xv[te])[:, 1]
        fold_predictions.append({"y_true": yv[te], "y_prob": y_prob})
        selected = [c for c, keep in zip(cols, pipe.get_support()) if keep]
        results.append(
            {
                "fold": fold + 1,
                **classification_metrics(yv[te], y_pred, y_prob),
                "selected_features": selected,
            }
        )
    return pd.DataFrame(results), fold_predictions


def run_svm_nested_kfold_cv(
    X,
    y,
    n_splits_outer: int = 5,
    n_splits_inner: int = 3,
    k_grid: Optional[Sequence[int]] = None,
    C: float = 1.0,
    seed: int = 42,
) -> Tuple[pd.DataFrame, List[dict]]:
    """Nested CV: inner grid search over k, outer unbiased evaluation."""
    cols = _column_names(X)
    Xv, yv = _values(X), np.asarray(y)
    ks = list(k_grid) if k_grid is not None else default_k_grid(Xv.shape[1])
    outer = StratifiedKFold(n_splits=n_splits_outer, shuffle=True, random_state=seed)
    results, fold_predictions = [], []
    for fold, (tr, te) in enumerate(outer.split(Xv, yv)):
        X_tr, y_tr = Xv[tr], yv[tr]
        # Inner grid search: mean macro-F1 over inner folds per k. The inner
        # splitter is re-seeded per outer fold exactly as GridSearchCV
        # re-splits the same cv object on each training set.
        inner = StratifiedKFold(
            n_splits=n_splits_inner, shuffle=True, random_state=seed
        )
        inner_splits = list(inner.split(X_tr, y_tr))
        mean_scores = []
        for k in ks:
            scores = []
            for itr, ite in inner_splits:
                pipe = SVMPipeline(k=k, C=C, probability=False, random_state=seed)
                pipe.fit(X_tr[itr], y_tr[itr])
                scores.append(f1_macro(y_tr[ite], pipe.predict(X_tr[ite])))
            mean_scores.append(float(np.mean(scores)))
        best_k = ks[int(np.argmax(mean_scores))]

        best_pipe = SVMPipeline(k=best_k, C=C, probability=True, random_state=seed)
        best_pipe.fit(X_tr, y_tr)
        y_pred = best_pipe.predict(Xv[te])
        y_prob = best_pipe.predict_proba(Xv[te])[:, 1]
        fold_predictions.append({"y_true": yv[te], "y_prob": y_prob})
        selected = [c for c, keep in zip(cols, best_pipe.get_support()) if keep]
        results.append(
            {
                "fold": fold + 1,
                "best_k_found": best_k,
                **classification_metrics(yv[te], y_pred, y_prob),
                "selected_features": selected,
            }
        )
    return pd.DataFrame(results), fold_predictions
