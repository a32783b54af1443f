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

from ..models.svm import LinearSVC, SVMPipeline, fit_platt_sigmoid
from .metrics import classification_metrics, f1_macro
from .splits import StratifiedKFold


def _use_device_solver(device) -> bool:
    """Resolve the ``device`` tri-state: None = auto (batched device SMO on
    an accelerator backend, host NumPy on CPU)."""
    if device is not None:
        return bool(device)
    import jax

    return jax.default_backend() != "cpu"


def _fit_linear_svcs_batch(
    problems: Sequence[Tuple[np.ndarray, np.ndarray]],
    C: float,
    seed: int,
    probability: bool,
    calibration_folds: int = 5,
) -> List[LinearSVC]:
    """Fit many independent LinearSVCs as ONE batched device SMO program.

    Each problem is (X_fit, y); with ``probability`` every problem also
    contributes its Platt calibration folds (libsvm's internal stratified
    5-fold, exactly as models/svm.py:LinearSVC.fit) as extra lanes — the
    standard 5-fold CV becomes 30 lanes of one dispatch instead of 30
    sequential libsvm solves (reference src/cv_strategies.py:49-53). Rows
    pad with a validity mask, features pad with zero columns, so every
    (fold × grid-point × calibration) fit shares one program shape.
    """
    from ..models.svm_device import smo_linear_batch

    lanes: List[Tuple[np.ndarray, np.ndarray]] = []
    specs = []
    for Xk, y in problems:
        Xk = np.asarray(Xk, dtype=np.float64)
        y = np.asarray(y)
        classes = np.unique(y)
        if len(classes) != 2:
            raise ValueError(
                "LinearSVC is binary; got classes " + str(classes)
            )
        y_pm = np.where(y == classes[1], 1.0, -1.0)
        main = len(lanes)
        lanes.append((Xk, y_pm))
        calib = []
        if probability:
            folds = min(
                calibration_folds,
                int(min(np.bincount((y_pm > 0).astype(int)))),
            )
            if folds >= 2:
                skf = StratifiedKFold(folds, shuffle=True, random_state=seed)
                for tr, te in skf.split(Xk, y_pm):
                    calib.append((len(lanes), te))
                    lanes.append((Xk[tr], y_pm[tr]))
        specs.append((main, calib, y_pm, classes, Xk))

    n_max = max(x.shape[0] for x, _ in lanes)
    d_max = max(x.shape[1] for x, _ in lanes)
    Xs = np.zeros((len(lanes), n_max, d_max), np.float32)
    ys = np.ones((len(lanes), n_max), np.float32)
    valid = np.zeros((len(lanes), n_max), bool)
    for l, (x, y_pm) in enumerate(lanes):
        Xs[l, : len(x), : x.shape[1]] = x
        ys[l, : len(x)] = y_pm
        valid[l, : len(x)] = True
    w, b, _ = smo_linear_batch(Xs, ys, valid, C=C)

    out: List[LinearSVC] = []
    for main, calib, y_pm, classes, Xk in specs:
        clf = LinearSVC(C=C, probability=probability, random_state=seed)
        clf.classes_ = classes
        d_i = Xk.shape[1]
        clf.coef_ = np.asarray(w[main][:d_i], dtype=np.float64)
        clf.intercept_ = float(b[main])
        if probability:
            if calib:
                dv = np.zeros(len(y_pm))
                for lane, te in calib:
                    dv[te] = Xk[te] @ np.asarray(
                        w[lane][:d_i], np.float64
                    ) + float(b[lane])
            else:
                dv = Xk @ clf.coef_ + clf.intercept_
            clf._platt = fit_platt_sigmoid(dv, y_pm > 0)
        out.append(clf)
    return out


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
    device: Optional[bool] = None,
) -> Tuple[pd.DataFrame, List[dict]]:
    """Fixed-k stratified K-fold SVM evaluation.

    ``device=None`` auto-selects: on an accelerator backend all SVC fits
    of the run (each fold's main fit + its 5 Platt calibration fits) solve
    as ONE batched device SMO program (see _fit_linear_svcs_batch); on CPU
    the f64 host solver runs fold-by-fold, as the reference does."""
    cols = _column_names(X)
    Xv, yv = _values(X), np.asarray(y)
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    folds = list(skf.split(Xv, yv))

    pipes: List[SVMPipeline] = []
    if _use_device_solver(device):
        problems = []
        for tr, _ in folds:
            pipe = SVMPipeline(
                k=n_features_to_select, C=C, probability=True,
                random_state=seed,
            )
            Xs = pipe.scaler.fit_transform(Xv[tr])
            Xk = pipe.selector.fit_transform(Xs, yv[tr])
            problems.append((Xk, yv[tr]))
            pipes.append(pipe)
        for pipe, clf in zip(
            pipes, _fit_linear_svcs_batch(problems, C, seed, probability=True)
        ):
            pipe.clf = clf
    else:
        for tr, _ in folds:
            pipes.append(
                SVMPipeline(
                    k=n_features_to_select, C=C, probability=True,
                    random_state=seed,
                ).fit(Xv[tr], yv[tr])
            )

    results, fold_predictions = [], []
    for fold, ((tr, te), pipe) in enumerate(zip(folds, pipes)):
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
    device: Optional[bool] = None,
) -> Tuple[pd.DataFrame, List[dict]]:
    """Nested CV: inner grid search over k, outer unbiased evaluation.

    ``device=None`` auto-selects the batched device SMO on an accelerator
    backend: the ENTIRE inner grid (outer folds × k values × inner folds,
    75 fits at reference scale) solves as one device program, then the 5
    best-k refits (+ Platt calibration fits) as a second — two dispatches
    replacing 105 sequential libsvm solves (src/cv_strategies.py:136-137).
    """
    cols = _column_names(X)
    Xv, yv = _values(X), np.asarray(y)
    ks = list(k_grid) if k_grid is not None else default_k_grid(Xv.shape[1])
    outer = StratifiedKFold(n_splits=n_splits_outer, shuffle=True, random_state=seed)
    outer_folds = list(outer.split(Xv, yv))
    results, fold_predictions = [], []

    if _use_device_solver(device):
        from ..models.svm import StandardScaler, f_classif

        # Phase A: every (outer fold × inner fold × k) grid fit as one
        # batched solve. The per-(outer, inner) scaler and ANOVA-F scores
        # are shared across the k grid — SelectKBest only re-slices them.
        problems, meta = [], []
        for fold, (tr, te) in enumerate(outer_folds):
            X_tr, y_tr = Xv[tr], yv[tr]
            inner = StratifiedKFold(
                n_splits=n_splits_inner, shuffle=True, random_state=seed
            )
            inner_splits = list(inner.split(X_tr, y_tr))
            for ii, (itr, ite) in enumerate(inner_splits):
                scaler = StandardScaler().fit(X_tr[itr])
                Xs = scaler.transform(X_tr[itr])
                scores, _ = f_classif(Xs, y_tr[itr])
                scores = np.where(np.isnan(scores), -np.inf, scores)
                order = np.argsort(scores, kind="mergesort")
                for ki, k in enumerate(ks):
                    idx = np.sort(order[-min(k, Xs.shape[1]):])
                    problems.append((Xs[:, idx], y_tr[itr]))
                    meta.append((fold, ki, ii, scaler, idx, ite))
        clfs = _fit_linear_svcs_batch(problems, C, seed, probability=False)
        grid_scores = np.zeros((len(outer_folds), len(ks), n_splits_inner))
        for clf, (fold, ki, ii, scaler, idx, ite) in zip(clfs, meta):
            tr, _ = outer_folds[fold]
            X_tr, y_tr = Xv[tr], yv[tr]
            y_pred = clf.predict(scaler.transform(X_tr[ite])[:, idx])
            grid_scores[fold, ki, ii] = f1_macro(y_tr[ite], y_pred)
        best_ks = [
            ks[int(np.argmax(grid_scores[fold].mean(axis=1)))]
            for fold in range(len(outer_folds))
        ]

        # Phase B: the best-k refit per outer fold (+ calibration lanes).
        best_pipes, refit_problems = [], []
        for fold, (tr, te) in enumerate(outer_folds):
            pipe = SVMPipeline(
                k=best_ks[fold], C=C, probability=True, random_state=seed
            )
            Xs = pipe.scaler.fit_transform(Xv[tr])
            Xk = pipe.selector.fit_transform(Xs, yv[tr])
            refit_problems.append((Xk, yv[tr]))
            best_pipes.append(pipe)
        for pipe, clf in zip(
            best_pipes,
            _fit_linear_svcs_batch(refit_problems, C, seed, probability=True),
        ):
            pipe.clf = clf

        for fold, ((tr, te), best_pipe) in enumerate(
            zip(outer_folds, best_pipes)
        ):
            y_pred = best_pipe.predict(Xv[te])
            y_prob = best_pipe.predict_proba(Xv[te])[:, 1]
            fold_predictions.append({"y_true": yv[te], "y_prob": y_prob})
            selected = [
                c for c, keep in zip(cols, best_pipe.get_support()) if keep
            ]
            results.append(
                {
                    "fold": fold + 1,
                    "best_k_found": best_ks[fold],
                    **classification_metrics(yv[te], y_pred, y_prob),
                    "selected_features": selected,
                }
            )
        return pd.DataFrame(results), fold_predictions

    for fold, (tr, te) in enumerate(outer_folds):
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
