"""Reference-stack CPU baseline for the config-5 battery (BASELINE.json).

Times the SAME synthetic battery that ``benchmarks.suite.bench_battery``
measures on the chip — 9 reference-shaped SVM datasets × (standard fixed-k +
nested grid) plus 3 participant sequence sets × (TPE-tuned nested + standard
K-fold) — but on the reference's own software stack: sklearn
``Pipeline(StandardScaler → SelectKBest(f_classif, k) → SVC(kernel='linear',
probability=True))`` driven by ``StratifiedKFold``/``GridSearchCV`` exactly
as the reference's CV engine does (/root/reference/src/cv_strategies.py:38-53,
108-147), and a torch CNN-LSTM trained in the reference's sequential
per-batch epoch loops (/root/reference/src/dl_cv_strategies.py:87-165,
228-248). This is the honest "what would the reference cost on this host"
number for the battery stage — libsvm + torch, not our jax-cpu backend.

Two deliberate substitutions, both neutral for timing:
- Hyperparameter search uses this repo's TPE sampler (optuna is not
  installed here); each trial's cost is the torch training inside it, not
  the sampler arithmetic.
- The torch model comes from ``benchmarks.torch_baseline.build_torch_model``
  (architecture-equivalent rebuild from the published description; dropout
  placement differs slightly from src/models.py, which does not affect
  throughput).

Run: ``python -m benchmarks.ref_battery_baseline [--quick]``
Merges the measurement into ``benchmarks/baselines.json`` under
``"battery"`` with ``impl: "sklearn+torch-cpu"`` (the jax-cpu measurement,
if present, moves to ``"battery_jaxcpu"``).
"""

import argparse
import json
import os
import time

import numpy as np


def _svm_pipeline(k: int):
    from sklearn.feature_selection import SelectKBest, f_classif
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    return Pipeline([
        ("scaler", StandardScaler()),
        ("select", SelectKBest(f_classif, k=k)),
        ("svc", SVC(kernel="linear", probability=True, random_state=42)),
    ])


def run_svm_battery(svm_sets) -> float:
    """18 experiments: per dataset one standard 5-fold pass at fixed k and
    one nested 5×3 grid-search pass (reference loop structure:
    src/cv_strategies.py:13-78 standard, :83-147 nested)."""
    from sklearn.metrics import f1_score, roc_auc_score
    from sklearn.model_selection import GridSearchCV, StratifiedKFold

    t0 = time.perf_counter()
    for name, (X, y) in svm_sets.items():
        X = np.asarray(X, np.float64)
        d = X.shape[1]
        outer = StratifiedKFold(n_splits=5, shuffle=True, random_state=42)
        # standard: fixed k=25 (nb02 N_FEATURES_TO_SELECT_STANDARD)
        for tr, te in outer.split(X, y):
            pipe = _svm_pipeline(min(25, d))
            pipe.fit(X[tr], y[tr])
            proba = pipe.predict_proba(X[te])[:, 1]
            f1_score(y[te], pipe.predict(X[te]), average="macro")
            roc_auc_score(y[te], proba)
        # nested: inner 3-fold grid over k (src/cv_strategies.py:122-126)
        grid = [10, 20, 30, 40, 50] if d >= 50 else [5, 10, 15, 20, min(25, d)]
        grid = sorted({min(k, d) for k in grid})
        for tr, te in outer.split(X, y):
            gs = GridSearchCV(
                _svm_pipeline(grid[0]), {"select__k": grid},
                cv=StratifiedKFold(n_splits=3, shuffle=True, random_state=42),
                scoring="f1_macro", n_jobs=1,
            )
            gs.fit(X[tr], y[tr])
            proba = gs.best_estimator_.predict_proba(X[te])[:, 1]
            f1_score(y[te], gs.best_estimator_.predict(X[te]), average="macro")
            roc_auc_score(y[te], proba)
    return time.perf_counter() - t0


def _pad_batch(seqs):
    import torch

    t_max = max(s.shape[0] for s in seqs)
    out = torch.zeros(len(seqs), t_max, seqs[0].shape[1])
    for i, s in enumerate(seqs):
        out[i, : s.shape[0]] = torch.from_numpy(np.ascontiguousarray(s))
    return out


def _torch_train_eval(seqs, labels, tr, va, params, epochs, batch_size):
    """One fold: sequential mini-batch epochs, then eval — the reference's
    training shape (src/dl_cv_strategies.py:87-165 without the plateau/
    early-stop bookkeeping, which costs nothing)."""
    import torch
    import torch.nn as nn

    from .torch_baseline import build_torch_model

    model = build_torch_model(
        cnn_channels=params.get("cnn_out_channels", 64),
        lstm_hidden=params.get("lstm_hidden_dim", 64),
        activation=params.get("activation_fn", "silu"),
    )
    opt = torch.optim.Adam(model.parameters(),
                           lr=params.get("learning_rate", 1e-3))
    loss_fn = nn.CrossEntropyLoss()
    y = torch.from_numpy(np.asarray(labels, np.int64))
    model.train()
    for _ in range(epochs):
        order = np.random.default_rng(0).permutation(len(tr))
        for s in range(0, len(order), batch_size):
            idx = tr[order[s : s + batch_size]]
            xb = _pad_batch([seqs[i] for i in idx])
            opt.zero_grad()
            loss = loss_fn(model(xb), y[idx])
            loss.backward()
            opt.step()
    model.eval()
    preds = []
    with torch.no_grad():
        for s in range(0, len(va), batch_size):
            idx = va[s : s + batch_size]
            preds.append(model(_pad_batch([seqs[i] for i in idx])))
    logits = torch.cat(preds)
    from sklearn.metrics import f1_score

    return f1_score(y[va].numpy(), logits.argmax(1).numpy(), average="macro")


def run_dl_battery(seq_sets, meta, n_trials, epochs, inner_epochs,
                   batch_size=4) -> float:
    """6 experiments: per sequence set one tuned nested pass (2 outer folds
    × n_trials TPE trials × 3 inner folds, then a final fit) and one
    standard 3-fold pass — the workload shape bench_battery runs on device
    (reference structure: src/dl_cv_strategies.py:257-354, 357-441)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from robust_speech_analysis_framework_tpu.tune import Study, TPESampler
    from sklearn.model_selection import StratifiedKFold

    t0 = time.perf_counter()
    for kind, seqs_dict in seq_sets.items():
        ids = list(meta["unique_participant_id"])
        seqs = [seqs_dict[i] for i in ids]
        y = np.array([1 if l == "Patient" else 0 for l in meta["label"]])
        outer = StratifiedKFold(n_splits=2, shuffle=True, random_state=42)
        best_params = None
        for tr, te in outer.split(np.zeros(len(y)), y):
            study = Study(direction="maximize", sampler=TPESampler(seed=7))

            def objective(trial):
                params = {
                    "learning_rate": trial.suggest_float(
                        "learning_rate", 1e-5, 1e-3, log=True),
                    "dropout_rate": trial.suggest_float(
                        "dropout_rate", 0.2, 0.5),
                    "cnn_out_channels": trial.suggest_categorical(
                        "cnn_out_channels", [32, 64, 128]),
                    "lstm_hidden_dim": trial.suggest_categorical(
                        "lstm_hidden_dim", [64, 128]),
                    "activation_fn": trial.suggest_categorical(
                        "activation_fn", ["silu", "gelu"]),
                }
                inner = StratifiedKFold(n_splits=3, shuffle=True,
                                        random_state=42)
                scores = [
                    _torch_train_eval(seqs, y, tr[itr], tr[iva], params,
                                      inner_epochs, batch_size)
                    for itr, iva in inner.split(np.zeros(len(tr)), y[tr])
                ]
                return float(np.mean(scores))

            study.optimize(objective, n_trials=n_trials)
            best_params = study.best_params
            _torch_train_eval(seqs, y, tr, te, best_params, epochs,
                              batch_size)
        # standard 3-fold with the tuned params
        for tr, te in StratifiedKFold(
            n_splits=3, shuffle=True, random_state=42
        ).split(np.zeros(len(y)), y):
            _torch_train_eval(seqs, y, tr, te, best_params, epochs,
                              batch_size)
    return time.perf_counter() - t0


def measure(quick: bool) -> dict:
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    from .suite import _battery_sequence_sets, _battery_svm_datasets

    rng = np.random.default_rng(0)
    svm_sets = _battery_svm_datasets(rng)
    n_parts = 20 if quick else 24
    # identical data to bench_battery, including the reference-scale
    # sequence lengths in full mode
    seq_sets, meta = _battery_sequence_sets(
        rng, n_parts, t_range=(64, 192) if quick else (512, 2048)
    )
    n_trials = 2 if quick else 4

    svm_dt = run_svm_battery(svm_sets)
    dl_dt = run_dl_battery(seq_sets, meta, n_trials, epochs=2,
                           inner_epochs=2)
    return {
        "svm18_seconds": svm_dt,
        "dl6_seconds": dl_dt,
        "battery_seconds": svm_dt + dl_dt,
        "impl": "sklearn+torch-cpu",
        "nproc": os.cpu_count(),
        "quick": quick,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    result = measure(args.quick)
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(__file__), "baselines.json")
    try:
        with open(path) as fh:
            baselines = json.load(fh)
    except Exception:
        baselines = {}
    prior = baselines.get("battery")
    if prior and prior.get("impl") == "jax-cpu":
        baselines["battery_jaxcpu"] = prior
    baselines["battery"] = result
    with open(path, "w") as fh:
        json.dump(baselines, fh, indent=2)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
