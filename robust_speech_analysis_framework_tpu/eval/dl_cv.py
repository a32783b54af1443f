"""Cross-validation engines for the CNN-LSTM (standard + nested with TPE).

Capability parity with reference src/dl_cv_strategies.py:

* :func:`run_dl_standard_kfold_cv` — fixed hyperparameters, stratified
  5-fold, inner 80/20 early-stop split (reference :357-441).
* :func:`run_dl_nested_cv` — per-outer-fold TPE search (25-trial default)
  over {lr, dropout, cnn_out_channels, lstm_hidden_dim, activation}, inner
  3-fold scoring at 15 fixed epochs/batch-size 4, then a final 80/20-split
  training with plateau LR decay and early stopping (reference :197-354).

Both return (results_df, fold_predictions, ...) with the reference's result
schema — per-fold accuracy/f1/precision/recall/auc rows plus raw predictions
for ROC analysis, first-conv stability vectors, and loss histories.

TPU notes: ``Trainer`` objects are cached per model architecture, so XLA
compiles each (arch × bucket shape) once and reuses it across folds and
trials — the dominant cost in nested CV (25 trials × 3 inner folds × 5 outer
folds) amortizes to a handful of compilations.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..models import CNNLSTM
from ..ops.framing import Deferred, collect
from ..train import TrainConfig, Trainer, train_model, evaluate_model
from ..train.loops import evaluate_model_deferred
from ..tune import Study, TPESampler
from .metrics import classification_metrics
from .splits import StratifiedKFold, train_test_indices

# Default search space — mirrors reference src/dl_cv_strategies.py:216-222.
DEFAULT_SEARCH_SPACE = {
    "learning_rate": ("float_log", 1e-5, 1e-3),
    "dropout_rate": ("float", 0.2, 0.5),
    "cnn_out_channels": ("categorical", [32, 64, 128]),
    "lstm_hidden_dim": ("categorical", [64, 128]),
    "activation_fn": ("categorical", ["silu", "gelu"]),
}


def align_sequences_and_labels(
    sequences_dict: Mapping[str, np.ndarray], metadata_df: pd.DataFrame
) -> Tuple[List[np.ndarray], np.ndarray, List[str]]:
    """Join sequences to binary labels on unique_participant_id.

    Label 1 = 'Patient' else 0; participants are the sorted intersection of
    sequence keys and metadata ids (reference src/dl_cv_strategies.py:298-301).
    """
    label_map = (
        metadata_df.drop_duplicates("unique_participant_id")
        .set_index("unique_participant_id")["label"]
        .apply(lambda v: 1 if v == "Patient" else 0)
    )
    common = sorted(set(sequences_dict.keys()) & set(label_map.index))
    if not common:
        raise ValueError(
            "no overlap between sequence keys and metadata "
            "unique_participant_id values — sequences must be keyed by "
            "participant id (e.g. '01_CF30_1'), not by clip filename; see "
            "aggregate_interview_sequences / build_sequence_sets"
        )
    y = label_map.loc[common].to_numpy()
    if getattr(sequences_dict, "is_resident_sequences", False):
        # fused extract→train handoff: the sequences already live in device
        # HBM (features.wav2vec2.ResidentSequences) — adopt the buffer as a
        # resident corpus view instead of downloading + re-uploading it
        from ..train.loops import DeviceCorpus

        corpus = DeviceCorpus.from_resident(sequences_dict)
        rows = np.asarray([sequences_dict.row(pid) for pid in common])
        return corpus.view(rows), y, common
    X = [np.asarray(sequences_dict[pid], dtype=np.float32) for pid in common]
    return X, y, common


# Process-global: Trainers hold only compiled programs (no data), so CV
# runs sharing an architecture reuse each other's traces and executables —
# a fresh cache per run would re-trace every fold program and reload its
# executable from the persistent XLA cache (~seconds per program).
_GLOBAL_TRAINERS: Dict[tuple, Trainer] = {}


class _TrainerCache:
    """One Trainer per distinct architecture → compiled steps are shared."""

    def __init__(self, input_dim: int, num_classes: int = 2):
        self.input_dim = input_dim
        self.num_classes = num_classes
        self._cache = _GLOBAL_TRAINERS

    def get(self, hp: Mapping[str, Any]) -> Trainer:
        # dropout_rate is NOT part of the key: it reaches the model as a
        # runtime traced scalar (TrainConfig.dropout_rate), so one compiled
        # step serves every sampled rate — a continuous TPE search would
        # otherwise recompile every bucket shape per trial
        key = (
            self.input_dim,
            self.num_classes,
            int(hp.get("cnn_out_channels", 128)),
            int(hp.get("lstm_hidden_dim", 128)),
            str(hp.get("activation_fn", "silu")),
        )
        if key not in self._cache:
            model = CNNLSTM(
                input_dim=self.input_dim,
                num_classes=self.num_classes,
                cnn_out_channels=key[2],
                lstm_hidden_dim=key[3],
                activation_fn=key[4],
            )
            self._cache[key] = Trainer(model)
        return self._cache[key]


def _subset(seq: Sequence, idx: np.ndarray):
    if hasattr(seq, "subset"):  # SeqView: keep the device-resident corpus
        return seq.subset(idx)
    return [seq[i] for i in idx]


def _input_dim(X) -> int:
    """Feature dim without touching data: a resident-corpus view reads the
    device buffer's metadata (downloading a row would defeat the fused
    zero-transfer handoff)."""
    if hasattr(X, "corpus"):
        return int(X.corpus.x.shape[2])
    return int(np.asarray(X[0]).shape[1])


# fallback device-resident corpus budget when the backend reports no memory
# stats: one padded (N, T, D) f32 buffer per CV run
_CORPUS_BUDGET_FALLBACK_BYTES = 4 << 30


def _corpus_budget_bytes() -> int:
    """Resident-corpus budget derived from the device's actual memory.

    Uses ``memory_stats()['bytes_limit']`` where the backend reports it
    (TPU does), keeping the corpus to ≤ 1/4 of HBM so fold activations,
    lane-batched trial states and XLA scratch still fit; falls back to a
    4 GiB literal on backends without stats (CPU). ``RSAF_CORPUS_BUDGET_BYTES``
    overrides both — workloads that KNOW their activation envelope (the
    reference-scale battery: big corpus, small fold working set) can give
    the corpus more of HBM than the conservative 1/4 default."""
    import os

    env = os.environ.get("RSAF_CORPUS_BUDGET_BYTES")
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit // 4
    except Exception:
        pass
    return _CORPUS_BUDGET_FALLBACK_BYTES


def _as_device_corpus(X: list, mesh=None):
    """Wrap a sequence list as a resident-corpus view when it fits HBM;
    folds and trials then gather rows on device instead of re-uploading
    their subsets (the dominant per-fold cost on a tunneled chip). With
    ``mesh`` the buffer is replicated over the mesh so lane-sharded trial
    programs can read it."""
    from ..train.loops import DeviceCorpus, SeqView

    if isinstance(X, SeqView):  # already resident (fused handoff)
        return X
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
    if DeviceCorpus.nbytes_estimate(X) > _corpus_budget_bytes():
        return X
    try:
        corpus = DeviceCorpus(X, sharding=sharding)
    except (RuntimeError, MemoryError) as e:
        # allocation/transfer failure only (XlaRuntimeError subclasses
        # RuntimeError) — programming errors propagate
        import logging

        logging.getLogger(__name__).warning(
            "resident-corpus upload failed (%s); streaming folds from host", e
        )
        return X
    return corpus.view(np.arange(len(X)))


def _stability_vector(state) -> np.ndarray:
    from ..models.cnn_lstm import stability_probe

    return np.asarray(stability_probe({"params": state.params}))


def _stability_deferred(state) -> Deferred:
    """Dispatch the conv1 stability probe; the (input_dim,) vector is
    fetched with the fold's other results in one collect."""
    from ..models.cnn_lstm import stability_probe

    return Deferred(stability_probe({"params": state.params}), np.asarray)


def run_dl_standard_kfold_cv(
    sequences_dict: Mapping[str, np.ndarray],
    metadata_df: pd.DataFrame,
    hyperparams: Mapping[str, Any],
    n_splits: int = 5,
    epochs: int = 100,
    patience: int = 25,
    batch_size: int = 8,
    seed: int = 42,
    verbose: bool = False,
    use_length_masking: bool = True,
    remat: bool = False,
) -> Tuple[pd.DataFrame, List[dict], List[dict], np.ndarray]:
    """Standard stratified K-fold with fixed hyperparameters.

    Returns (results_df, fold_predictions, histories, stability_weights) —
    the contract of reference run_pytorch_standard_kfold_cv (:357-441).
    """
    X, y, _ = align_sequences_and_labels(sequences_dict, metadata_df)
    X = _as_device_corpus(X)
    cache = _TrainerCache(input_dim=_input_dim(X))
    cv = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)

    trainer = cache.get(hyperparams)
    # Dispatch every fold's programs (train fold + stability probe + eval
    # pass) back-to-back, deferring all device→host fetches to ONE collect:
    # on a tunneled chip each blocking fetch costs a ~100 ms round trip, so
    # a 5-fold run pays 1 instead of ~15.
    deferreds: List[Deferred] = []
    for fold, (train_idx, test_idx) in enumerate(cv.split(X, y)):
        X_train, y_train = _subset(X, train_idx), y[train_idx]
        X_test, y_test = _subset(X, test_idx), y[test_idx]
        # Inner 80/20 split for early stopping (reference :404-407).
        tr_idx, val_idx = train_test_indices(y_train, n_splits=5, seed=seed)
        cfg = TrainConfig(
            learning_rate=float(hyperparams["learning_rate"]),
            epochs=epochs,
            patience=patience,
            batch_size=batch_size,
            seed=seed + fold,
            dropout_rate=float(hyperparams.get("dropout_rate", 0.5)),
            use_length_masking=use_length_masking,
            remat=remat,
        )
        state, hist = train_model(
            trainer,
            _subset(X_train, tr_idx),
            y_train[tr_idx],
            _subset(X_train, val_idx),
            y_train[val_idx],
            cfg,
            verbose=verbose,
            defer_histories=True,
        )
        deferreds += [hist, _stability_deferred(state),
                      evaluate_model_deferred(trainer, state, X_test, y_test, cfg)]

    results, fold_predictions, histories, weights = [], [], [], []
    flat = collect(deferreds)
    for fold in range(0, len(flat) // 3):
        (th, vh), w, (y_true, y_pred, y_prob) = flat[3 * fold : 3 * fold + 3]
        histories.append({"train": th, "val": vh})
        weights.append(w)
        fold_predictions.append({"y_true": y_true, "y_prob": y_prob})
        results.append({"fold": fold + 1, **classification_metrics(y_true, y_pred, y_prob)})
        if verbose:
            print(f"[standard] fold {fold + 1}: {results[-1]}")
    return pd.DataFrame(results), fold_predictions, histories, np.asarray(weights)


def _inner_cv_score(
    cache: _TrainerCache,
    params: Mapping[str, Any],
    X_tv: Sequence[np.ndarray],
    y_tv: np.ndarray,
    n_splits_inner: int,
    inner_epochs: int,
    inner_batch_size: int,
    seed: int,
    use_length_masking: bool = True,
    remat: bool = False,
) -> float:
    """Mean inner-fold macro-F1 at fixed short training (reference
    _objective: 3 folds × 15 epochs × batch 4, :224-254).

    All three folds' training programs and eval passes dispatch
    back-to-back with one fetch at the end: the trial — the reference's
    dominant workload (25 per outer fold) — pays one tunnel round trip
    instead of several per fold."""
    from .metrics import f1_macro

    inner = StratifiedKFold(n_splits=n_splits_inner, shuffle=True, random_state=seed)
    trainer = cache.get(params)
    deferreds = []
    for tr_idx, val_idx in inner.split(X_tv, y_tv):
        cfg = TrainConfig(
            learning_rate=float(params["learning_rate"]),
            epochs=inner_epochs,
            patience=inner_epochs + 1,  # no early stop in the tuning loop
            batch_size=inner_batch_size,
            seed=seed,
            dropout_rate=float(params.get("dropout_rate", 0.5)),
            use_length_masking=use_length_masking,
            remat=remat,
            # the reference _objective trains plain Adam for a FIXED 15
            # epochs and scores the final-epoch weights — no plateau decay,
            # no best-val restore (src/dl_cv_strategies.py:234-248); both
            # would otherwise bias trial scores optimistically
            use_plateau=False,
            restore_best=False,
        )
        X_val = _subset(X_tv, val_idx)
        state, _ = train_model(
            trainer,
            _subset(X_tv, tr_idx),
            y_tv[tr_idx],
            X_val,
            y_tv[val_idx],
            cfg,
            defer_histories=True,
        )
        deferreds.append(
            evaluate_model_deferred(trainer, state, X_val, y_tv[val_idx], cfg)
        )
    scores = [
        f1_macro(y_true, y_pred)
        for y_true, y_pred, _ in collect(deferreds)
    ]
    return float(np.mean(scores))


def _suggest_params(trial, space: Mapping[str, tuple]) -> Dict[str, Any]:
    """Sample one parameter set from a search-space spec via a TPE trial."""
    params: Dict[str, Any] = {}
    for name, spec in space.items():
        kind = spec[0]
        if kind == "float_log":
            params[name] = trial.suggest_float(name, spec[1], spec[2], log=True)
        elif kind == "float":
            params[name] = trial.suggest_float(name, spec[1], spec[2])
        else:
            params[name] = trial.suggest_categorical(name, spec[1])
    return params


def _suggest_round(
    asked, space: Mapping[str, tuple]
) -> List[Dict[str, Any]]:
    """Sample one ask-K round with per-round architecture commitment.

    Categorical parameters (the architecture axes — cnn channels, lstm
    width, activation; anything that changes the compiled program) are
    sampled ONCE per round from the current TPE posterior and pinned for
    every trial in the round; continuous parameters (lr, dropout — runtime
    scalars of one compiled program) vary per trial. This keeps a round's
    trials in ONE lane-vmapped program: independent per-trial sampling over
    the full 12-architecture space would scatter an ask-8 round into up to
    8 singleton arch groups and degenerate to sequential dispatches
    (round-3 verdict item 5). The pinned values are recorded on every
    trial, so the categorical posterior still learns from all K scores;
    architecture exploration happens round-to-round against the updated
    posterior."""
    plist: List[Dict[str, Any]] = []
    pinned: Dict[str, Any] = {}
    for t in asked:
        params: Dict[str, Any] = {}
        for name, spec in space.items():
            kind = spec[0]
            if kind == "float_log":
                params[name] = t.suggest_float(name, spec[1], spec[2], log=True)
            elif kind == "float":
                params[name] = t.suggest_float(name, spec[1], spec[2])
            elif name in pinned:
                t.params[name] = params[name] = pinned[name]
            else:
                pinned[name] = params[name] = t.suggest_categorical(
                    name, spec[1]
                )
        plist.append(params)
    return plist


def _arch_key(p: Mapping[str, Any]) -> tuple:
    return (
        int(p.get("cnn_out_channels", 128)),
        int(p.get("lstm_hidden_dim", 128)),
        str(p.get("activation_fn", "silu")),
    )


def _inner_cv_scores_batch(
    cache: _TrainerCache,
    params_list: Sequence[Mapping[str, Any]],
    X_tv: Sequence[np.ndarray],
    y_tv: np.ndarray,
    n_splits_inner: int,
    inner_epochs: int,
    inner_batch_size: int,
    seed: int,
    use_length_masking: bool = True,
    mesh=None,
    remat: bool = False,
) -> List[float]:
    """Mean inner-fold macro-F1 for a BATCH of trials, order-preserving.

    The TPU answer to the reference's sequential 25-trials-per-outer-fold
    Optuna loop (src/dl_cv_strategies.py:308-310): trials are grouped by
    architecture, each group trains as ONE lane-vmapped fold program per
    inner fold (train_trials_device) with its eval pass lane-batched too,
    and every program's outputs are fetched in a single collect — a round
    of K trials costs (#archs × n_inner) dispatches and one device→host
    round trip instead of K × n_inner × (folds + fetches). With ``mesh``
    the trial lanes shard across chips.
    """
    from .metrics import f1_macro
    from ..train.loops import train_trials_device

    inner = StratifiedKFold(n_splits=n_splits_inner, shuffle=True, random_state=seed)
    folds = list(inner.split(X_tv, y_tv))
    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(params_list):
        groups.setdefault(_arch_key(p), []).append(i)

    deferreds, slots = [], []
    for idxs in groups.values():
        trainer = cache.get(params_list[idxs[0]])
        lrs = [float(params_list[i]["learning_rate"]) for i in idxs]
        rates = [float(params_list[i].get("dropout_rate", 0.5)) for i in idxs]
        for tr_idx, val_idx in folds:
            cfg = TrainConfig(
                learning_rate=lrs[0],
                epochs=inner_epochs,
                patience=inner_epochs + 1,  # no early stop in the tuning loop
                batch_size=inner_batch_size,
                seed=seed,
                dropout_rate=rates[0],
                use_length_masking=use_length_masking,
                remat=remat,
                # reference _objective semantics: fixed epochs, final
                # weights, no plateau decay (src/dl_cv_strategies.py:234-248)
                use_plateau=False,
                restore_best=False,
            )
            X_val = _subset(X_tv, val_idx)
            states, _ = train_trials_device(
                trainer, _subset(X_tv, tr_idx), y_tv[tr_idx],
                X_val, y_tv[val_idx], cfg, lrs, rates, mesh=mesh,
            )
            deferreds.append(
                trainer.eval_logits_trials_deferred(states, X_val, cfg)
            )
            slots.append((idxs, y_tv[val_idx]))

    per_trial: List[List[float]] = [[] for _ in params_list]
    for logits, (idxs, y_val) in zip(collect(deferreds), slots):
        preds = np.argmax(logits, axis=-1)  # (K_group, n_val)
        for lane, ti in enumerate(idxs):
            per_trial[ti].append(f1_macro(y_val, preds[lane]))
    return [float(np.mean(s)) for s in per_trial]


def run_dl_nested_cv(
    sequences_dict: Mapping[str, np.ndarray],
    metadata_df: pd.DataFrame,
    n_splits_outer: int = 5,
    n_splits_inner: int = 3,
    n_trials: int = 25,
    epochs: int = 50,
    patience: int = 10,
    batch_size: int = 8,
    inner_epochs: int = 15,
    inner_batch_size: int = 4,
    seed: int = 42,
    search_space: Optional[Mapping[str, tuple]] = None,
    verbose: bool = False,
    use_length_masking: bool = True,
    trial_batch: int = 1,
    mesh=None,
    remat: bool = False,
) -> Tuple[pd.DataFrame, List[dict], np.ndarray]:
    """Nested CV: per-outer-fold TPE hyperparameter search + final training.

    Contract of reference run_pytorch_nested_cv_with_optuna (:257-354):
    returns (results_df incl. best_params per fold, fold_predictions,
    stability_weights).

    ``trial_batch`` > 1 runs the TPE search in ask-K rounds: K candidates
    are drawn from the current posterior, scored concurrently via
    lane-vmapped fold programs (see _inner_cv_scores_batch), and told back
    to the sampler as a batch. The schedule is deterministic given the seed
    but differs from the sequential (``trial_batch=1``) schedule, which
    updates the posterior after every single trial — exactly the classic
    sequential-vs-batched Bayesian-optimization trade. The default is
    sequential (reference-schedule semantics: same seed → same trials);
    the orchestration layer (experiments.run_cnn_lstm_experiments) opts
    into ask-8 rounds for TPU throughput. With ``mesh`` the trial lanes
    shard across its ``dp`` axis.
    """
    space = dict(search_space or DEFAULT_SEARCH_SPACE)
    X, y, _ = align_sequences_and_labels(sequences_dict, metadata_df)
    X = _as_device_corpus(X, mesh=mesh)
    cache = _TrainerCache(input_dim=_input_dim(X))
    outer = StratifiedKFold(n_splits=n_splits_outer, shuffle=True, random_state=seed)

    from ..train.loops import SeqView, _device_fold_fits

    results, fold_predictions, weights = [], [], []
    deferreds: List[Deferred] = []
    fold_best: List[dict] = []
    for fold, (tv_idx, test_idx) in enumerate(outer.split(X, y)):
        X_tv, y_tv = _subset(X, tv_idx), y[tv_idx]
        X_test, y_test = _subset(X, test_idx), y[test_idx]

        def objective(trial):
            return _inner_cv_score(
                cache, _suggest_params(trial, space), X_tv, y_tv,
                n_splits_inner, inner_epochs, inner_batch_size, seed,
                use_length_masking=use_length_masking, remat=remat,
            )

        study = Study(direction="maximize", sampler=TPESampler(seed=seed + fold))
        _probe_cfg = TrainConfig(
            epochs=inner_epochs, batch_size=inner_batch_size,
        )
        use_batched = trial_batch > 1 and (
            isinstance(X_tv, SeqView)
            or _device_fold_fits(X_tv, X_tv, _probe_cfg)
        )
        if use_batched:
            done = 0
            while done < n_trials:
                k = min(trial_batch, n_trials - done)
                asked = [study.ask() for _ in range(k)]
                # per-round architecture commitment keeps all K trials in
                # one lane-vmapped program (see _suggest_round)
                plist = _suggest_round(asked, space)
                scores = _inner_cv_scores_batch(
                    cache, plist, X_tv, y_tv,
                    n_splits_inner, inner_epochs, inner_batch_size, seed,
                    use_length_masking=use_length_masking, mesh=mesh,
                    remat=remat,
                )
                for t, s in zip(asked, scores):
                    study.tell(t, s)
                done += k
        else:
            study.optimize(objective, n_trials=n_trials)
        best_params = study.best_params
        fold_best.append(dict(best_params))
        if verbose:
            print(f"[nested] fold {fold + 1} best: {best_params} "
                  f"(inner F1 {study.best_value:.3f})")

        # Final training on an 80/20 split of the outer train set
        # (reference :316-333). Dispatched deferred: its device programs
        # execute while the NEXT fold's TPE study runs; everything is
        # fetched in one collect at the end.
        tr_idx, val_idx = train_test_indices(y_tv, n_splits=5, seed=seed)
        trainer = cache.get(best_params)
        cfg = TrainConfig(
            learning_rate=float(best_params["learning_rate"]),
            epochs=epochs,
            patience=patience,
            batch_size=batch_size,
            seed=seed + fold,
            dropout_rate=float(best_params.get("dropout_rate", 0.5)),
            use_length_masking=use_length_masking,
            remat=remat,
        )
        state, _hist = train_model(
            trainer,
            _subset(X_tv, tr_idx),
            y_tv[tr_idx],
            _subset(X_tv, val_idx),
            y_tv[val_idx],
            cfg,
            defer_histories=True,
        )
        deferreds += [_stability_deferred(state),
                      evaluate_model_deferred(trainer, state, X_test, y_test, cfg)]

    flat = collect(deferreds)
    for fold in range(len(flat) // 2):
        w, (y_true, y_pred, y_prob) = flat[2 * fold : 2 * fold + 2]
        weights.append(w)
        fold_predictions.append({"y_true": y_true, "y_prob": y_prob})
        results.append(
            {
                "fold": fold + 1,
                "best_params": fold_best[fold],
                **classification_metrics(y_true, y_pred, y_prob),
            }
        )
        if verbose:
            print(f"[nested] fold {fold + 1}: {results[-1]}")
    return pd.DataFrame(results), fold_predictions, np.asarray(weights)
