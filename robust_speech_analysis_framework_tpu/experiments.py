"""End-to-end experiment pipelines (the reference's notebook layer as code).

Replaces the three orchestration notebooks (reference L5, SURVEY.md §2
C14-C16) with importable, cache-aware pipeline functions:

* :func:`extract_all_features` — notebook 01: corpus → MSHDS / openSMILE /
  Wav2Vec2 features for the reading task and aggregated interview clips,
  written as CSVs/pickles with skip-if-exists caching (nb01 cells 8-16).
* :func:`build_svm_datasets` / :func:`run_all_svm_experiments` — notebook
  02: the 9 dataset configurations (3 feature sets × reading / interview /
  combined) and the 18 standard+nested SVM experiments, saved as
  ``all_svm_results.pkl`` (nb02 cells 2-3).
* :func:`build_sequence_sets` / :func:`run_cnn_lstm_experiments` — notebook
  03: participant-level sequence sets and the 6 tuned/standard CNN-LSTM
  experiments with result pickles and final model checkpoints
  (nb03 cells 1-7).

Artifact names and schemas match the reference so downstream analyses can
read either framework's outputs.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, List, Mapping, Optional, Tuple

import numpy as np
import pandas as pd

from .data import (
    aggregate_clip_features,
    aggregate_interview_sequences,
    load_androids_corpus,
)

METADATA_COLUMNS = [
    "unique_participant_id", "original_id_nn", "label", "gender", "age",
    "education", "filepath", "filename", "task_type", "fold",
    "original_session_filename",
]


# ---------------------------------------------------------------------------
# Notebook 01: feature extraction
# ---------------------------------------------------------------------------

def _merge_with_metadata(features_df: pd.DataFrame, meta_df: pd.DataFrame):
    return meta_df.merge(features_df, on="filename")


def _resolve_mesh(mesh):
    """``mesh="auto"`` → a (dp, mp) mesh over all visible devices when there
    is more than one, else None (single-device paths run unchanged). A Mesh
    or None passes through."""
    if isinstance(mesh, str):
        if mesh != "auto":
            raise ValueError(f"mesh must be 'auto', a Mesh, or None; got {mesh!r}")
        from .parallel import auto_mesh

        return auto_mesh()
    return mesh


def extract_all_features(
    corpus_dir: str,
    out_dir: str,
    features: Iterable[str] = ("mshds", "opensmile", "wav2vec2"),
    skip_existing: bool = True,
    wav2vec2_extractor=None,
    opensmile_config=None,
    verbose: bool = True,
    mesh="auto",
) -> Dict[str, str]:
    """Extract every feature set for reading + interview tasks.

    Returns {artifact key: path}. Cached artifacts are skipped when
    ``skip_existing`` (the reference's idempotency contract, nb01 cell 8).

    ``mesh="auto"`` (default) shards every extractor's file batches over all
    visible devices when more than one is present — MSHDS partitions the
    corpus per device, openSMILE/Wav2Vec2 shard their bucket/chunk batches
    over the mesh's dp axis. Pass an explicit ``jax.sharding.Mesh`` to
    control the layout, or ``mesh=None`` to force single-device extraction.
    A caller-supplied ``wav2vec2_extractor`` keeps its own mesh setting.
    """
    from .utils.profiling import ThroughputMeter, stage_timer

    mesh = _resolve_mesh(mesh)
    features = list(features)
    if "wav2vec2" in features and wav2vec2_extractor is None:
        # fail fast (VERDICT r1 item 2): the fallback construction below
        # would otherwise raise the random-weights guard only after the
        # mshds/opensmile stages spent minutes extracting
        from .features.wav2vec2 import Wav2Vec2Extractor as _W

        wav2vec2_extractor = _W(mesh=mesh)  # raises with the full guidance

    os.makedirs(out_dir, exist_ok=True)
    reading_df, interview_df = load_androids_corpus(corpus_dir, verbose=verbose)
    paths: Dict[str, str] = {}
    meter = ThroughputMeter()

    def artifact(name):
        p = os.path.join(out_dir, name)
        paths[name] = p
        return p, (skip_existing and os.path.exists(p))

    def _decoded(df):
        """Native batch decode; files that fail stay absent (extractors apply
        their reference failure semantics for missing waveforms)."""
        from .audio.native_io import load_corpus_mono_16k

        if df.empty:
            return {}
        return load_corpus_mono_16k(list(df["filepath"]))

    if "mshds" in features:
        from .features.mshds import FEATURE_NAMES, extract_mshds_batch

        mesh_devices = list(mesh.devices.flat) if mesh is not None else None

        def _mshds(df):
            waves = _decoded(df)
            out = extract_mshds_batch(waves, verbose=verbose,
                                      devices=mesh_devices)
            # NaN rows for undecodable files (reference contract,
            # src/mshds_extractor.py:450-457)
            missing = [] if df.empty else [
                os.path.basename(f) for f in df["filepath"]
                if os.path.basename(f) not in waves
            ]
            if missing:
                nan_rows = pd.DataFrame(
                    [{"filename": m, **dict.fromkeys(FEATURE_NAMES, float("nan"))}
                     for m in missing]
                )
                out = pd.concat([out, nan_rows], ignore_index=True)
            return out

        p, cached = artifact("features_mshds_reading_task.csv")
        if not cached:
            with stage_timer(meter, "mshds/reading", items=len(reading_df)):
                feats = _mshds(reading_df)
            _merge_with_metadata(feats, reading_df).to_csv(p, index=False)
        p, cached = artifact("features_mshds_interview_task_aggregated.csv")
        if not cached:
            with stage_timer(meter, "mshds/interview", items=len(interview_df)):
                clip_feats = _mshds(interview_df)
            aggregate_clip_features(clip_feats, interview_df).to_csv(p, index=False)

    if "opensmile" in features:
        from .features.opensmile import OpenSmileConfig, extract_opensmile_features

        cfg = opensmile_config or OpenSmileConfig()
        p, cached = artifact("features_opensmile_reading_task.csv")
        if not cached:
            with stage_timer(meter, "opensmile/reading", items=len(reading_df)):
                feats = extract_opensmile_features(
                    reading_df, cfg, verbose=verbose,
                    waveforms=_decoded(reading_df), mesh=mesh,
                )
            _merge_with_metadata(feats, reading_df).to_csv(p, index=False)
        p, cached = artifact("features_opensmile_interview_task_aggregated.csv")
        if not cached:
            with stage_timer(meter, "opensmile/interview", items=len(interview_df)):
                clip_feats = extract_opensmile_features(
                    interview_df, cfg, verbose=verbose,
                    waveforms=_decoded(interview_df), mesh=mesh,
                )
            aggregate_clip_features(clip_feats, interview_df).to_csv(p, index=False)

    if "wav2vec2" in features:
        from .features.wav2vec2 import Wav2Vec2Extractor, extract_wav2vec2_sequences

        ex = wav2vec2_extractor or Wav2Vec2Extractor()
        # sequence pickles feed the CNN-LSTM experiments
        p, cached = artifact("sequences_wav2vec2_reading.pkl")
        if not cached:
            with stage_timer(meter, "wav2vec2/reading", items=len(reading_df)):
                seqs = extract_wav2vec2_sequences(
                    reading_df, extractor=ex, verbose=verbose,
                    waveforms=_decoded(reading_df),
                )
            with open(p, "wb") as fh:
                pickle.dump(seqs, fh)
        p, cached = artifact("sequences_wav2vec2_interview.pkl")
        if not cached:
            with stage_timer(meter, "wav2vec2/interview", items=len(interview_df)):
                seqs = extract_wav2vec2_sequences(
                    interview_df, extractor=ex, verbose=verbose,
                    waveforms=_decoded(interview_df),
                )
            with open(p, "wb") as fh:
                pickle.dump(seqs, fh)

        # mean-pooled summary features for the SVMs
        p, cached = artifact("features_wav2vec2_reading_task.csv")
        if not cached:
            with open(paths["sequences_wav2vec2_reading.pkl"], "rb") as fh:
                seqs = pickle.load(fh)
            emb = _mean_pool_frame(seqs)
            _merge_with_metadata(emb, reading_df).to_csv(p, index=False)
        p, cached = artifact("features_wav2vec2_interview_task_aggregated.csv")
        if not cached:
            with open(paths["sequences_wav2vec2_interview.pkl"], "rb") as fh:
                seqs = pickle.load(fh)
            emb = _mean_pool_frame(seqs)
            aggregate_clip_features(emb, interview_df).to_csv(p, index=False)

    if verbose and meter.stages:
        print("extraction throughput:\n" + meter.report())
    return paths


def _mean_pool_frame(seqs: Mapping[str, np.ndarray]) -> pd.DataFrame:
    rows = []
    for name, seq in seqs.items():
        row = {f"dim_{k}": v for k, v in enumerate(np.asarray(seq).mean(axis=0))}
        row["filename"] = name
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Notebook 02: SVM experiments
# ---------------------------------------------------------------------------

def _xy_from_frame(df: pd.DataFrame):
    label_col = "label_reading" if "label_reading" in df.columns else "label"
    y = df[label_col].apply(lambda v: 1 if v == "Patient" else 0)
    drop = set(METADATA_COLUMNS) | {
        c + s for c in METADATA_COLUMNS for s in ("_reading", "_interview")
    }
    X = df[[c for c in df.columns if c not in drop]]
    X = X.fillna(X.mean(numeric_only=True))
    return X, y


def build_svm_datasets(processed_dir: str) -> Dict[str, dict]:
    """The 9 (X, y, groups) dataset configurations of nb02 cell 2."""
    def load(name):
        return pd.read_csv(os.path.join(processed_dir, name))

    reading = {
        "mshds": load("features_mshds_reading_task.csv"),
        "opensmile": load("features_opensmile_reading_task.csv"),
        "wav2vec2": load("features_wav2vec2_reading_task.csv"),
    }
    interview = {
        "mshds": load("features_mshds_interview_task_aggregated.csv"),
        "opensmile": load("features_opensmile_interview_task_aggregated.csv"),
        "wav2vec2": load("features_wav2vec2_interview_task_aggregated.csv"),
    }
    # participant-level metadata from the reading task rows
    meta = reading["mshds"][
        [c for c in METADATA_COLUMNS if c in reading["mshds"].columns]
    ].drop_duplicates("unique_participant_id")

    out: Dict[str, dict] = {}
    for fs in ("mshds", "opensmile", "wav2vec2"):
        r = reading[fs]
        i = meta.merge(interview[fs], on="unique_participant_id")
        c = r.merge(
            interview[fs], on="unique_participant_id",
            suffixes=("_reading", "_interview"),
        )
        for kind, df in (("reading", r), ("interview", i), ("combined", c)):
            X, y = _xy_from_frame(df)
            out[f"{fs}_{kind}"] = {
                "X": X, "y": y, "groups": df["unique_participant_id"],
            }
    return out


def run_all_svm_experiments(
    processed_dir: str,
    out_path: Optional[str] = None,
    n_features_standard: int = 25,
    skip_existing: bool = True,
    verbose: bool = True,
) -> Dict[str, dict]:
    """All 18 SVM experiments (9 datasets × standard/nested), nb02 cell 3."""
    from .eval.svm_cv import run_svm_nested_kfold_cv, run_svm_standard_kfold_cv

    if out_path and skip_existing and os.path.exists(out_path):
        with open(out_path, "rb") as fh:
            return pickle.load(fh)

    datasets = build_svm_datasets(processed_dir)
    results: Dict[str, dict] = {}
    for name, d in datasets.items():
        X, y = d["X"], d["y"]
        k_std = min(n_features_standard, X.shape[1])
        if verbose:
            print(f"[svm] {name}: X {X.shape}")
        df_s, preds_s = run_svm_standard_kfold_cv(
            X, y, n_features_to_select=k_std
        )
        results[f"{name}_standard"] = {"results_df": df_s, "predictions": preds_s}
        df_n, preds_n = run_svm_nested_kfold_cv(X, y)
        results[f"{name}_nested"] = {"results_df": df_n, "predictions": preds_n}

    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "wb") as fh:
            pickle.dump(results, fh)
    return results


# ---------------------------------------------------------------------------
# Notebook 03: CNN-LSTM experiments
# ---------------------------------------------------------------------------

def build_sequence_sets(
    processed_dir: str, corpus_dir: str, verbose: bool = True
) -> Tuple[Dict[str, Dict[str, np.ndarray]], pd.DataFrame]:
    """Participant-keyed sequence sets {reading, interview, combined}
    (nb03 cell 1) plus participant metadata."""
    reading_df, interview_df = load_androids_corpus(corpus_dir, verbose=verbose)
    with open(os.path.join(processed_dir, "sequences_wav2vec2_reading.pkl"), "rb") as fh:
        reading_seqs = pickle.load(fh)
    with open(os.path.join(processed_dir, "sequences_wav2vec2_interview.pkl"), "rb") as fh:
        interview_clip_seqs = pickle.load(fh)

    name_to_pid = reading_df.set_index("filename")["unique_participant_id"]
    reading_by_pid = {
        name_to_pid[n]: s for n, s in reading_seqs.items() if n in name_to_pid
    }
    interview_by_pid = aggregate_interview_sequences(
        interview_clip_seqs, interview_df
    )
    combined = {
        pid: np.vstack([reading_by_pid[pid], interview_by_pid[pid]])
        for pid in set(reading_by_pid) & set(interview_by_pid)
    }
    meta = pd.concat([reading_df, interview_df]).drop_duplicates(
        "unique_participant_id"
    )[["unique_participant_id", "label"]]
    return (
        {"reading": reading_by_pid, "interview": interview_by_pid,
         "combined": combined},
        meta,
    )


def run_cnn_lstm_experiments(
    processed_dir: str,
    corpus_dir: str,
    out_dir: str,
    models_dir: Optional[str] = None,
    n_trials: int = 25,
    nested_epochs: int = 50,
    nested_patience: int = 10,
    standard_epochs: int = 100,
    standard_patience: int = 25,
    batch_size: int = 8,
    skip_existing: bool = True,
    verbose: bool = True,
    mesh="auto",
    trial_batch: int = 8,
) -> Dict[str, dict]:
    """The 6 CNN-LSTM experiments (3 data types × tuned/standard) with
    result pickles and final tuned checkpoints (nb03 cells 3-7).

    TPU-native defaults at this layer: the TPE searches run in ask-K
    batched rounds (``trial_batch=8`` — K candidates scored concurrently as
    lane-vmapped fold programs, sharded over the mesh's dp axis when
    ``mesh`` resolves to one). NOTE this intentionally diverges from the
    reference's sequential per-trial Optuna schedule (the classic
    sequential-vs-batched BO trade; selected hyperparameters can differ for
    the same seed): pass ``trial_batch=1`` for the reference schedule —
    the engine-level :func:`~..eval.dl_cv.run_dl_nested_cv` default."""
    from .eval.dl_cv import run_dl_nested_cv, run_dl_standard_kfold_cv
    from .train.checkpoints import save_results_pickle

    mesh = _resolve_mesh(mesh)
    os.makedirs(out_dir, exist_ok=True)
    sets, meta = build_sequence_sets(processed_dir, corpus_dir, verbose=verbose)
    results: Dict[str, dict] = {}

    for kind, seqs in sets.items():
        try:
            # one device upload per data type, shared by the nested search,
            # the standard K-fold AND the final-model training (three
            # engine passes re-uploaded the same corpus before)
            from .eval.dl_cv import _corpus_budget_bytes
            from .train.loops import DeviceCorpus, ResidentCorpus

            if DeviceCorpus.nbytes_estimate(
                list(seqs.values())
            ) <= _corpus_budget_bytes():
                sharding = None
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    sharding = NamedSharding(mesh, PartitionSpec())
                seqs = ResidentCorpus(seqs, sharding=sharding)
        except (RuntimeError, MemoryError):
            pass  # fall back to per-engine upload/streaming
        tuned_path = os.path.join(
            out_dir, f"results_wav2vec2_cnn_lstm_tuned_{kind}.pkl"
        )
        if skip_existing and os.path.exists(tuned_path):
            with open(tuned_path, "rb") as fh:
                results[f"tuned_{kind}"] = pickle.load(fh)
        else:
            df, preds, weights = run_dl_nested_cv(
                seqs, meta, n_trials=n_trials, epochs=nested_epochs,
                patience=nested_patience, batch_size=batch_size,
                verbose=verbose, mesh=mesh, trial_batch=trial_batch,
            )
            save_results_pickle(tuned_path, df, preds, weights)
            results[f"tuned_{kind}"] = {
                "results_df": df, "predictions": preds, "weights": weights,
            }

        # Standard K-fold with the best fold's tuned hyperparameters
        # (nb03 cell 7 selects the max-F1 fold's params).
        tuned_df = results[f"tuned_{kind}"]["results_df"]
        best_row = tuned_df.loc[tuned_df["f1_score"].idxmax()]
        hyperparams = dict(best_row["best_params"])

        std_path = os.path.join(
            out_dir, f"results_wav2vec2_cnn_lstm_standard_{kind}.pkl"
        )
        if skip_existing and os.path.exists(std_path):
            with open(std_path, "rb") as fh:
                results[f"standard_{kind}"] = pickle.load(fh)
        else:
            df, preds, hist, weights = run_dl_standard_kfold_cv(
                seqs, meta, hyperparams, epochs=standard_epochs,
                patience=standard_patience, batch_size=batch_size,
                verbose=verbose,
            )
            save_results_pickle(std_path, df, preds, weights, histories=hist)
            results[f"standard_{kind}"] = {
                "results_df": df, "predictions": preds,
                "weights": weights, "histories": hist,
            }

        if models_dir:
            _train_final_model(
                seqs, meta, hyperparams, kind, models_dir,
                epochs=nested_epochs, patience=nested_patience,
                batch_size=batch_size, skip_existing=skip_existing,
            )
    return results


def _train_final_model(
    seqs, meta, hyperparams, kind, models_dir, epochs, patience, batch_size,
    skip_existing=True,
):
    """Final per-datatype model artifact (nb03 cell 4 schema)."""
    from .eval.dl_cv import (
        _input_dim, _subset, _TrainerCache, align_sequences_and_labels,
    )
    from .eval.splits import train_test_indices
    from .train import TrainConfig, train_model
    from .train.checkpoints import save_model_checkpoint

    path = os.path.join(models_dir, f"final_tuned_cnn_lstm_{kind}.pkl")
    if skip_existing and os.path.exists(path):
        return path
    X, y, _ = align_sequences_and_labels(seqs, meta)
    cache = _TrainerCache(input_dim=_input_dim(X))
    trainer = cache.get(hyperparams)
    tr, val = train_test_indices(y, n_splits=5, seed=42)
    cfg = TrainConfig(
        learning_rate=float(hyperparams["learning_rate"]),
        epochs=epochs, patience=patience, batch_size=batch_size,
        dropout_rate=float(hyperparams.get("dropout_rate", 0.5)),
    )
    state, th, vh = train_model(
        trainer, _subset(X, tr), y[tr], _subset(X, val), y[val], cfg
    )
    save_model_checkpoint(
        path, hyperparams, {"params": state.params, "batch_stats": state.batch_stats},
        th, vh,
    )
    return path
