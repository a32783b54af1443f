"""DL CV engines: contract + learning signal on a tiny synthetic corpus."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

from robust_speech_analysis_framework_tpu.eval.dl_cv import (
    align_sequences_and_labels,
    run_dl_nested_cv,
    run_dl_standard_kfold_cv,
)


@pytest.fixture(scope="module")
def synthetic_participants():
    rng = np.random.default_rng(0)
    seqs, rows = {}, []
    for i in range(24):
        label = "Patient" if i % 2 else "Control"
        pid = f"{i:02d}_{'P' if label == 'Patient' else 'C'}"
        mu = 0.8 if label == "Patient" else 0.0
        t = int(rng.integers(16, 40))
        seqs[pid] = rng.normal(mu, 1.0, size=(t, 10)).astype(np.float32)
        rows.append({"unique_participant_id": pid, "label": label})
    # an extra metadata row with no sequence (must be dropped in alignment)
    rows.append({"unique_participant_id": "99_X", "label": "Unknown"})
    return seqs, pd.DataFrame(rows)


def test_runtime_dropout_shares_one_compiled_step_across_rates():
    """dropout_rate reaches the model as a TRACED scalar: trials of a
    hyperparameter search with different sampled rates must reuse ONE
    compiled train step per shape (a static rate recompiled every bucket
    shape per trial), and training must still respond to the rate."""
    from robust_speech_analysis_framework_tpu.eval.dl_cv import _TrainerCache
    from robust_speech_analysis_framework_tpu.train.loops import (
        TrainConfig,
        train_model,
    )

    rng = np.random.default_rng(0)
    X = [rng.normal(size=(20, 10)).astype(np.float32) for _ in range(8)]
    y = np.array([0, 1] * 4)
    cache = _TrainerCache(input_dim=10)
    hp = {"cnn_out_channels": 8, "lstm_hidden_dim": 8, "activation_fn": "silu"}
    trainer = cache.get({**hp, "dropout_rate": 0.2})
    assert cache.get({**hp, "dropout_rate": 0.45}) is trainer  # one Trainer
    sizes = []
    for rate in (0.2, 0.45):
        cfg = TrainConfig(
            learning_rate=1e-3, epochs=1, patience=2, batch_size=4,
            dropout_rate=rate, parallel_warmup=False,
        )
        state, th, _ = train_model(trainer, X[:6], y[:6], X[6:], y[6:], cfg)
        assert np.isfinite(th).all()
        sizes.append(trainer._train_step._cache_size())
    # the second rate added NO compilations: rate is a traced input, so the
    # (per-batch-shape) compiled steps from the first trial are reused
    assert sizes[1] == sizes[0]


def test_alignment(synthetic_participants):
    seqs, meta = synthetic_participants
    X, y, pids = align_sequences_and_labels(seqs, meta)
    assert len(X) == len(y) == len(pids) == 24
    assert pids == sorted(pids)
    assert y.sum() == 12


def test_standard_kfold_contract(synthetic_participants):
    seqs, meta = synthetic_participants
    hp = {
        "learning_rate": 3e-3,
        "dropout_rate": 0.2,
        "cnn_out_channels": 8,
        "lstm_hidden_dim": 8,
        "activation_fn": "silu",
    }
    results_df, preds, histories, weights = run_dl_standard_kfold_cv(
        seqs, meta, hp, n_splits=3, epochs=6, patience=6, batch_size=4
    )
    assert list(results_df["fold"]) == [1, 2, 3]
    assert {"accuracy", "f1_score", "precision", "recall", "auc"} <= set(results_df.columns)
    assert len(preds) == 3 and len(histories) == 3
    assert weights.shape == (3, 10)
    # separable data: the model should beat chance clearly
    assert results_df["accuracy"].mean() > 0.7


def test_train_trials_device_lane_parity():
    """Lane i of a train_trials_device batch must reproduce a sequential
    train_model run of trial i (same seed/arch, lr+dropout as lane inputs):
    the batched path is a pure vmap, not a different algorithm."""
    from robust_speech_analysis_framework_tpu.eval.dl_cv import _TrainerCache
    from robust_speech_analysis_framework_tpu.ops.framing import collect
    from robust_speech_analysis_framework_tpu.train.loops import (
        TrainConfig,
        train_model,
        train_trials_device,
    )

    rng = np.random.default_rng(3)
    X = [rng.normal(size=(int(rng.integers(16, 40)), 10)).astype(np.float32)
         for _ in range(12)]
    y = np.array([0, 1] * 6)
    cache = _TrainerCache(input_dim=10)
    hp = {"cnn_out_channels": 8, "lstm_hidden_dim": 8, "activation_fn": "silu"}
    trainer = cache.get(hp)
    lrs, rates = [1e-3, 5e-3], [0.0, 0.0]
    cfg = TrainConfig(
        learning_rate=lrs[0], epochs=3, patience=4, batch_size=4, seed=7,
        dropout_rate=0.0, use_plateau=False, restore_best=False,
    )
    states, hist_def = train_trials_device(
        trainer, X[:8], y[:8], X[8:], y[8:], cfg, lrs, rates
    )
    assert states.lr.shape == (2,)
    hists = collect([hist_def])[0]
    for lane, lr in enumerate(lrs):
        cfg_i = TrainConfig(
            learning_rate=lr, epochs=3, patience=4, batch_size=4, seed=7,
            dropout_rate=0.0, use_plateau=False, restore_best=False,
        )
        _, th, vh = train_model(trainer, X[:8], y[:8], X[8:], y[8:], cfg_i)
        np.testing.assert_allclose(hists[lane][0], th, rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(hists[lane][1], vh, rtol=3e-4, atol=1e-5)


def test_batched_inner_cv_scores_match_sequential():
    """_inner_cv_scores_batch (lane-vmapped trials, one collect) must score
    each trial identically to the sequential _inner_cv_score loop — the
    reference's per-trial semantics (src/dl_cv_strategies.py:197-254) are
    preserved; only the dispatch is batched."""
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        _TrainerCache,
        _inner_cv_score,
        _inner_cv_scores_batch,
    )

    rng = np.random.default_rng(1)
    X = [rng.normal(size=(int(rng.integers(16, 40)), 10)).astype(np.float32)
         for _ in range(12)]
    y = np.array([0, 1] * 6)
    cache = _TrainerCache(input_dim=10)
    hp = {"cnn_out_channels": 8, "lstm_hidden_dim": 8, "activation_fn": "silu"}
    plist = [
        {"learning_rate": 1e-3, "dropout_rate": 0.2, **hp},
        {"learning_rate": 3e-3, "dropout_rate": 0.3, **hp},
        {"learning_rate": 5e-3, "dropout_rate": 0.25, **hp},
    ]
    batched = _inner_cv_scores_batch(cache, plist, X, y, 2, 2, 4, 42)
    sequential = [_inner_cv_score(cache, p, X, y, 2, 2, 4, 42) for p in plist]
    np.testing.assert_allclose(batched, sequential, atol=1e-6)


def test_nested_cv_trial_batch_mesh_matches_single_device(synthetic_participants):
    """The batched (ask-K) nested-CV search under the 8-device mesh must
    pick the same best params as the same batched search on one device:
    sharding the trial lanes across chips changes placement, not results."""
    from robust_speech_analysis_framework_tpu.parallel import make_mesh

    seqs, meta = synthetic_participants
    space = {
        "learning_rate": ("float_log", 1e-3, 5e-3),
        "dropout_rate": ("float", 0.2, 0.3),
        "cnn_out_channels": ("categorical", [8]),
        "lstm_hidden_dim": ("categorical", [8]),
        "activation_fn": ("categorical", ["silu"]),
    }
    kwargs = dict(
        n_splits_outer=2, n_splits_inner=2, n_trials=4, epochs=2,
        patience=3, batch_size=4, inner_epochs=2, search_space=space,
        trial_batch=4,
    )
    res_mesh, _, _ = run_dl_nested_cv(seqs, meta, mesh=make_mesh(8, mp=1), **kwargs)
    res_one, _, _ = run_dl_nested_cv(seqs, meta, **kwargs)
    for a, b in zip(res_mesh["best_params"], res_one["best_params"]):
        assert a == b
    np.testing.assert_allclose(
        res_mesh["f1_score"].to_numpy(), res_one["f1_score"].to_numpy(), atol=1e-6
    )


def test_nested_cv_contract(synthetic_participants):
    seqs, meta = synthetic_participants
    space = {
        "learning_rate": ("float_log", 1e-3, 5e-3),
        "dropout_rate": ("float", 0.2, 0.3),
        "cnn_out_channels": ("categorical", [8]),
        "lstm_hidden_dim": ("categorical", [8]),
        "activation_fn": ("categorical", ["silu"]),
    }
    results_df, preds, weights = run_dl_nested_cv(
        seqs,
        meta,
        n_splits_outer=2,
        n_splits_inner=2,
        n_trials=2,
        epochs=4,
        patience=4,
        batch_size=4,
        inner_epochs=2,
        search_space=space,
    )
    assert len(results_df) == 2
    assert "best_params" in results_df.columns
    for bp in results_df["best_params"]:
        assert set(bp) == set(space)
    assert weights.shape == (2, 10)
    assert len(preds) == 2
