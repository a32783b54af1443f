"""TPE tuner: API contract and optimization behavior."""

import math

import numpy as np
import pytest

from robust_speech_analysis_framework_tpu.tune import Study, TPESampler, create_study


def test_api_contract():
    study = create_study(direction="maximize", seed=0)

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-3, log=True)
        d = trial.suggest_float("dropout", 0.2, 0.5)
        c = trial.suggest_categorical("channels", [32, 64, 128])
        assert 1e-5 <= lr <= 1e-3
        assert 0.2 <= d <= 0.5
        assert c in (32, 64, 128)
        return lr * 1000 + d + c / 100

    study.optimize(objective, n_trials=8)
    assert len(study.trials) == 8
    assert set(study.best_params) == {"lr", "dropout", "channels"}
    assert study.best_value == max(t["raw_value"] for t in study.trials)


def test_tpe_beats_random_on_quadratic():
    """TPE should concentrate samples near the optimum of a smooth function,
    and do at least as well as pure random search on the same budget."""

    def objective_value(x):
        return (x - 1.7) ** 2

    def run_tpe(sampler_seed):
        study = Study(direction="minimize", sampler=TPESampler(seed=sampler_seed, n_startup_trials=8))

        def objective(trial):
            return objective_value(trial.suggest_float("x", -5.0, 5.0))

        study.optimize(objective, n_trials=40)
        return study.best_trial["raw_value"]

    def run_random(seed):
        rng = np.random.RandomState(seed)
        return min(objective_value(x) for x in rng.uniform(-5, 5, size=40))

    tpe_best = [run_tpe(s) for s in range(5)]
    rand_best = [run_random(s) for s in range(5)]
    assert np.median(tpe_best) < 0.1
    assert np.median(tpe_best) <= np.median(rand_best) * 1.5


def test_tpe_categorical_converges():
    study = Study(direction="maximize", sampler=TPESampler(seed=1, n_startup_trials=6))

    def objective(trial):
        c = trial.suggest_categorical("c", ["a", "b", "d"])
        return {"a": 0.1, "b": 1.0, "d": 0.2}[c]

    study.optimize(objective, n_trials=30)
    assert study.best_params["c"] == "b"
    # later trials should mostly pick 'b'
    late = [t["params"]["c"] for t in study.trials[-10:]]
    assert late.count("b") >= 5


def test_log_scale_sampling_spans_decades():
    study = Study(direction="minimize", sampler=TPESampler(seed=2))
    vals = []

    def objective(trial):
        v = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        vals.append(v)
        return 0.0

    study.optimize(objective, n_trials=30)
    logs = np.log10(vals)
    assert logs.min() < -3.5 and logs.max() > -2.0


def test_ask_tell_matches_optimize():
    """Driving a study via ask/tell one trial at a time must reproduce
    optimize() exactly: same sampled params, same best trial. This is the
    contract the batch-parallel CV loop relies on (it asks K, scores them
    concurrently, tells K back)."""

    def value(params):
        return -((params["x"] - 1.0) ** 2) + params["c"]

    a = Study(direction="maximize", sampler=TPESampler(seed=3, n_startup_trials=5))

    def objective(trial):
        return value({
            "x": trial.suggest_float("x", -4.0, 4.0),
            "c": trial.suggest_categorical("c", [0, 1]),
        })

    a.optimize(objective, n_trials=20)

    b = Study(direction="maximize", sampler=TPESampler(seed=3, n_startup_trials=5))
    for _ in range(20):
        t = b.ask()
        t.suggest_float("x", -4.0, 4.0)
        t.suggest_categorical("c", [0, 1])
        b.tell(t, value(t.params))

    assert [t["params"] for t in a.trials] == [t["params"] for t in b.trials]
    assert a.best_params == b.best_params


def test_ask_batch_draws_distinct_candidates():
    """K consecutive asks sample K distinct candidates from the same
    posterior; telling them as a batch advances the search."""
    study = Study(direction="minimize", sampler=TPESampler(seed=4, n_startup_trials=4))
    for _ in range(4):  # 2 rounds of 4
        batch = [study.ask() for _ in range(4)]
        xs = [t.suggest_float("x", -5.0, 5.0) for t in batch]
        assert len(set(xs)) == len(xs)  # i.i.d. draws, RandomState advances
        for t, x in zip(batch, xs):
            study.tell(t, (x - 2.0) ** 2)
    assert len(study.trials_completed) == 16
    assert [t["number"] for t in study.trials] == list(range(16))
    assert study.best_trial["raw_value"] == min(
        t["raw_value"] for t in study.trials
    )


def test_direction_validation():
    with pytest.raises(ValueError):
        Study(direction="sideways")


def test_respaced_parameter_raises():
    """Re-suggesting a parameter with different bounds must error (Optuna
    behavior), not silently sample from the first-seen space."""
    study = Study(direction="minimize", seed=0)

    def objective(trial):
        lo = 1e-5 if trial.number == 0 else 1e-4
        return trial.suggest_float("lr", lo, 1e-3, log=True)

    with pytest.raises(ValueError, match="different space"):
        study.optimize(objective, n_trials=2)


def test_suggest_round_commits_architecture_per_round():
    """An ask-K round samples categorical (architecture) params once and
    pins them for the whole round, records them on every trial, and varies
    the continuous params per trial (eval/dl_cv._suggest_round)."""
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        DEFAULT_SEARCH_SPACE, _arch_key, _suggest_round,
    )
    from robust_speech_analysis_framework_tpu.tune import Study, TPESampler

    study = Study(direction="maximize", sampler=TPESampler(seed=3))
    asked = [study.ask() for _ in range(8)]
    plist = _suggest_round(asked, DEFAULT_SEARCH_SPACE)
    assert len(plist) == 8
    archs = {_arch_key(p) for p in plist}
    assert len(archs) == 1  # one lane-vmapped program per round
    lrs = {p["learning_rate"] for p in plist}
    assert len(lrs) == 8  # continuous params still vary per trial
    # pinned categoricals are recorded on every trial so the posterior
    # learns from all K scores
    for t, p in zip(asked, plist):
        assert t.params["cnn_out_channels"] == p["cnn_out_channels"]
        assert t.params["activation_fn"] == p["activation_fn"]
        study.tell(t, 0.5)
    # successive rounds can pick different architectures
    round2 = _suggest_round([study.ask() for _ in range(8)],
                            DEFAULT_SEARCH_SPACE)
    assert len({_arch_key(p) for p in round2}) == 1
