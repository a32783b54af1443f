"""Result-analysis helpers (nb02/nb03 analysis cell equivalents)."""

import os
import numpy as np
import pandas as pd
import pytest

from robust_speech_analysis_framework_tpu.eval.analysis import (
    dimension_stability,
    feature_selection_stability,
    optimism_bias,
    summarize_results,
    task_gain,
    tuned_param_summary,
)


def _fake_results():
    rng = np.random.default_rng(0)

    def df(mean):
        return pd.DataFrame(
            {
                "fold": range(1, 6),
                "accuracy": mean + rng.normal(0, 0.02, 5),
                "f1_score": mean + rng.normal(0, 0.02, 5),
                "precision": mean + rng.normal(0, 0.02, 5),
                "recall": mean + rng.normal(0, 0.02, 5),
                "auc": mean + 0.05 + rng.normal(0, 0.02, 5),
                "selected_features": [["a", "b"], ["a", "c"], ["a", "b"],
                                      ["b", "c"], ["a", "b"]],
            }
        )

    return {
        "mshds_reading_standard": {"results_df": df(0.74)},
        "mshds_reading_nested": {"results_df": df(0.70)},
        "mshds_interview_standard": {"results_df": df(0.72)},
        "mshds_interview_nested": {"results_df": df(0.73)},
    }


def test_summarize():
    s = summarize_results(_fake_results())
    assert "f1_score_mean" in s.columns and "f1_score_std" in s.columns
    assert len(s) == 4
    assert s.loc["mshds_reading_standard", "accuracy_mean"] == pytest.approx(0.74, abs=0.05)


def test_optimism_bias():
    b = optimism_bias(_fake_results())
    assert set(b["dataset"]) == {"mshds_reading", "mshds_interview"}
    row = b[b["dataset"] == "mshds_reading"].iloc[0]
    assert row["bias"] == pytest.approx(0.04, abs=0.05)


def test_task_gain():
    g = task_gain(_fake_results(), protocol="nested")
    assert list(g["feature_set"]) == ["mshds"]
    assert g.iloc[0]["gain"] == pytest.approx(0.03, abs=0.05)


def test_feature_stability():
    res = _fake_results()["mshds_reading_standard"]["results_df"]
    st = feature_selection_stability(res)
    assert st.iloc[0]["feature"] == "a"
    assert st.iloc[0]["count"] == 4
    assert st.iloc[0]["fraction"] == pytest.approx(0.8)


def test_dimension_stability():
    rng = np.random.default_rng(1)
    base = rng.random(100)
    weights = np.stack([base + 0.01 * rng.random(100) for _ in range(5)])
    out = dimension_stability(weights, top_k=20)
    assert out["mean_jaccard"] > 0.8  # nearly identical folds
    assert len(out["always_selected"]) > 10
    assert out["counts"].iloc[0]["count"] == 5


def test_tuned_param_summary():
    df = pd.DataFrame(
        {
            "best_params": [
                {"learning_rate": 1e-4, "cnn_out_channels": 128, "activation_fn": "silu"},
                {"learning_rate": 2e-4, "cnn_out_channels": 128, "activation_fn": "silu"},
                {"learning_rate": 3e-4, "cnn_out_channels": 32, "activation_fn": "gelu"},
            ]
        }
    )
    s = tuned_param_summary(df)
    assert s.loc["learning_rate", "kind"] == "mean"
    assert s.loc["learning_rate", "summary"] == pytest.approx(2e-4)
    assert s.loc["cnn_out_channels", "summary"] == 128
    assert s.loc["activation_fn", "summary"] == "silu"


def test_plots_render(tmp_path):
    from robust_speech_analysis_framework_tpu.eval.plots import save_all

    rng = np.random.default_rng(5)
    results = _fake_results()
    for r in results.values():
        r["predictions"] = [
            {"y_true": rng.integers(0, 2, 20), "y_prob": rng.random(20)}
            for _ in range(5)
        ]
    results["mshds_reading_standard"]["histories"] = [
        {"train": [1.0, 0.8, 0.6], "val": [1.1, 0.9, 0.8]} for _ in range(2)
    ]
    written = save_all(results, str(tmp_path))
    import os

    assert {"f1_boxplot", "mean_roc", "optimism_bias",
            "loss_curves_mshds_reading_standard"} <= set(written)
    for p in written.values():
        assert os.path.getsize(p) > 1000


def test_readme_perf_tables_not_stale():
    """README.md / docs/DESIGN.md performance tables are GENERATED from
    benchmarks/results.json (benchmarks/report.py); a hand-edit or a
    results refresh without regeneration must fail here (VERDICT r3
    items 3/7)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "benchmarks.report", "--check"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr
