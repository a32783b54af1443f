"""Resident-corpus budget derivation + allocation-failure downshift."""

import logging

import numpy as np

from robust_speech_analysis_framework_tpu.eval import dl_cv
from robust_speech_analysis_framework_tpu.train.loops import DeviceCorpus, SeqView


def _toy_corpus(n=4, t=12, d=6):
    rng = np.random.default_rng(0)
    return [rng.normal(size=(t, d)).astype(np.float32) for _ in range(n)]


def test_budget_derived_from_device_memory_stats(monkeypatch):
    """Budget = bytes_limit/4 when the backend reports memory stats (TPU
    does); the 4 GiB literal is only the no-stats (CPU) fallback."""
    import jax

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30}

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [FakeDev()])
    assert dl_cv._corpus_budget_bytes() == 4 << 30

    class NoStatsDev:
        def memory_stats(self):
            return None

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [NoStatsDev()])
    assert dl_cv._corpus_budget_bytes() == dl_cv._CORPUS_BUDGET_FALLBACK_BYTES


def test_over_budget_corpus_streams_from_host(monkeypatch):
    monkeypatch.setattr(dl_cv, "_corpus_budget_bytes", lambda: 1)
    X = _toy_corpus()
    out = dl_cv._as_device_corpus(X)
    assert out is X  # untouched host list → streaming path


def test_allocation_failure_downshifts_with_warning(monkeypatch, caplog):
    """An XLA allocation/transfer failure (RuntimeError) downshifts to host
    streaming with a logged warning; programming errors must propagate."""
    from robust_speech_analysis_framework_tpu.train import loops

    class ExplodingCorpus:
        nbytes_estimate = staticmethod(DeviceCorpus.nbytes_estimate)

        def __init__(self, *a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    monkeypatch.setattr(loops, "DeviceCorpus", ExplodingCorpus)
    X = _toy_corpus()
    with caplog.at_level(logging.WARNING):
        out = dl_cv._as_device_corpus(X)
    assert out is X
    assert any("resident-corpus upload failed" in r.message for r in caplog.records)


def test_programming_error_propagates(monkeypatch):
    from robust_speech_analysis_framework_tpu.train import loops

    class BuggyCorpus:
        nbytes_estimate = staticmethod(DeviceCorpus.nbytes_estimate)

        def __init__(self, *a, **k):
            raise TypeError("bad argument")

    monkeypatch.setattr(loops, "DeviceCorpus", BuggyCorpus)
    try:
        dl_cv._as_device_corpus(_toy_corpus())
    except TypeError:
        pass
    else:
        raise AssertionError("TypeError must not be swallowed")


def test_device_corpus_roundtrip_and_view():
    X = _toy_corpus(n=3, t=10, d=4)
    corpus = DeviceCorpus(X, align=8)
    view = corpus.view(np.arange(3))
    assert isinstance(view, SeqView)
    sub = view.subset(np.array([2, 0]))
    np.testing.assert_array_equal(
        np.asarray(corpus.x[sub.idx[0], : len(X[2])]), X[2]
    )
    assert [len(sub[i]) for i in range(2)] == [len(X[2]), len(X[0])]
    np.testing.assert_array_equal(sub[1], X[0])


def test_eval_gather_program_rekeys_on_corpus_shape():
    """Two resident corpora with the SAME batch-index length but different
    padded (N, T, D) buffers must not share an eval gather program: exported
    programs are fixed-shape, and serving the 12-frame corpus's program to
    the 20-frame corpus either raises a shape mismatch or silently reads the
    wrong buffer (regression: the battery's reading vs combined sets)."""
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.models import CNNLSTM
    from robust_speech_analysis_framework_tpu.train.loops import (
        TrainConfig, Trainer,
    )

    rng = np.random.default_rng(7)
    short = [rng.normal(size=(10, 6)).astype(np.float32) for _ in range(4)]
    long = [rng.normal(size=(18, 6)).astype(np.float32) for _ in range(4)]
    model = CNNLSTM(input_dim=6, cnn_out_channels=4, lstm_hidden_dim=4)
    trainer = Trainer(model)
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 6)), 1e-3
    )
    cfg = TrainConfig(batch_size=4, min_bucket=8)

    outs = []
    for data in (short, long):
        corpus = DeviceCorpus(data, align=8)
        view = corpus.view(np.arange(4))
        logits = trainer.eval_logits_deferred(state, view, cfg).result()
        # oracle: the plain host-list eval of the same sequences
        ref = trainer.eval_logits(state, data, cfg)
        np.testing.assert_allclose(logits, ref, rtol=1e-4, atol=1e-5)
        outs.append(logits)
    assert outs[0].shape == outs[1].shape == (4, 2)


def test_resident_corpus_shared_across_engine_passes():
    """ResidentCorpus: one upload serves nested AND standard engine passes
    with results identical to the plain-dict path (r5: the battery uploaded
    each sequence set twice)."""
    import pandas as pd

    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )
    from robust_speech_analysis_framework_tpu.train.loops import (
        DeviceCorpus, ResidentCorpus,
    )

    rng = np.random.default_rng(11)
    seqs = {
        f"{i:02d}_{'P' if i % 2 else 'C'}":
            rng.normal(size=(int(rng.integers(16, 48)), 8)).astype(np.float32)
        for i in range(20)
    }
    meta = pd.DataFrame([
        {"unique_participant_id": k,
         "label": "Patient" if k.endswith("P") else "Control"}
        for k in seqs
    ])
    hp = {"learning_rate": 1e-3, "dropout_rate": 0.3,
          "cnn_out_channels": 4, "lstm_hidden_dim": 4,
          "activation_fn": "silu"}
    # default align (128) — the engines' own upload pads identically, so
    # train-mode BatchNorm sees the same padding on both paths
    rc = ResidentCorpus(seqs)
    # mapping façade
    assert set(rc.keys()) == set(seqs.keys())
    k0 = next(iter(seqs))
    np.testing.assert_array_equal(rc[k0], seqs[k0])
    # from_resident adopts the SAME DeviceCorpus (no re-upload)
    assert DeviceCorpus.from_resident(rc) is rc.device_corpus()

    kw = dict(n_splits=2, epochs=2, patience=3, batch_size=4)
    df_r, _, _, w_r = run_dl_standard_kfold_cv(rc, meta, hp, **kw)
    df_h, _, _, w_h = run_dl_standard_kfold_cv(seqs, meta, hp, **kw)
    pd.testing.assert_frame_equal(df_r, df_h)
    np.testing.assert_allclose(w_r, w_h, atol=1e-6)


def test_bf16_resident_corpus_trains_close_to_f32():
    """bfloat16 corpus storage (the HBM capacity lever) runs the same CV
    engine with quantized-input results close to f32 storage."""
    import pandas as pd

    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )
    from robust_speech_analysis_framework_tpu.train.loops import ResidentCorpus

    rng = np.random.default_rng(13)
    seqs = {
        f"{i:02d}_{'P' if i % 2 else 'C'}":
            rng.normal(size=(int(rng.integers(16, 40)), 8)).astype(np.float32)
        for i in range(20)
    }
    meta = pd.DataFrame([
        {"unique_participant_id": k,
         "label": "Patient" if k.endswith("P") else "Control"}
        for k in seqs
    ])
    hp = {"learning_rate": 1e-3, "dropout_rate": 0.3,
          "cnn_out_channels": 4, "lstm_hidden_dim": 4,
          "activation_fn": "silu"}
    kw = dict(n_splits=2, epochs=2, patience=3, batch_size=4)
    import jax.numpy as jnp

    rc16 = ResidentCorpus(seqs, dtype=jnp.bfloat16)
    assert str(rc16.device_corpus().x.dtype) == "bfloat16"
    df16, _, _, w16 = run_dl_standard_kfold_cv(rc16, meta, hp, **kw)
    df32, _, _, w32 = run_dl_standard_kfold_cv(seqs, meta, hp, **kw)
    # inputs quantized at ~3e-3: loss trajectories drift but the learned
    # stability vectors stay close on this tiny problem
    np.testing.assert_allclose(w16, w32, rtol=0.15, atol=5e-3)
    assert set(df16.columns) == set(df32.columns)
