"""Training engine: learning on a separable toy task, early stop, plateau LR."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

from robust_speech_analysis_framework_tpu.data.batching import (
    batch_iterator,
    bucket_length,
    pad_batch,
)
from robust_speech_analysis_framework_tpu.models import CNNLSTM
from robust_speech_analysis_framework_tpu.train import (
    ReduceLROnPlateau,
    TrainConfig,
    Trainer,
    evaluate_model,
    train_model,
)


def _toy_dataset(n_per_class=10, dim=12, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for label, mu in [(0, 0.0), (1, 1.0)]:
        for _ in range(n_per_class):
            t = int(rng.integers(16, 48))
            xs.append(rng.normal(mu, 1.0, size=(t, dim)).astype(np.float32))
            ys.append(label)
    return xs, np.array(ys)


def test_bucket_length():
    assert bucket_length(10) == 64
    assert bucket_length(64) == 64
    assert bucket_length(65) == 128
    assert bucket_length(300) == 512


def test_pad_batch():
    seqs = [np.ones((10, 4)), np.ones((70, 4))]
    batch, lengths = pad_batch(seqs)
    assert batch.shape == (2, 128, 4)
    np.testing.assert_array_equal(lengths, [10, 70])
    assert batch[0, 10:].sum() == 0


def test_batch_iterator_deterministic():
    seqs = [np.zeros((5, 2))] * 7
    labels = list(range(7))
    got1 = [l.tolist() for _, _, l in batch_iterator(seqs, labels, 3, shuffle=True, seed=9)]
    got2 = [l.tolist() for _, _, l in batch_iterator(seqs, labels, 3, shuffle=True, seed=9)]
    assert got1 == got2
    flat = [x for b in got1 for x in b]
    assert sorted(flat) == labels


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.1, patience=2)
    lr = 1.0
    lr = s.step(1.0, lr)  # best
    lr = s.step(1.0, lr)  # bad 1
    lr = s.step(1.0, lr)  # bad 2
    assert lr == 1.0
    lr = s.step(1.0, lr)  # bad 3 > patience -> decay
    assert lr == pytest.approx(0.1)


def test_training_learns_and_early_stops():
    xs, ys = _toy_dataset()
    model = CNNLSTM(input_dim=12, cnn_out_channels=8, lstm_hidden_dim=8, dropout_rate=0.2)
    trainer = Trainer(model)
    cfg = TrainConfig(
        learning_rate=3e-3, epochs=30, patience=5, batch_size=4, seed=0, min_bucket=16
    )
    state, train_hist, val_hist = train_model(
        trainer, xs[:16], ys[:16], xs[16:], ys[16:], cfg
    )
    assert len(train_hist) == len(val_hist) <= 30
    # dropout makes single epochs noisy; the floor must drop substantially
    assert min(train_hist) < 0.5 * train_hist[0]
    y_true, y_pred, y_prob = evaluate_model(trainer, state, xs, ys, cfg)
    assert (y_true == y_pred).mean() >= 0.9
    assert y_prob.shape == (len(xs),)
    assert np.all((y_prob >= 0) & (y_prob <= 1))


def test_masked_training_runs():
    xs, ys = _toy_dataset(n_per_class=6)
    model = CNNLSTM(input_dim=12, cnn_out_channels=4, lstm_hidden_dim=4)
    trainer = Trainer(model)
    cfg = TrainConfig(
        learning_rate=1e-3, epochs=2, patience=5, batch_size=4,
        use_length_masking=True, min_bucket=16,
    )
    state, th, vh = train_model(trainer, xs[:8], ys[:8], xs[8:], ys[8:], cfg)
    assert np.isfinite(th).all() and np.isfinite(vh).all()


def test_parallel_warmup_identical_histories():
    """Warmup must not consume the training rng stream or alter results."""
    xs, ys = _toy_dataset(n_per_class=5)
    model = CNNLSTM(input_dim=12, cnn_out_channels=4, lstm_hidden_dim=4)
    hists = []
    for warm in (False, True):
        trainer = Trainer(model)
        cfg = TrainConfig(
            learning_rate=1e-3, epochs=3, patience=5, batch_size=4,
            min_bucket=16, parallel_warmup=warm,
        )
        state, th, vh = train_model(trainer, xs[:7], ys[:7], xs[7:], ys[7:], cfg)
        hists.append((th, vh))
    np.testing.assert_allclose(hists[0][0], hists[1][0], rtol=1e-6)
    np.testing.assert_allclose(hists[0][1], hists[1][1], rtol=1e-6)


def test_device_fold_matches_streaming_on_uniform_buckets():
    """The device-resident fold (one while_loop program) reproduces the
    streaming epoch loop when every sequence shares a padded bucket: same
    RNG split order, same batch plan, same plateau/early-stop decisions."""
    import dataclasses

    rng = np.random.default_rng(3)
    xs = [rng.normal(size=(40, 12)).astype(np.float32) for _ in range(19)]
    ys = (rng.random(19) > 0.5).astype(int)
    model = CNNLSTM(input_dim=12, cnn_out_channels=4, lstm_hidden_dim=4)
    trainer = Trainer(model)
    cfg_s = TrainConfig(
        learning_rate=1e-3, epochs=6, patience=3, batch_size=4, seed=1,
        dropout_rate=0.3, min_bucket=64, device_fold="off",
        parallel_warmup=False,
    )
    cfg_d = dataclasses.replace(cfg_s, device_fold="on")
    s1, th1, vh1 = train_model(trainer, xs[:13], ys[:13], xs[13:], ys[13:], cfg_s)
    s2, th2, vh2 = train_model(trainer, xs[:13], ys[:13], xs[13:], ys[13:], cfg_d)
    assert len(th1) == len(th2)  # same early-stop epoch
    np.testing.assert_allclose(th1, th2, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(vh1, vh2, rtol=2e-4, atol=2e-5)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)


def test_device_fold_corpus_view_matches_host_lists():
    """SeqView (resident-corpus gather) folds == host-list folds when the
    padded shapes agree."""
    from robust_speech_analysis_framework_tpu.train.loops import DeviceCorpus

    rng = np.random.default_rng(4)
    xs = [rng.normal(size=(100, 12)).astype(np.float32) for _ in range(15)]
    ys = (rng.random(15) > 0.5).astype(int)
    corpus = DeviceCorpus(xs, align=128)
    tr, va = np.arange(10), np.arange(10, 15)
    model = CNNLSTM(input_dim=12, cnn_out_channels=4, lstm_hidden_dim=4)
    trainer = Trainer(model)
    cfg = TrainConfig(
        learning_rate=1e-3, epochs=4, patience=10, batch_size=4, seed=2,
        dropout_rate=0.2, min_bucket=128, device_fold="on",
        parallel_warmup=False,
    )
    s1, th1, vh1 = train_model(
        trainer, corpus.view(tr), ys[tr], corpus.view(va), ys[va], cfg
    )
    # host lists pad to bucket_length(100, min_bucket=128) == 128 == corpus pad
    s2, th2, vh2 = train_model(
        trainer, [xs[i] for i in tr], ys[tr], [xs[i] for i in va], ys[va], cfg
    )
    np.testing.assert_allclose(th1, th2, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(vh1, vh2, rtol=2e-4, atol=2e-5)
    # eval through the view path matches the host path
    yt1, yp1, pr1 = evaluate_model(trainer, s1, corpus.view(va), ys[va], cfg)
    yt2, yp2, pr2 = evaluate_model(trainer, s1, [xs[i] for i in va], ys[va], cfg)
    assert (yt1 == yt2).all() and (yp1 == yp2).all()
    np.testing.assert_allclose(pr1, pr2, rtol=1e-4, atol=1e-5)


def test_device_fold_mixed_lengths_contract():
    """Mixed-length data: device fold still honors epochs/patience contract
    and returns finite histories."""
    xs, ys = _toy_dataset(n_per_class=8)
    model = CNNLSTM(input_dim=12, cnn_out_channels=4, lstm_hidden_dim=4)
    trainer = Trainer(model)
    cfg = TrainConfig(
        learning_rate=1e-3, epochs=40, patience=2, batch_size=4, seed=0,
        min_bucket=16, device_fold="on", parallel_warmup=False,
    )
    state, th, vh = train_model(trainer, xs[:12], ys[:12], xs[12:], ys[12:], cfg)
    assert 2 <= len(th) == len(vh) <= 40
    assert np.isfinite(th).all() and np.isfinite(vh).all()


def test_remat_matches_plain_training():
    """TrainConfig.remat (jax.checkpoint backward) is numerically identical
    to plain training — it only trades activation memory for recompute."""
    import pandas as pd

    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )

    rng = np.random.default_rng(5)
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
    df_p, _, hist_p, w_p = run_dl_standard_kfold_cv(seqs, meta, hp, **kw)
    df_r, _, hist_r, w_r = run_dl_standard_kfold_cv(
        seqs, meta, hp, remat=True, **kw
    )
    pd.testing.assert_frame_equal(df_p, df_r)
    np.testing.assert_allclose(w_p, w_r, atol=1e-6)
    for a, b in zip(hist_p, hist_r):
        np.testing.assert_allclose(a["train"], b["train"], atol=1e-5)
