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
