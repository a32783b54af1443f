"""Serving path: checkpoint loading + end-to-end prediction."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor
from robust_speech_analysis_framework_tpu.models import CNNLSTM
from robust_speech_analysis_framework_tpu.models.wav2vec2 import Wav2Vec2Config
from robust_speech_analysis_framework_tpu.serving import Predictor
from robust_speech_analysis_framework_tpu.train.checkpoints import (
    save_model_checkpoint,
)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    model = CNNLSTM(input_dim=768, cnn_out_channels=8, lstm_hidden_dim=8)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 768)), train=False
    )
    path = str(tmp_path_factory.mktemp("m") / "model.pkl")
    save_model_checkpoint(
        path,
        {"input_dim": 768, "cnn_out_channels": 8, "lstm_hidden_dim": 8,
         "dropout_rate": 0.3, "activation_fn": "silu", "learning_rate": 1e-4},
        variables,
        [1.0, 0.5],
        [1.1, 0.6],
    )
    return path


def test_predict_sequence_and_waveform(tiny_ckpt):
    ex = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=2, allow_random_init=True)
    p = Predictor.from_checkpoint(tiny_ckpt, extractor=ex)
    rng = np.random.default_rng(0)

    seq = rng.normal(size=(300, 768)).astype(np.float32)
    pred = p.predict_sequence(seq)
    assert pred.label in ("Patient", "Control")
    assert 0.0 <= pred.probability <= 1.0
    assert pred.logits.shape == (2,)

    wav = rng.normal(size=2 * 16000).astype(np.float32) * 0.1
    pred2 = p.predict(wav)
    assert pred2.label in ("Patient", "Control")
    assert pred2.latency_seconds > 0

    with pytest.raises(ValueError):
        p.predict(np.zeros(1000, np.float32))  # < 0.5 s


def test_predict_files(tiny_ckpt, tmp_path):
    from robust_speech_analysis_framework_tpu.audio.io import write_wav

    ex = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=2, allow_random_init=True)
    p = Predictor.from_checkpoint(tiny_ckpt, extractor=ex)
    rng = np.random.default_rng(1)
    paths = []
    for i in range(2):
        q = str(tmp_path / f"a{i}.wav")
        write_wav(q, rng.normal(size=16000).astype(np.float32) * 0.1, 16000)
        paths.append(q)
    out = p.predict_files(paths)
    assert set(out) == {"a0.wav", "a1.wav"}


def test_from_reference_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    import benchmarks.torch_baseline as tb
    from tests.test_torch_port import _reference_style_state_dict

    old = tb.DIM
    tb.DIM = 768
    try:
        tmodel = tb.build_torch_model(cnn_channels=8, lstm_hidden=8).eval()
    finally:
        tb.DIM = old
    payload = {
        "hyperparameters": {"dropout_rate": 0.4, "activation_fn": "silu"},
        "model_state_dict": _reference_style_state_dict(tmodel),
        "train_loss_history": [],
        "val_loss_history": [],
    }
    path = str(tmp_path / "ref.pt")
    torch.save(payload, path)
    ex = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=2, allow_random_init=True)
    p = Predictor.from_reference_checkpoint(path, extractor=ex)
    pred = p.predict_sequence(
        np.random.default_rng(2).normal(size=(100, 768)).astype(np.float32)
    )
    assert pred.label in ("Patient", "Control")
