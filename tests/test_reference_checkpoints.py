"""Parity against the reference's REAL saved model artifacts.

The reference repo ships two genuine trained checkpoints
(``models/final_tuned_cnn_lstm_{reading,combined}.pt``, nb03 cell 4 schema).
These tests load them through :mod:`models.torch_port`, rebuild the same
model with the reference's own ``src/models.py`` as the torch-side oracle,
and assert logit parity — the porter must not regress against the true
artifacts (VERDICT r1 item 5). They skip when the reference checkout is not
mounted (CI without /root/reference).
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF_DIR = os.environ.get("RSAF_REFERENCE_DIR", "/root/reference")
CHECKPOINTS = {
    "reading": os.path.join(REF_DIR, "models", "final_tuned_cnn_lstm_reading.pt"),
    "combined": os.path.join(REF_DIR, "models", "final_tuned_cnn_lstm_combined.pt"),
}

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(CHECKPOINTS["reading"]),
        reason="reference checkout (RSAF_REFERENCE_DIR) not mounted",
    ),
]


def _reference_torch_model(payload):
    """Instantiate the reference's own CNNLSTM (src/models.py) as the oracle."""
    spec = importlib.util.spec_from_file_location(
        "rsaf_reference_models", os.path.join(REF_DIR, "src", "models.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    hp = payload["hyperparameters"]
    model = mod.CNNLSTM(
        input_dim=768,
        num_classes=2,
        cnn_out_channels=int(hp["cnn_out_channels"]),
        lstm_hidden_dim=int(hp["lstm_hidden_dim"]),
        dropout_rate=float(hp["dropout_rate"]),
        activation_fn=str(hp["activation_fn"]),
    )
    model.load_state_dict(payload["model_state_dict"])
    return model.eval()


@pytest.mark.parametrize("kind", ["reading", "combined"])
def test_real_checkpoint_logit_parity(kind):
    from robust_speech_analysis_framework_tpu.models.torch_port import (
        infer_architecture,
        load_reference_checkpoint,
    )

    path = CHECKPOINTS[kind]
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    payload = torch.load(path, map_location="cpu", weights_only=False)
    arch = infer_architecture(payload["model_state_dict"])
    assert arch["input_dim"] == 768
    assert arch["num_classes"] == 2
    assert arch["cnn_out_channels"] == int(
        payload["hyperparameters"]["cnn_out_channels"]
    )

    tmodel = _reference_torch_model(payload)
    model, variables, hp = load_reference_checkpoint(path)
    assert hp["activation_fn"] == payload["hyperparameters"]["activation_fn"]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 768)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_predictor_end_to_end_on_real_checkpoint():
    """serving.Predictor drives the real reading checkpoint audio→label."""
    from robust_speech_analysis_framework_tpu.features.wav2vec2 import (
        Wav2Vec2Extractor,
    )
    from robust_speech_analysis_framework_tpu.models.wav2vec2 import Wav2Vec2Config
    from robust_speech_analysis_framework_tpu.serving import Predictor

    ex = Wav2Vec2Extractor(
        config=Wav2Vec2Config(num_layers=2), batch_size=2, allow_random_init=True
    )
    predictor = Predictor.from_reference_checkpoint(
        CHECKPOINTS["reading"], extractor=ex
    )
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    pred = predictor.predict(wav)
    assert pred.label in ("Control", "Patient")
    assert 0.0 <= pred.probability <= 1.0
    assert np.isfinite(pred.logits).all()
    # same sequence → same logits through the serving path (determinism)
    pred2 = predictor.predict(wav)
    np.testing.assert_allclose(pred2.logits, pred.logits, atol=0)
