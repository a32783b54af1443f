"""Torch CNN-LSTM checkpoint porting: numerical parity vs torch eval mode."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training/inference-heavy (pytest.ini)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from robust_speech_analysis_framework_tpu.models import CNNLSTM
from robust_speech_analysis_framework_tpu.models.torch_port import (
    infer_architecture,
    port_torch_cnn_lstm,
)
from benchmarks.torch_baseline import build_torch_model

# benchmarks.torch_baseline's model is architecturally identical to the
# reference CNN-LSTM but uses different attribute names; rename its state
# dict to the reference key scheme to exercise the porter.
_RENAME = {
    "block1.body.0": "res_block1.conv1",
    "block1.body.1": "res_block1.bn1",
    "block1.body.4": "res_block1.conv2",
    "block1.body.5": "res_block1.bn2",
    "block1.skip.0": "res_block1.shortcut.0",
    "block1.skip.1": "res_block1.shortcut.1",
    "block2.body.0": "res_block2.conv1",
    "block2.body.1": "res_block2.bn1",
    "block2.body.4": "res_block2.conv2",
    "block2.body.5": "res_block2.bn2",
    "rnn": "lstm",
    "attn": "attention_pooling.attention_weights",
    "head": "fc",
}


def _reference_style_state_dict(model):
    out = {}
    for k, v in model.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        for old, new in _RENAME.items():
            if k.startswith(old + "."):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


@pytest.fixture(scope="module")
def ported():
    import benchmarks.torch_baseline as tb

    torch.manual_seed(0)
    # small dims for speed; baseline builder uses DIM=768 constant — patch in
    old_dim = tb.DIM
    tb.DIM = 24
    try:
        tmodel = tb.build_torch_model(cnn_channels=8, lstm_hidden=8).eval()
    finally:
        tb.DIM = old_dim
    sd = _reference_style_state_dict(tmodel)
    return tmodel, sd


@pytest.fixture(scope="module")
def ported_gelu():
    import benchmarks.torch_baseline as tb

    torch.manual_seed(1)
    old_dim = tb.DIM
    tb.DIM = 24
    try:
        tmodel = tb.build_torch_model(cnn_channels=8, lstm_hidden=8,
                                      activation="gelu").eval()
    finally:
        tb.DIM = old_dim
    return tmodel, _reference_style_state_dict(tmodel)


def test_infer_architecture(ported):
    _, sd = ported
    arch = infer_architecture(sd)
    assert arch == {
        "input_dim": 24,
        "cnn_out_channels": 8,
        "lstm_hidden_dim": 8,
        "lstm_layers": 2,
        "num_classes": 2,
    }


def test_forward_parity(ported):
    tmodel, sd = ported
    variables = port_torch_cnn_lstm(sd)
    model = CNNLSTM(input_dim=24, cnn_out_channels=8, lstm_hidden_dim=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 40, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_gelu_is_exact_erf_form():
    """torch F.gelu defaults to exact erf; flax nn.gelu defaults to the tanh
    approximation — the lookup must pin approximate=False (regression)."""
    from robust_speech_analysis_framework_tpu.models.cnn_lstm import get_activation_fn

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.gelu(torch.tensor(x)).numpy()
    ours = np.asarray(get_activation_fn("gelu")(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_forward_parity_gelu(ported_gelu):
    tmodel, sd = ported_gelu
    variables = port_torch_cnn_lstm(sd)
    model = CNNLSTM(input_dim=24, cnn_out_channels=8, lstm_hidden_dim=8,
                    activation_fn="gelu")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 40, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
