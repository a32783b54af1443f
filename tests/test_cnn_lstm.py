"""CNN-LSTM model unit tests: shapes, masking, LSTM correctness vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.models import CNNLSTM, BiLSTM
from robust_speech_analysis_framework_tpu.models.cnn_lstm import (
    LSTMCellFused,
    get_activation_fn,
    stability_probe,
)


def test_activation_lookup():
    assert get_activation_fn("silu") is not None
    assert get_activation_fn("gelu") is not None
    with pytest.raises(ValueError):
        get_activation_fn("relu")


def test_forward_shapes():
    model = CNNLSTM(input_dim=16, cnn_out_channels=8, lstm_hidden_dim=8)
    x = jnp.zeros((3, 20, 16))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (3, 2)


def test_lstm_cell_matches_torch():
    """Our fused-scan LSTM layer must equal torch.nn.LSTM given same weights."""
    import torch

    b, t, c, h = 2, 7, 5, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, t, c)).astype(np.float32)

    cell = LSTMCellFused(hidden_dim=h)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x))
    wx = np.asarray(variables["params"]["wx"])  # (c, 4h) order i,f,g,o
    wh = np.asarray(variables["params"]["wh"])  # (h, 4h)
    bias = np.asarray(variables["params"]["bias"])  # (4h,)
    ours = np.asarray(cell.apply(variables, jnp.asarray(x)))

    # torch gate order: i, f, g, o — same as ours; weights are (4h, in).
    lstm = torch.nn.LSTM(input_size=c, hidden_size=h, num_layers=1, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.tensor(wx.T))
        lstm.weight_hh_l0.copy_(torch.tensor(wh.T))
        lstm.bias_ih_l0.copy_(torch.tensor(bias))
        lstm.bias_hh_l0.zero_()
        theirs, _ = lstm(torch.tensor(x))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-6)


def test_bilstm_matches_torch_bidirectional():
    import torch

    b, t, c, h = 2, 6, 3, 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    bi = BiLSTM(hidden_dim=h, num_layers=1)
    variables = bi.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]
    ours = np.asarray(bi.apply(variables, jnp.asarray(x)))

    lstm = torch.nn.LSTM(c, h, num_layers=1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(p["fwd_0"]["wx"]).T))
        lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(p["fwd_0"]["wh"]).T))
        lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(p["fwd_0"]["bias"])))
        lstm.bias_hh_l0.zero_()
        lstm.weight_ih_l0_reverse.copy_(torch.tensor(np.asarray(p["bwd_0"]["wx"]).T))
        lstm.weight_hh_l0_reverse.copy_(torch.tensor(np.asarray(p["bwd_0"]["wh"]).T))
        lstm.bias_ih_l0_reverse.copy_(torch.tensor(np.asarray(p["bwd_0"]["bias"])))
        lstm.bias_hh_l0_reverse.zero_()
        theirs, _ = lstm(torch.tensor(x))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-6)


def test_length_masking_invariant_to_padding():
    """With lengths given, trailing padding must not change the logits."""
    model = CNNLSTM(input_dim=8, cnn_out_channels=4, lstm_hidden_dim=4)
    rng = np.random.default_rng(2)
    x_short = rng.normal(size=(1, 12, 8)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_short), train=False)
    x_padded = np.concatenate([x_short, 100.0 * np.ones((1, 12, 8), np.float32)], axis=1)
    lengths = jnp.asarray([12])
    out_short = model.apply(
        variables, jnp.asarray(x_short), train=False, lengths=lengths
    )
    out_padded = model.apply(
        variables, jnp.asarray(x_padded), train=False, lengths=lengths
    )
    np.testing.assert_allclose(
        np.asarray(out_short), np.asarray(out_padded), atol=1e-4
    )


def test_stability_probe_shape():
    model = CNNLSTM(input_dim=24, cnn_out_channels=8, lstm_hidden_dim=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 24)), train=False)
    v = stability_probe(variables)
    assert v.shape == (24,)
    assert bool(jnp.all(v >= 0))
