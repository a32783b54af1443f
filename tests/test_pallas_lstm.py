"""Pallas LSTM kernel parity (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
    lstm_scan_reference,
    pallas_available,
)


def test_reference_scan_matches_cell():
    """The kernel's reference twin must match LSTMCellFused (same gate math)."""
    from robust_speech_analysis_framework_tpu.models.cnn_lstm import LSTMCellFused

    rng = np.random.default_rng(0)
    b, t, c, h = 2, 12, 6, 8
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    cell = LSTMCellFused(hidden_dim=h)
    variables = cell.init(jax.random.PRNGKey(0), x)
    out_cell = np.asarray(cell.apply(variables, x))

    p = variables["params"]
    gates = (
        np.asarray(x).reshape(b * t, c) @ np.asarray(p["wx"])
    ).reshape(b, t, 4 * h) + np.asarray(p["bias"])
    hs = lstm_scan_reference(
        jnp.asarray(np.swapaxes(gates, 0, 1)), jnp.asarray(p["wh"])
    )
    np.testing.assert_allclose(out_cell, np.swapaxes(np.asarray(hs), 0, 1), atol=1e-6)


def test_pallas_kernel_interpret_mode():
    """Kernel vs reference scan in Pallas interpret mode (runs on CPU)."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from robust_speech_analysis_framework_tpu.ops.pallas import lstm as L

    rng = np.random.default_rng(1)
    t, b, h = 32, 8, 16
    gates = jnp.asarray(rng.normal(size=(t, b, 4 * h)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.1)

    block_t = 16
    out = pl.pallas_call(
        partial(L._kernel, block_t=block_t),
        grid=(t // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, b, 4 * h), lambda i: (i, 0, 0)),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, b, h), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=True,
    )(gates, wh)
    ref = lstm_scan_reference(gates, wh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.skipif(not pallas_available(), reason="needs TPU backend")
def test_pallas_kernel_compiled():
    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import lstm_scan_pallas

    rng = np.random.default_rng(2)
    gates = jnp.asarray(rng.normal(size=(200, 8, 512)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.normal(size=(128, 512)).astype(np.float32) * 0.1)
    out = np.asarray(lstm_scan_pallas(gates, wh, 128))
    ref = np.asarray(lstm_scan_reference(gates, wh))
    np.testing.assert_allclose(out, ref, atol=1e-5)
