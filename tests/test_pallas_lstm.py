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


def test_recurrence_wrappers_grad_on_cpu():
    """custom_vjp wrappers must be differentiable and match direct scan grads."""
    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
        lstm_recurrence,
        lstm_recurrence_grouped,
        lstm_scan_reference,
        lstm_scan_reference_grouped,
    )

    rng = np.random.default_rng(3)
    gates = jnp.asarray(rng.normal(size=(12, 2, 16)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32) * 0.1)

    def loss_w(f):
        return lambda g, w: jnp.sum(f(g, w) ** 2)

    g1 = jax.grad(loss_w(lstm_recurrence), argnums=(0, 1))(gates, wh)
    g2 = jax.grad(loss_w(lstm_scan_reference), argnums=(0, 1))(gates, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    gates_g = jnp.stack([gates, gates * 0.5], axis=1)  # (T, 2, B, 4H)
    wh_g = jnp.stack([wh, wh * 2.0], axis=0)
    h1 = jax.grad(loss_w(lstm_recurrence_grouped), argnums=(0, 1))(gates_g, wh_g)
    h2 = jax.grad(loss_w(lstm_scan_reference_grouped), argnums=(0, 1))(gates_g, wh_g)
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(not pallas_available(), reason="needs TPU backend")
def test_recurrence_grad_through_pallas_forward():
    """On TPU the custom_vjp pairs the Pallas forward with scan-replay
    backward; gradients must equal the all-scan implementation."""
    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
        lstm_recurrence,
        lstm_scan_reference,
    )

    rng = np.random.default_rng(4)
    gates = jnp.asarray(rng.normal(size=(160, 8, 512)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.normal(size=(128, 512)).astype(np.float32) * 0.1)

    def loss(f):
        return lambda g, w: jnp.sum(f(g, w) ** 2)

    g1 = jax.grad(loss(lstm_recurrence), argnums=(0, 1))(gates, wh)
    g2 = jax.grad(loss(lstm_scan_reference), argnums=(0, 1))(gates, wh)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_backward_kernel_interpret_mode():
    """Forward-residual + reverse-sweep kernels vs jax.vjp of the scan
    (interpret mode; grad parity <=1e-5, VERDICT r1 item 8)."""
    from robust_speech_analysis_framework_tpu.ops.pallas import lstm as L

    rng = np.random.default_rng(3)
    t, g, b, h = 40, 2, 4, 16
    gates = jnp.asarray(rng.normal(size=(t, g, b, 4 * h)).astype(np.float32) * 0.4)
    wh = jnp.asarray(rng.normal(size=(g, h, 4 * h)).astype(np.float32) * 0.1)
    dhout = jnp.asarray(rng.normal(size=(t, g, b, h)).astype(np.float32))

    hs, cs = L._lstm_fwd_res_pallas(gates, wh, 16, True)
    ref_hs = L.lstm_scan_reference_grouped(gates, wh)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(ref_hs), atol=1e-6)

    dgates, dwh = L._lstm_bwd_pallas(gates, hs, cs, wh, dhout, 16, True)
    _, vjp = jax.vjp(L.lstm_scan_reference_grouped, gates, wh)
    ref_dg, ref_dwh = vjp(dhout)
    np.testing.assert_allclose(np.asarray(dgates), np.asarray(ref_dg),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dwh), np.asarray(ref_dwh),
                               atol=1e-4, rtol=1e-4)


def test_pallas_backward_kernel_interpret_unaligned_t():
    """T not a block multiple: zero-padded tail must not leak into grads."""
    from robust_speech_analysis_framework_tpu.ops.pallas import lstm as L

    rng = np.random.default_rng(4)
    t, g, b, h = 23, 1, 4, 8
    gates = jnp.asarray(rng.normal(size=(t, g, b, 4 * h)).astype(np.float32) * 0.4)
    wh = jnp.asarray(rng.normal(size=(g, h, 4 * h)).astype(np.float32) * 0.1)
    dhout = jnp.asarray(rng.normal(size=(t, g, b, h)).astype(np.float32))

    hs, cs = L._lstm_fwd_res_pallas(gates, wh, 16, True)
    dgates, dwh = L._lstm_bwd_pallas(gates, hs, cs, wh, dhout, 16, True)
    _, vjp = jax.vjp(L.lstm_scan_reference_grouped, gates, wh)
    ref_dg, ref_dwh = vjp(dhout)
    np.testing.assert_allclose(np.asarray(dgates), np.asarray(ref_dg),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dwh), np.asarray(ref_dwh),
                               atol=1e-4, rtol=1e-4)
