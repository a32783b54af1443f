"""Pallas TPU kernel: full-sequence LSTM recurrence.

The CNN-LSTM's biLSTM is the latency-critical op of the flagship model
(SURVEY.md §7.3: sequential over T). The input projections
``x @ Wx + b`` for all gates/timesteps are one large MXU matmul outside the
kernel; what remains is the strictly sequential part,

    z_t = g_t + h_{t−1} @ Wh;   (i,f,g,o) = split(z_t);   c,h update,

which this kernel runs entirely on-chip: the recurrent weights and the
(h, c) state live in VMEM scratch for the whole sequence, the precomputed
gate inputs stream in per time-block through the sequential TPU grid
(block t arrives while block t−1 computes — the implicit double-buffering of
the Pallas pipeline), and only the h outputs stream back to HBM. This
removes the per-step HBM round trips of the stock ``lax.scan`` lowering.

Shapes: gates (T, B, 4H), wh (H, 4H) → hs (T, B, H). T must be a multiple
of the time-block; callers pad (padded tail steps compute garbage that
callers discard — state freezing for ragged batches is handled by the
caller's masking, as in models/cnn_lstm.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def pallas_available() -> bool:
    """Pallas TPU lowering available on the current default backend?"""
    return jax.default_backend() == "tpu"


_VMEM_BUDGET_BYTES = 10 * 1024 * 1024  # leave headroom under the 16 MB core VMEM


def _auto_block_t(per_step_bytes: int, requested: int) -> int:
    """Largest power-of-two time block whose double-buffered pipeline fits
    the VMEM budget (input+output blocks are double-buffered by Pallas)."""
    block = requested
    while block > 8 and 2 * block * per_step_bytes > _VMEM_BUDGET_BYTES:
        block //= 2
    return max(block, 8)


def _kernel(gates_ref, wh_ref, out_ref, h_ref, c_ref, *, block_t: int):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    wh = wh_ref[:]

    def step(t, carry):
        h, c = carry
        z = gates_ref[t] + jnp.dot(
            h, wh, preferred_element_type=jnp.float32
        )
        hdim = h.shape[-1]
        i = jax.nn.sigmoid(z[:, :hdim])
        f = jax.nn.sigmoid(z[:, hdim : 2 * hdim])
        g = jnp.tanh(z[:, 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[:, 3 * hdim :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        out_ref[t] = h_new
        return h_new, c_new

    h, c = jax.lax.fori_loop(0, block_t, step, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


@partial(jax.jit, static_argnums=(2,))
def lstm_scan_pallas(
    gates: jnp.ndarray, wh: jnp.ndarray, block_t: int = 128
) -> jnp.ndarray:
    """Run the LSTM recurrence with the Pallas kernel.

    gates: (T, B, 4H) precomputed x-projections (+bias); wh: (H, 4H).
    Returns hs (T, B, H). T is padded internally to a block multiple.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, b, four_h = gates.shape
    h_dim = four_h // 4
    block_t = _auto_block_t(b * (four_h + h_dim) * 4, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        gates = jnp.pad(gates, ((0, t_pad - t), (0, 0), (0, 0)))

    grid = (t_pad // block_t,)
    out = pl.pallas_call(
        partial(_kernel, block_t=block_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_t, b, four_h), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((h_dim, four_h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, b, h_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, h_dim), gates.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
    )(gates, wh)
    return out[:t]


def lstm_scan_reference(gates: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    """lax.scan twin of the kernel, for parity tests and CPU execution."""

    def step(carry, gx):
        h, c = carry
        z = gx + h @ wh
        hdim = h.shape[-1]
        i = jax.nn.sigmoid(z[:, :hdim])
        f = jax.nn.sigmoid(z[:, hdim : 2 * hdim])
        g = jnp.tanh(z[:, 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[:, 3 * hdim :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    b = gates.shape[1]
    h_dim = gates.shape[2] // 4
    init = (jnp.zeros((b, h_dim), gates.dtype), jnp.zeros((b, h_dim), gates.dtype))
    _, hs = jax.lax.scan(step, init, gates)
    return hs


def _kernel_grouped(gates_ref, wh_ref, out_ref, h_ref, c_ref, *, block_t: int,
                    groups: int):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    wh = wh_ref[:]  # (G, H, 4H)

    def step(t, carry):
        h, c = carry  # (G, B, H) each
        gx = gates_ref[t]  # (G, B, 4H)
        # Per-group recurrent matmul, statically unrolled (G is tiny).
        z_parts = [
            jnp.dot(h[g], wh[g], preferred_element_type=jnp.float32)
            for g in range(groups)
        ]
        z = gx + jnp.stack(z_parts, axis=0)
        hdim = h.shape[-1]
        i = jax.nn.sigmoid(z[..., :hdim])
        f = jax.nn.sigmoid(z[..., hdim : 2 * hdim])
        g_ = jnp.tanh(z[..., 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[..., 3 * hdim :])
        c_new = f * c + i * g_
        h_new = o * jnp.tanh(c_new)
        out_ref[t] = h_new
        return h_new, c_new

    h, c = jax.lax.fori_loop(0, block_t, step, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


@partial(jax.jit, static_argnums=(2,))
def lstm_scan_pallas_grouped(
    gates: jnp.ndarray, wh: jnp.ndarray, block_t: int = 128
) -> jnp.ndarray:
    """Multi-direction LSTM recurrence in one kernel.

    gates: (T, G, B, 4H) — G independent recurrences (e.g. the forward and
    time-reversed directions of a biLSTM layer) advance in lockstep through
    one sequential pipeline; wh: (G, H, 4H). Returns (T, G, B, H).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, g, b, four_h = gates.shape
    h_dim = four_h // 4
    block_t = _auto_block_t(g * b * (four_h + h_dim) * 4, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        gates = jnp.pad(gates, ((0, t_pad - t), (0, 0), (0, 0), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel_grouped, block_t=block_t, groups=g),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec(
                (block_t, g, b, four_h), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((g, h_dim, four_h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, g, b, h_dim), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, g, b, h_dim), gates.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, b, h_dim), jnp.float32),
            pltpu.VMEM((g, b, h_dim), jnp.float32),
        ],
    )(gates, wh)
    return out[:t]


def lstm_scan_reference_grouped(gates: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    """Grouped twin of :func:`lstm_scan_reference`: (T,G,B,4H)+(G,H,4H)→(T,G,B,H)."""
    outs = [
        lstm_scan_reference(gates[:, g], wh[g]) for g in range(gates.shape[1])
    ]
    return jnp.stack(outs, axis=1)


# --- training kernels: forward-with-residuals + reverse backward sweep ------


def _kernel_fwd_res(gates_ref, wh_ref, out_h_ref, out_c_ref, h_ref, c_ref, *,
                    block_t: int, groups: int):
    """Forward recurrence that ALSO streams the cell states to HBM — the
    residuals the backward sweep needs (h is already an output)."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    wh = wh_ref[:]

    def step(t, carry):
        h, c = carry  # (G, B, H)
        z_parts = [
            jnp.dot(h[g], wh[g], preferred_element_type=jnp.float32)
            for g in range(groups)
        ]
        z = gates_ref[t] + jnp.stack(z_parts, axis=0)
        hdim = h.shape[-1]
        i = jax.nn.sigmoid(z[..., :hdim])
        f = jax.nn.sigmoid(z[..., hdim : 2 * hdim])
        g_ = jnp.tanh(z[..., 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[..., 3 * hdim :])
        c_new = f * c + i * g_
        h_new = o * jnp.tanh(c_new)
        out_h_ref[t] = h_new
        out_c_ref[t] = c_new
        return h_new, c_new

    h, c = jax.lax.fori_loop(0, block_t, step, (h_ref[:], c_ref[:]))
    h_ref[:] = h
    c_ref[:] = c


def _kernel_bwd(gates_ref, hprev_ref, cprev_ref, c_ref, dhout_ref, wh_ref,
                dg_ref, dwh_ref, dh_s, dc_s, dwh_s, *, block_t: int,
                groups: int):
    """Reverse LSTM sweep, entirely on-chip (VERDICT r1 item 8).

    Streams time blocks in DESCENDING order (the wrapper's index maps
    reverse the grid); gate activations are recomputed from the saved
    inputs and h states (one extra (B,H)@(H,4H) matmul per step — cheaper
    than streaming (T,B,4H) activations through HBM). Carries dh/dc and
    the dWh accumulator in VMEM scratch across the whole sequence; emits
    dgates per block and dWh once.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dwh_s[:] = jnp.zeros_like(dwh_s)

    wh = wh_ref[:]  # (G, H, 4H)

    def step(k, carry):
        t = block_t - 1 - k
        dh, dc, dwh = carry
        hp = hprev_ref[t]  # (G, B, H)
        z_parts = [
            jnp.dot(hp[g], wh[g], preferred_element_type=jnp.float32)
            for g in range(groups)
        ]
        z = gates_ref[t] + jnp.stack(z_parts, axis=0)
        hdim = dh.shape[-1]
        i = jax.nn.sigmoid(z[..., :hdim])
        f = jax.nn.sigmoid(z[..., hdim : 2 * hdim])
        g_ = jnp.tanh(z[..., 2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[..., 3 * hdim :])
        tc = jnp.tanh(c_ref[t])
        dht = dhout_ref[t] + dh
        dct = dc + dht * o * (1.0 - tc * tc)
        dz = jnp.concatenate(
            [
                dct * g_ * i * (1.0 - i),
                dct * cprev_ref[t] * f * (1.0 - f),
                dct * i * (1.0 - g_ * g_),
                dht * tc * o * (1.0 - o),
            ],
            axis=-1,
        )  # (G, B, 4H)
        dg_ref[t] = dz
        dwh_parts = [
            jnp.dot(hp[g].T, dz[g], preferred_element_type=jnp.float32)
            for g in range(groups)
        ]
        dwh = dwh + jnp.stack(dwh_parts, axis=0)
        dh_parts = [
            jnp.dot(dz[g], wh[g].T, preferred_element_type=jnp.float32)
            for g in range(groups)
        ]
        dh = jnp.stack(dh_parts, axis=0)
        dc = dct * f
        return dh, dc, dwh

    dh, dc, dwh = jax.lax.fori_loop(
        0, block_t, step, (dh_s[:], dc_s[:], dwh_s[:])
    )
    dh_s[:] = dh
    dc_s[:] = dc
    dwh_s[:] = dwh
    dwh_ref[:] = dwh  # final block's write is the full-sequence accumulation


@partial(jax.jit, static_argnums=(2, 3))
def _lstm_fwd_res_pallas(gates, wh, block_t: int = 128, interpret: bool = False):
    """(T, G, B, 4H) + (G, H, 4H) → hs, cs (T, G, B, H) each."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, g, b, four_h = gates.shape
    h_dim = four_h // 4
    block_t = _auto_block_t(g * b * (four_h + 2 * h_dim) * 4, block_t)
    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        gates = jnp.pad(gates, ((0, t_pad - t), (0, 0), (0, 0), (0, 0)))

    hs, cs = pl.pallas_call(
        partial(_kernel_fwd_res, block_t=block_t, groups=g),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, g, b, four_h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h_dim, four_h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, g, b, h_dim), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, g, b, h_dim), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, g, b, h_dim), gates.dtype),
            jax.ShapeDtypeStruct((t_pad, g, b, h_dim), gates.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, b, h_dim), jnp.float32),
            pltpu.VMEM((g, b, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(gates, wh)
    return hs[:t], cs[:t]


@partial(jax.jit, static_argnums=(5, 6))
def _lstm_bwd_pallas(gates, hs, cs, wh, dhout, block_t: int = 128,
                     interpret: bool = False):
    """Reverse sweep: returns (dgates (T,G,B,4H), dwh (G,H,4H))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, g, b, four_h = gates.shape
    h_dim = four_h // 4
    # per-step streams: gx + dgates (4H each) + hprev/cprev/c/dhout (H each)
    block_t = _auto_block_t(g * b * (2 * four_h + 4 * h_dim) * 4, block_t)
    t_pad = -(-t // block_t) * block_t
    zpad = ((0, t_pad - t), (0, 0), (0, 0), (0, 0))
    hprev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    cprev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    if t_pad != t:
        gates = jnp.pad(gates, zpad)
        hprev = jnp.pad(hprev, zpad)
        cprev = jnp.pad(cprev, zpad)
        cs = jnp.pad(cs, zpad)
        dhout = jnp.pad(dhout, zpad)

    nb = t_pad // block_t
    rev = lambda i: (nb - 1 - i, 0, 0, 0)  # stream time blocks in reverse
    seq_spec = lambda w: pl.BlockSpec((block_t, g, b, w), rev,
                                      memory_space=pltpu.VMEM)
    dgates, dwh = pl.pallas_call(
        partial(_kernel_bwd, block_t=block_t, groups=g),
        grid=(nb,),
        in_specs=[
            seq_spec(four_h),  # gates
            seq_spec(h_dim),   # hprev
            seq_spec(h_dim),   # cprev
            seq_spec(h_dim),   # c
            seq_spec(h_dim),   # dhout
            pl.BlockSpec((g, h_dim, four_h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            seq_spec(four_h),  # dgates
            pl.BlockSpec((g, h_dim, four_h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, g, b, four_h), gates.dtype),
            jax.ShapeDtypeStruct((g, h_dim, four_h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, b, h_dim), jnp.float32),
            pltpu.VMEM((g, b, h_dim), jnp.float32),
            pltpu.VMEM((g, h_dim, four_h), jnp.float32),
        ],
        interpret=interpret,
    )(gates, hprev, cprev, cs, dhout, wh)
    return dgates[:t], dwh.astype(wh.dtype)


# --- differentiable wrappers -------------------------------------------------
#
# Inference calls hit the forward-only kernels. Under differentiation the
# custom_vjp fwd runs the residual kernel (h AND c streams) and the bwd runs
# the dedicated reverse-sweep kernel; the lax.scan VJP remains the CPU path
# and the parity oracle.


@jax.custom_vjp
def lstm_recurrence(gates: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    if pallas_available():
        return lstm_scan_pallas(gates, wh)
    return lstm_scan_reference(gates, wh)


def _lstm_fwd(gates, wh):
    if pallas_available():
        hs, cs = _lstm_fwd_res_pallas(gates[:, None], wh[None])
        return hs[:, 0], (gates, wh, hs, cs)
    return lstm_scan_reference(gates, wh), (gates, wh, None, None)


def _lstm_bwd(res, g):
    gates, wh, hs, cs = res
    if hs is not None:
        dgates, dwh = _lstm_bwd_pallas(
            gates[:, None], hs, cs, wh[None], g[:, None]
        )
        return dgates[:, 0], dwh[0]
    _, vjp = jax.vjp(lstm_scan_reference, gates, wh)
    return vjp(g)


lstm_recurrence.defvjp(_lstm_fwd, _lstm_bwd)


@jax.custom_vjp
def lstm_recurrence_grouped(gates: jnp.ndarray, wh: jnp.ndarray) -> jnp.ndarray:
    if pallas_available():
        return lstm_scan_pallas_grouped(gates, wh)
    return lstm_scan_reference_grouped(gates, wh)


def _lstm_grouped_fwd(gates, wh):
    if pallas_available():
        hs, cs = _lstm_fwd_res_pallas(gates, wh)
        return hs, (gates, wh, hs, cs)
    return lstm_scan_reference_grouped(gates, wh), (gates, wh, None, None)


def _lstm_grouped_bwd(res, g):
    gates, wh, hs, cs = res
    if hs is not None:
        return _lstm_bwd_pallas(gates, hs, cs, wh, g)
    _, vjp = jax.vjp(lstm_scan_reference_grouped, gates, wh)
    return vjp(g)


lstm_recurrence_grouped.defvjp(_lstm_grouped_fwd, _lstm_grouped_bwd)
