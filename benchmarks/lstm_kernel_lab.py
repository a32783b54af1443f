"""LSTM recurrence kernel variants — per-step latency experiments.

The flagship inference profile (benchmarks/profile_cnn_lstm.py) shows the
grouped Pallas recurrence running at ~10µs+ per sequential step largely
independent of batch size — per-step *latency*, not arithmetic, is the
floor. Each variant below attacks that latency; the lab measures them
against the production kernel at bench shapes and checks numerics against
the lax.scan oracle. Winners get ported into ops/pallas/lstm.py.

Variants:
  v0  production grouped kernel (ops/pallas/lstm.py)
  v1  block-diagonal recurrent matmul: both directions' (B,H)@(H,4H) fused
      into one (B,2H)@(2H,8H) against a block-diagonal Wh — one MXU issue
      per step instead of two + a stack
  v2  v1 + fori_loop unroll (amortize loop-control overhead, give Mosaic
      a longer straight-line schedule to software-pipeline)

Run: ``python -m benchmarks.lstm_kernel_lab [--batch 128] [--t 2240]``
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.append(".")


def _median_wall(fn, *args, reps: int = 5) -> float:
    float(np.asarray(fn(*args)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _kernel_blockdiag(gates_ref, whb_ref, out_ref, h_ref, c_ref, *,
                      block_t: int, groups: int, unroll: int):
    """v1/v2: gates (block_t, B, G*4H) laid out group-major in the last dim;
    whb is the (G*H, G*4H) block-diagonal recurrent matrix; state h/c are
    (B, G*H). One MXU matmul advances every group."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    whb = whb_ref[:]
    gh = h_ref.shape[-1]  # G*H
    hdim = gh // groups

    def step(t, carry):
        h, c = carry  # (B, G*H) f32
        z = gates_ref[t].astype(jnp.float32) + jnp.dot(
            h, whb, preferred_element_type=jnp.float32
        )
        # z is (B, G*4H) group-major: [g0_i g0_f g0_g g0_o g1_i ...]
        zb = z.reshape(z.shape[0], groups, 4, hdim)
        i = jax.nn.sigmoid(zb[:, :, 0])
        f = jax.nn.sigmoid(zb[:, :, 1])
        g_ = jnp.tanh(zb[:, :, 2])
        o = jax.nn.sigmoid(zb[:, :, 3])
        cb = c.reshape(c.shape[0], groups, hdim)
        c_new = f * cb + i * g_
        h_new = (o * jnp.tanh(c_new)).reshape(h.shape)
        out_ref[t] = h_new.astype(out_ref.dtype)
        return h_new, c_new.reshape(c.shape)

    h, c = jax.lax.fori_loop(
        0, block_t, step, (h_ref[:], c_ref[:]), unroll=unroll
    )
    h_ref[:] = h
    c_ref[:] = c


def lstm_blockdiag(gates, wh, block_t: int = 128, unroll=1,
                   gate_dtype=None):
    """gates (T, G, B, 4H) + wh (G, H, 4H) → (T, G, B, H), via the
    block-diagonal single-matmul kernel. ``gate_dtype=jnp.bfloat16``
    streams the gate inputs (and h outputs) in bf16 — halves the VMEM
    pipeline traffic and doubles the feasible time block; state and the
    recurrent matmul stay f32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
        _auto_block_t,
    )

    t, g, b, four_h = gates.shape
    h_dim = four_h // 4
    if gate_dtype is not None:
        gates = gates.astype(gate_dtype)
    esize = jnp.dtype(gates.dtype).itemsize
    block_t = _auto_block_t(g * b * (four_h + h_dim) * esize, block_t)
    if unroll == "full":  # Mosaic supports only unroll=1 or num_steps
        unroll = block_t

    # lay gates out (T, B, G*4H) group-major
    gflat = jnp.swapaxes(gates, 1, 2).reshape(t, b, g * four_h)
    # block-diagonal Wh: (G*H, G*4H)
    whb = jnp.zeros((g * h_dim, g * four_h), wh.dtype)
    for gi in range(g):
        whb = whb.at[gi * h_dim:(gi + 1) * h_dim,
                     gi * four_h:(gi + 1) * four_h].set(wh[gi])

    t_pad = -(-t // block_t) * block_t
    if t_pad != t:
        gflat = jnp.pad(gflat, ((0, t_pad - t), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_blockdiag, block_t=block_t, groups=g,
                          unroll=unroll),
        grid=(t_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, b, g * four_h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * h_dim, g * four_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, b, g * h_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, b, g * h_dim), gates.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, g * h_dim), jnp.float32),
            pltpu.VMEM((b, g * h_dim), jnp.float32),
        ],
    )(gflat, whb)
    # (T, B, G*H) group-major → (T, G, B, H), f32 hand-back
    out = out[:t].reshape(t, b, g, h_dim).astype(jnp.float32)
    return jnp.swapaxes(out, 1, 2)


def main():
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
        lstm_scan_pallas_grouped, lstm_scan_reference_grouped,
        pallas_available,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=2240)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B, T, H, G = args.batch, args.t, args.h, 2

    rng = np.random.default_rng(0)
    gates = jnp.asarray(rng.normal(size=(T, G, B, 4 * H)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.normal(size=(G, H, 4 * H)) * 0.05, jnp.float32)

    oracle = np.asarray(jax.jit(lstm_scan_reference_grouped)(gates, wh))
    results = {}

    def check_and_time(name, fn):
        got = np.asarray(fn(gates, wh))
        err = float(np.max(np.abs(got - oracle)))
        wall = _median_wall(
            jax.jit(lambda g, w: fn(g, w).sum()), gates, wh, reps=args.reps
        )
        results[name] = {"max_abs_err": err, "wall_s": wall,
                         "per_step_us": wall / T * 1e6}
        print(f"{name}: wall {wall*1e3:.2f} ms  per-step "
              f"{wall / T * 1e6:.2f} us  max|err| {err:.2e}")

    if pallas_available():
        check_and_time("v0_production", lstm_scan_pallas_grouped)
    check_and_time("v1_blockdiag", jax.jit(lstm_blockdiag))
    check_and_time(
        "v2_blockdiag_fullunroll",
        jax.jit(functools.partial(lstm_blockdiag, unroll="full")),
    )
    import jax.numpy as _jnp
    check_and_time(
        "v3_blockdiag_bf16gates",
        jax.jit(functools.partial(lstm_blockdiag, gate_dtype=_jnp.bfloat16)),
    )
    check_and_time(
        "v4_blockdiag_bf16_fullunroll",
        jax.jit(functools.partial(lstm_blockdiag, unroll="full",
                                  gate_dtype=_jnp.bfloat16)),
    )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
