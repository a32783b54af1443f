"""Decompose the flagship CNN-LSTM inference wall (VERDICT r4 item 7).

Measures, at the driver-bench workload (batch 128, 4480×768 sequences,
cnn=128 / lstm=128 — BASELINE.json config 4):

* the full forward (same program as bench.py via benchmarks.flagship);
* the conv front end alone (res_block1 → pool → res_block2);
* the 2-layer grouped biLSTM alone (gate matmuls + Pallas recurrence);
* the bare Pallas recurrence kernel per layer (no gate matmuls);
* attention pooling + head alone;

each as its own jitted program, median of ``reps`` device-synchronized
calls. The sum of parts exceeds the fused full-forward wall (XLA fuses
boundaries the parts can't), so shares are reported against the parts sum.

Also derives the recurrence *serial floor*: with T_pool sequential steps/
layer × 2 layers and a measured per-step latency, the floor is what no
amount of batching removes — the honest ceiling for this model's MFU.

Run: ``python -m benchmarks.profile_cnn_lstm [--batch 128]``
Writes ``cnn_lstm_profile`` into benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.flagship import DIM, PAD_LEN, SEQ_LEN  # noqa: E402


def _median_wall(fn, *args, reps: int = 5) -> float:
    """Median wall of ``fn(*args)`` with a forced device round trip.

    On the tunneled chip a bare ``block_until_ready`` has been observed to
    return before execution completes (see bench.py), so ``fn`` must return
    a SCALAR (callers reduce inside the jitted program) and the timer reads
    it back to host — a 4-byte fetch that can't distort the measurement."""
    float(np.asarray(fn(*args)))  # compile + execute once
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def profile(batch: int, reps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.models import CNNLSTM
    from robust_speech_analysis_framework_tpu.models.cnn_lstm import (
        BiLSTM, ResidualBlock, AttentionPooling,
    )
    from robust_speech_analysis_framework_tpu.ops.pallas.lstm import (
        lstm_scan_pallas_grouped, lstm_scan_reference_grouped,
        pallas_available,
    )
    from flax import linen as nn

    H, C = 128, 128
    model = CNNLSTM(input_dim=DIM, cnn_out_channels=C, lstm_hidden_dim=H)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, PAD_LEN, DIM)),
        jnp.float32,
    )
    lengths = jnp.full((batch,), SEQ_LEN, jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 256, DIM)), train=False)
    )(rng)

    full = jax.jit(
        lambda v, a, l: model.apply(v, a, train=False, lengths=l).sum()
    )
    out = {"batch": batch, "pad_len": PAD_LEN,
           "pallas_dispatched": bool(pallas_available())}
    out["full_forward_s"] = _median_wall(full, variables, x, lengths, reps=reps)

    # --- conv front end: res1 → pool → res2 (same params) -----------------
    p = variables["params"]
    bs = variables["batch_stats"]

    def conv_front(x):
        h = ResidualBlock(C, name="res_block1").apply(
            {"params": p["res_block1"],
             "batch_stats": bs["res_block1"]}, x, train=False)
        h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        return ResidualBlock(C, name="res_block2").apply(
            {"params": p["res_block2"],
             "batch_stats": bs["res_block2"]}, h, train=False)

    cf = jax.jit(conv_front)
    out["conv_front_s"] = _median_wall(jax.jit(lambda a: conv_front(a).sum()),
                                       x, reps=reps)
    h_conv = cf(x)
    float(np.asarray(h_conv.sum()))

    # --- biLSTM (2 layers incl. gate matmuls) ------------------------------
    def lstm_only(h):
        return BiLSTM(H, num_layers=2, name="lstm").apply(
            {"params": p["lstm"]}, h, train=False)

    lf = jax.jit(lstm_only)
    out["bilstm_s"] = _median_wall(jax.jit(lambda a: lstm_only(a).sum()),
                                   h_conv, reps=reps)
    h_lstm = lf(h_conv)
    float(np.asarray(h_lstm.sum()))

    # --- attention pooling + dropout(id) + fc ------------------------------
    def head(h):
        pooled = AttentionPooling(name="attention_pooling").apply(
            {"params": p["attention_pooling"]}, h)
        return pooled @ p["fc"]["kernel"] + p["fc"]["bias"]

    out["attention_head_s"] = _median_wall(
        jax.jit(lambda a: head(a).sum()), h_lstm, reps=reps
    )

    # --- bare recurrence kernel (one layer, both directions grouped) -------
    t_pool = PAD_LEN // 2
    gates = jnp.asarray(
        np.random.default_rng(1).normal(size=(t_pool, 2, batch, 4 * H)) * 0.1,
        jnp.float32,
    )
    wh = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, H, 4 * H)) * 0.05, jnp.float32
    )
    rec_raw = (lstm_scan_pallas_grouped if pallas_available()
               else lstm_scan_reference_grouped)
    rec = jax.jit(lambda g, w: rec_raw(g, w).sum())
    out["recurrence_layer_s"] = _median_wall(rec, gates, wh, reps=reps)
    out["recurrence_2layers_s"] = 2 * out["recurrence_layer_s"]
    out["per_step_us"] = out["recurrence_layer_s"] / t_pool * 1e6

    parts = (out["conv_front_s"] + out["bilstm_s"] + out["attention_head_s"])
    out["parts_sum_s"] = parts
    out["share_conv"] = out["conv_front_s"] / parts
    out["share_bilstm"] = out["bilstm_s"] / parts
    out["share_attention"] = out["attention_head_s"] / parts
    # gate matmuls = biLSTM minus bare recurrence (both layers)
    out["share_recurrence_of_bilstm"] = (
        out["recurrence_2layers_s"] / out["bilstm_s"]
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-merge", action="store_true")
    args = ap.parse_args()
    result = profile(args.batch, args.reps)
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in result.items()}, indent=1))
    if args.no_merge:
        return
    path = os.path.join(REPO, "benchmarks", "results.json")
    try:
        with open(path) as fh:
            results = json.load(fh)
    except Exception:
        results = {}
    results["cnn_lstm_profile"] = result
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"merged into {path}")


if __name__ == "__main__":
    main()
