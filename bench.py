"""Headline benchmark: CNN-LSTM inference throughput on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors BASELINE.json config 4 (CNN-LSTM inference on Wav2Vec2
sequences with attention pooling): batch of 8 reference-shaped sequences
(4378×768, the corpus example '01_CF56_1.wav'), flagship architecture
(cnn=128, lstm=128). Value = audio-seconds of input processed per wall-clock
second on one chip; vs_baseline = ratio over the stored torch-CPU
measurement of the reference architecture (benchmarks/baselines.json,
regenerate with ``python -m benchmarks.torch_baseline``).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRAMES_PER_SECOND = 49.9
SEQ_LEN = 4378
PAD_LEN = 4480  # padded to a multiple of 128 frames for clean tiling
DIM = 768
BATCH = 128
REPS = 5


def _backend_alive(timeout_s: float = 240.0) -> bool:
    """Probe the device backend in a SUBPROCESS with a hard deadline.

    The tunneled TPU backend can wedge so hard that even ``jax.devices()``
    blocks forever (observed: multi-hour outages); without this probe a
    driver-run bench hangs instead of failing. A healthy backend completes
    the tiny matmul (including first-compile) well inside the deadline."""
    import subprocess

    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print(float(np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _backend_alive():
        print(
            "bench.py: device backend unresponsive (probe matmul did not "
            "complete in 240 s) — refusing to hang. Re-run when the "
            "TPU tunnel recovers.",
            file=sys.stderr,
        )
        return 1

    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.models import CNNLSTM

    model = CNNLSTM(input_dim=DIM, cnn_out_channels=128, lstm_hidden_dim=128)
    rng = jax.random.PRNGKey(0)
    x_host = np.random.default_rng(0).normal(size=(BATCH, PAD_LEN, DIM)).astype(np.float32)
    x = jnp.asarray(x_host)
    lengths = jnp.full((BATCH,), SEQ_LEN, jnp.int32)
    variables = model.init(rng, x[:1, :256], train=False)

    @jax.jit
    def forward(variables, x, lengths):
        return model.apply(variables, x, train=False, lengths=lengths)

    np.asarray(forward(variables, x, lengths))  # compile + full round trip
    times = []
    for i in range(REPS):
        # Perturb the input so no layer of caching can short-circuit the run,
        # and read the result back to host — on the remote-tunneled chip a
        # bare block_until_ready returns before execution completes.
        xi = x + jnp.float32(i * 1e-6)
        t0 = time.perf_counter()
        np.asarray(forward(variables, xi, lengths))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = BATCH * SEQ_LEN / FRAMES_PER_SECOND
    value = audio_sec / p50

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "baselines.json"
    )
    vs_baseline = float("nan")
    try:
        with open(baseline_path) as fh:
            base = json.load(fh)["cnn_lstm_infer"]["audio_sec_per_sec"]
        vs_baseline = value / base
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "cnn_lstm_infer_audio_sec_per_sec",
                "value": round(value, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main() or 0)
