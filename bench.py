"""Headline benchmark: CNN-LSTM inference throughput on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors BASELINE.json config 4 (CNN-LSTM inference on Wav2Vec2
sequences with attention pooling): batch of reference-shaped sequences
(4378×768, the corpus example '01_CF56_1.wav'), flagship architecture
(cnn=128, lstm=128). Value = audio-seconds of input processed per wall-clock
second on one chip; vs_baseline = ratio over the stored torch-CPU
measurement of the reference architecture (benchmarks/baselines.json,
regenerate with ``python -m benchmarks.torch_baseline``).

Resilience: the tunneled TPU backend has wedged for hours at a time
(BENCH_r02.json recorded rc=1 from a single failed probe), so this harness
(a) probes with retries + backoff, (b) falls back to a reduced-size
measurement, and (c) on persistent device failure emits the last committed
``benchmarks/results.json`` number marked ``"stale": true`` with rc=0 —
a bad tunnel window degrades the evidence, it no longer erases it.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from benchmarks.flagship import DIM, FRAMES_PER_SECOND, PAD_LEN, SEQ_LEN  # noqa: E402


def _probe_alive() -> bool:
    """Probe the device backend in a SUBPROCESS with retries + backoff.

    The tunneled TPU backend can wedge so hard that even ``jax.devices()``
    blocks forever (observed: multi-hour outages); without this probe a
    driver-run bench hangs instead of failing. A healthy backend completes
    the tiny matmul (including first-compile) well inside each deadline."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print(float(np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))"
    )
    for timeout_s, backoff_s in ((90.0, 10.0), (120.0, 30.0), (240.0, 0.0)):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(
            f"bench.py: probe failed (deadline {timeout_s:.0f}s); "
            f"retrying in {backoff_s:.0f}s",
            file=sys.stderr,
        )
        time.sleep(backoff_s)
    return False


def _measure(batch: int, reps: int) -> dict:
    """The actual measurement — runs inside a deadline-guarded subprocess.

    The forward program comes from ``benchmarks.flagship.build_forward``:
    backed by a disk ``jax.export`` artifact (skips Python tracing in this
    fresh process) and byte-identical to the suite's program (shares its
    persistent-XLA-cache entry), so a healthy run pays only deserialize +
    cache-hit compile + one execution — well inside the deadline even in a
    slow device window (round-4 VERDICT item 6)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.flagship import build_forward

    forward, variables, lengths = build_forward(batch)
    # generate the input ON DEVICE: the batch-128 buffer is 1.76 GB — a
    # host upload costs ~45 s of the deadline over the tunnel and measures
    # nothing (the timed loop perturbs on device anyway)
    x = jax.jit(
        lambda k: jax.random.normal(k, (batch, PAD_LEN, DIM), jnp.float32)
    )(jax.random.PRNGKey(0))

    np.asarray(forward(variables, x, lengths))  # compile + full round trip
    times = []
    for i in range(reps):
        # Perturb the input so no layer of caching can short-circuit the run,
        # and read the result back to host — on the remote-tunneled chip a
        # bare block_until_ready returns before execution completes.
        xi = x + jnp.float32(i * 1e-6)
        t0 = time.perf_counter()
        np.asarray(forward(variables, xi, lengths))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = batch * SEQ_LEN / FRAMES_PER_SECOND
    return {"value": audio_sec / p50,
            "repeats": [round(audio_sec / t, 2) for t in times]}


def _emit(value: float, stale: bool = False, batch: int = None,
          repeats=None) -> None:
    baseline_path = os.path.join(REPO, "benchmarks", "baselines.json")
    vs_baseline = float("nan")
    try:
        with open(baseline_path) as fh:
            base = json.load(fh)["cnn_lstm_infer"]["audio_sec_per_sec"]
        vs_baseline = value / base
    except Exception:
        pass
    out = {
        "metric": "cnn_lstm_infer_audio_sec_per_sec",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    if stale:
        out["stale"] = True
    if repeats:
        # per-rep throughputs: round-over-round drift (e.g. the unannotated
        # 155k→127k swing of round 4) is attributable at a glance — a tight
        # spread is a real change, a wide one is tunnel noise
        out["repeats"] = repeats
    if batch is not None and batch != 128:
        # reduced-size fallback measurement: make it distinguishable from
        # the full batch-128 run in the recorded JSON
        out["batch"] = batch
        out["reduced"] = True
    print(json.dumps(out))


def _run_measurement(batch: int, reps: int, timeout_s: float):
    """Run one measurement attempt in a subprocess with a hard deadline;
    returns the measured value or None. The parent never touches the device,
    so a wedged backend kills only the attempt."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_measure",
             str(batch), str(reps)],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench.py: measurement (batch={batch}) exceeded {timeout_s:.0f}s",
            file=sys.stderr,
        )
        return None
    if r.returncode != 0:
        print(
            f"bench.py: measurement (batch={batch}) failed rc={r.returncode}:\n"
            + (r.stderr or "")[-2000:],
            file=sys.stderr,
        )
        return None
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        print(
            f"bench.py: unparseable measurement output: {r.stdout[-500:]!r}",
            file=sys.stderr,
        )
        return None


def _stale_fallback() -> int:
    """Emit the last committed results.json number marked stale (rc=0)."""
    try:
        with open(os.path.join(REPO, "benchmarks", "results.json")) as fh:
            value = float(json.load(fh)["cnn_lstm_infer"]["audio_sec_per_sec"])
    except Exception:
        print(
            "bench.py: device unreachable and no committed results.json to "
            "fall back on.",
            file=sys.stderr,
        )
        return 1
    print(
        "bench.py: device backend unresponsive — emitting last committed "
        "benchmarks/results.json measurement marked stale.",
        file=sys.stderr,
    )
    _emit(value, stale=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--_measure":
        print(json.dumps(_measure(int(sys.argv[2]), int(sys.argv[3]))))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--export":
        # pre-trace/export + pre-compile the measurement program so later
        # fresh-process runs (the driver's) skip both costs; run after any
        # model-source change (the suite also does this at the end of its
        # cnn_lstm stage)
        from benchmarks.flagship import export_artifact

        export_artifact(batch=128)
        print("exported flagship forward (batch=128)")
        return 0

    if _probe_alive():
        res = _run_measurement(batch=128, reps=5, timeout_s=480.0)
        if res is not None:
            _emit(res["value"], repeats=res.get("repeats"))
            return 0
        # reduced-size fallback: smaller compile + upload — emitted with
        # "reduced": true so it cannot be recorded as a full batch-128 run
        res = _run_measurement(batch=16, reps=3, timeout_s=300.0)
        if res is not None:
            _emit(res["value"], batch=16, repeats=res.get("repeats"))
            return 0
    return _stale_fallback()


if __name__ == "__main__":
    sys.exit(main())
