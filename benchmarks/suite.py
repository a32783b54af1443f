"""Full benchmark suite over the BASELINE.json config set.

Measures, on the current JAX backend (TPU when available):

1. MSHDS 25-feature extraction throughput (audio-sec/sec);
2. openSMILE-style 912-feature extraction throughput over a reading-set-like
   batch;
3. Wav2Vec2 sequence-embedding extraction throughput (batched chunks);
4. CNN-LSTM inference p50 latency + audio-sec/sec (the bench.py headline);
5. a standard 5-fold SVM + a short CNN-LSTM CV round (end-to-end eval path).

Synthetic speech-like audio stands in for the corpus (no corpus audio ships
with the reference checkout — its data/ holds LFS pointers only). Results
are written to ``benchmarks/results.json``.

Run: ``python -m benchmarks.suite [--quick]``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SR = 16000


def _speech(seconds: float, f0: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    v = sum(np.sin(2 * np.pi * k * f0 * (1 + 0.01 * np.sin(2 * np.pi * 3 * t)) * t) / k
            for k in range(1, 12))
    gate = np.where((t % 0.6) < 0.42, 1.0, 0.02)
    x = (0.3 * gate * v / np.abs(v).max()
         + 0.002 * rng.normal(size=len(t)))
    # quantize to 16-bit PCM like a decoded corpus WAV (the real pipeline
    # feeds n/32768 floats; this also engages the extractors' lossless
    # int16 upload fast path)
    return (np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0
            ).astype(np.float32)


def bench_mshds(n_files: int, seconds: float) -> dict:
    import pandas as pd

    from robust_speech_analysis_framework_tpu.features.mshds import (
        extract_mshds_batch,
    )

    # NB: at 20 s the f0=150/210 members carry a ~25 ms voiced sliver that
    # NaNs their CPP column by design (reference src/mshds_extractor.py:
    # 269-301 wall; locked by tests/test_mshds.py::
    # test_cpps_short_voiced_segment_nans_whole_file). mean_F0 stays finite,
    # so the nan_rows guard below is unaffected.
    waves = {f"f{i}.wav": _speech(seconds, 120 + 15 * i, i) for i in range(n_files)}
    warm = {f"w{i}.wav": _speech(seconds, 125 + 15 * i, 70 + i) for i in range(n_files)}
    extract_mshds_batch(warm, SR, n_workers=8, verbose=False)  # compile
    # first pass carries residual data-dependent compiles/cache loads; the
    # second is the steady state a real (111-file, ~1h-audio) corpus
    # amortizes to. Both are reported; steady is the headline.
    t0 = time.perf_counter()
    out = extract_mshds_batch(waves, SR, n_workers=8, verbose=False)
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = extract_mshds_batch(waves, SR, n_workers=8, verbose=False)
    dt = time.perf_counter() - t0
    nan_rows = int(out["mean_F0"].isna().sum())
    if nan_rows > n_files // 4:
        # a wedged device client NaN-fills rows; let the isolated-stage retry
        # rerun this in a fresh process
        raise RuntimeError(f"mshds extraction produced {nan_rows} NaN rows")
    return {
        "audio_seconds": n_files * seconds,
        "wall_seconds": dt,
        "nan_rows": nan_rows,
        "audio_sec_per_sec": n_files * seconds / dt,
        "first_pass_audio_sec_per_sec": n_files * seconds / dt_first,
    }


def bench_opensmile(n_files: int, seconds: float) -> dict:
    from robust_speech_analysis_framework_tpu.features.opensmile import OpenSmileExtractor

    ex = OpenSmileExtractor()
    warm = {f"w{i}.wav": _speech(seconds, 140, 90 + i) for i in range(n_files)}
    ex.extract_batch(warm, verbose=False)  # compile at the batch shape
    waves = {f"f{i}.wav": _speech(seconds, 120 + 15 * i, i) for i in range(n_files)}
    t0 = time.perf_counter()
    df = ex.extract_batch(waves, verbose=True)
    dt_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    df = ex.extract_batch(waves, verbose=True)
    dt = time.perf_counter() - t0
    if len(df) != n_files:
        raise RuntimeError(f"extraction incomplete: {len(df)}/{n_files} rows")
    return {
        "audio_seconds": n_files * seconds,
        "wall_seconds": dt,
        "audio_sec_per_sec": n_files * seconds / dt,
        "first_pass_audio_sec_per_sec": n_files * seconds / dt_first,
    }


def bench_wav2vec2(n_files: int, seconds: float) -> dict:
    """Both reference wav2vec2 paths: full (T,768) sequences (nb03) and
    on-device mean-pooled embeddings (nb01/SVM). The sequences number is
    transfer-bound on this rig — the chip tunnel caps at ~50 MB/s and the
    per-audio-second payload is 64 KB up + 153 KB down in f32. The headline
    numbers use the reduced-transfer paths (int16 upload, bf16 compute;
    'fast' = f16 sequence download, 32 KB up + 77 KB down; 'fastest' = int8
    per-frame-quantized download, 32 KB up + ~39 KB down; both cosine
    >0.9999 vs strict — tests/test_wav2vec2.py); strict-f32 numbers are
    reported alongside."""
    import warnings

    from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # int16 upload is BIT-EXACT for 16-bit-PCM-derived audio (every
        # corpus WAV, and _speech's lattice-quantized synthesis): the
        # strict path keeps f32 compute + f32 download and still halves
        # its host→device stream
        strict = Wav2Vec2Extractor(
            batch_size=16, allow_random_init=True, upload_dtype=np.int16
        )
    fast = Wav2Vec2Extractor(
        params=strict.params, batch_size=16, compute_dtype="bfloat16",
        sequence_transfer_dtype=np.float16, upload_dtype=np.int16,
    )
    fastest = Wav2Vec2Extractor(
        params=strict.params, batch_size=16, compute_dtype="bfloat16",
        sequence_transfer_dtype=np.int8, upload_dtype=np.int16,
    )
    # f32 compute + per-frame int16-quantized download: frame-scale
    # relative error ~3e-5 (inside the ≤1e-4 contract — bf16 compute is
    # NOT: measured ~1% Frobenius) at half the f32 download bytes
    exact16 = Wav2Vec2Extractor(
        params=strict.params, batch_size=16,
        sequence_transfer_dtype=np.int16, upload_dtype=np.int16,
    )
    warm = {f"w{i}.wav": _speech(5.0, 140, i) for i in range(2)}
    # 3x the shared file count: at 5 s chunks/16-chunk batches the other
    # stages' corpus is only ~2 batches, which measures ramp, not the
    # pipelined steady state a real (~1 h audio) corpus runs at
    n_files = 3 * n_files
    waves = {f"f{i}.wav": _speech(seconds, 120 + 10 * i, i) for i in range(n_files)}
    out = {"audio_seconds": n_files * seconds}

    # Accuracy of the reduced-transfer presets against the BASELINE.md
    # contract ("<=1e-4 relative feature error"): measured against the
    # strict-f32 path on real bench audio, as (a) max elementwise
    # |Δ|/max(|strict|, 1e-3·scale) — floored so near-zero features don't
    # report meaningless ratios — and (b) Frobenius-norm relative error.
    probe = {k: waves[k] for k in list(waves)[:2]}
    ref_seq = strict.extract_sequences(probe, verbose=False)
    for label, ex in (
        ("fast", fast), ("fastest", fastest), ("exact16", exact16)
    ):
        max_rel = fro_rel = 0.0
        for name, r in ref_seq.items():
            a = ex.extract_sequences({name: probe[name]}, verbose=False)[name]
            floor = 1e-3 * float(np.max(np.abs(r)))
            max_rel = max(max_rel, float(np.max(
                np.abs(a - r) / np.maximum(np.abs(r), floor)
            )))
            fro_rel = max(fro_rel, float(
                np.linalg.norm(a - r) / np.linalg.norm(r)
            ))
        out[f"{label}_max_rel_error"] = max_rel
        out[f"{label}_fro_rel_error"] = fro_rel
    for label, ex in (
        ("strict_f32", strict), ("fast", fast), ("fastest", fastest),
        ("exact16", exact16),
    ):
        ex.extract_sequences(warm, verbose=False)  # compile
        if label in ("strict_f32", "fast"):  # pooled path: f32 vs bf16 only
            ex.extract_embeddings(warm, verbose=False)
        t0 = time.perf_counter()
        ex.extract_sequences(waves, verbose=False)
        dt = time.perf_counter() - t0
        out[f"{label}_audio_sec_per_sec"] = n_files * seconds / dt
        if label in ("strict_f32", "fast"):
            t0 = time.perf_counter()
            ex.extract_embeddings(waves, verbose=False)
            dt_emb = time.perf_counter() - t0
            out[f"{label}_embeddings_audio_sec_per_sec"] = (
                n_files * seconds / dt_emb
            )
    # headline sequence number: the best MEASURED configuration on this
    # link (int8 halves the bytes but has been observed slower than f16 —
    # transfer-path behavior is rig-dependent), with its measured error
    # attached; strict/fast/fastest all reported alongside
    best = max(
        ("strict_f32", "fast", "fastest", "exact16"),
        key=lambda l: out[f"{l}_audio_sec_per_sec"],
    )
    out["headline_preset"] = best
    out["headline_max_rel_error"] = out.get(f"{best}_max_rel_error", 0.0)
    out["audio_sec_per_sec"] = out[f"{best}_audio_sec_per_sec"]
    out["wall_seconds"] = n_files * seconds / out["audio_sec_per_sec"]
    # north-star contract number: the fastest preset whose measured
    # Frobenius relative error vs strict f32 is ≤1e-4
    contract = [
        l for l in ("fast", "fastest", "exact16")
        if out.get(f"{l}_fro_rel_error", 1.0) <= 1e-4
    ]
    out["contract_audio_sec_per_sec"] = max(
        [out["strict_f32_audio_sec_per_sec"]]
        + [out[f"{l}_audio_sec_per_sec"] for l in contract]
    )
    out["embeddings_audio_sec_per_sec"] = out["fast_embeddings_audio_sec_per_sec"]
    return out


def bench_cnn_lstm() -> dict:
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.models import CNNLSTM

    BATCH, SEQ_LEN, PAD_LEN, FPS = 128, 4378, 4480, 49.9
    if jax.default_backend() == "cpu":
        BATCH = 8  # CPU baseline at the torch-baseline batch size
    model = CNNLSTM(input_dim=768, cnn_out_channels=128, lstm_hidden_dim=128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, PAD_LEN, 768)), jnp.float32
    )
    lengths = jnp.full((BATCH,), SEQ_LEN, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x[:1, :256], train=False)
    fwd = jax.jit(lambda v, x, l: model.apply(v, x, train=False, lengths=l))
    np.asarray(fwd(variables, x, lengths))
    times = []
    for i in range(5 if BATCH > 8 else 2):
        t0 = time.perf_counter()
        np.asarray(fwd(variables, x + jnp.float32(i * 1e-6), lengths))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio = x.shape[0] * SEQ_LEN / FPS
    return {"p50_batch_seconds": p50, "batch": int(x.shape[0]),
            "audio_sec_per_sec": audio / p50}


def bench_cv(quick: bool) -> dict:
    import pandas as pd

    from robust_speech_analysis_framework_tpu.eval.svm_cv import (
        run_svm_standard_kfold_cv,
    )
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        run_dl_standard_kfold_cv,
    )

    # Warm the device link before any timed first pass: the tunneled
    # backend's first RPC after an idle window has been observed to stall
    # for minutes (observed 124s/407s outliers on an 0.5s measurement).
    # A throwaway compile + round trip absorbs the wedge so the timings
    # below measure OUR first-pass cost (trace + cache load + upload),
    # not the link's wake-up.
    import jax
    import jax.numpy as jnp

    warm = np.random.default_rng(1).normal(size=(256, 256)).astype(np.float32)
    np.asarray(jax.jit(lambda a: (a @ a).sum())(jnp.asarray(warm)))

    rng = np.random.default_rng(0)
    n, d = 110, 911
    X = pd.DataFrame(rng.normal(size=(n, d)))
    X.columns = [f"f{i}" for i in range(d)]
    y = (rng.random(n) > 0.5).astype(int)
    t0 = time.perf_counter()
    run_svm_standard_kfold_cv(X, y, n_features_to_select=50)
    svm_dt = time.perf_counter() - t0
    # steady state: on an accelerator backend the batched device SMO's
    # one-off jit compile is out of the way — this is what a sweep of 18
    # experiments actually runs at
    t0 = time.perf_counter()
    run_svm_standard_kfold_cv(X, y, n_features_to_select=50)
    svm_dt2 = time.perf_counter() - t0

    seqs, rows = {}, []
    for i in range(20):
        pid = f"{i:02d}_{'P' if i % 2 else 'C'}"
        seqs[pid] = rng.normal(size=(rng.integers(64, 256), 768)).astype(np.float32)
        rows.append({"unique_participant_id": pid,
                     "label": "Patient" if i % 2 else "Control"})
    hp = {"learning_rate": 1e-3, "dropout_rate": 0.3, "cnn_out_channels": 32,
          "lstm_hidden_dim": 64, "activation_fn": "silu"}
    meta = pd.DataFrame(rows)
    epochs = 2 if quick else 5
    t0 = time.perf_counter()
    run_dl_standard_kfold_cv(seqs, meta, hp, n_splits=3,
                             epochs=epochs, patience=10, batch_size=4)
    dl_dt = time.perf_counter() - t0
    # second round: every program is live, so this is the steady state a
    # real tuning sweep (hundreds of trials of the same shapes) runs at;
    # the first round is dominated by XLA compile/cache loading
    t0 = time.perf_counter()
    run_dl_standard_kfold_cv(seqs, meta, hp, n_splits=3,
                             epochs=epochs, patience=10, batch_size=4)
    dl_dt2 = time.perf_counter() - t0
    # One TPE-style tuning trial — the reference's dominant workload is
    # 25 of these per outer fold (src/dl_cv_strategies.py:197-254: 3 inner
    # folds × 15 fixed epochs × batch 4).
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        _TrainerCache, _as_device_corpus, _inner_cv_score,
        align_sequences_and_labels,
    )

    X, yv, _ = align_sequences_and_labels(seqs, meta)
    Xc = _as_device_corpus(X)
    cache = _TrainerCache(input_dim=768)
    inner_epochs = 3 if quick else 15
    _inner_cv_score(cache, hp, Xc, yv, 3, inner_epochs, 4, 42)  # compile
    t0 = time.perf_counter()
    _inner_cv_score(cache, hp, Xc, yv, 3, inner_epochs, 4, 42)
    trial_dt = time.perf_counter() - t0

    # A whole ask-8 round of same-architecture trials as lane-vmapped fold
    # programs (the reference runs all trials strictly sequentially,
    # src/dl_cv_strategies.py:308-310) vs the same 8 trials one at a time.
    from robust_speech_analysis_framework_tpu.eval.dl_cv import (
        _inner_cv_scores_batch,
    )

    trng = np.random.default_rng(7)
    plist = [
        dict(hp, learning_rate=float(10 ** trng.uniform(-5, -3)),
             dropout_rate=float(trng.uniform(0.2, 0.5)))
        for _ in range(8)
    ]
    _inner_cv_scores_batch(cache, plist, Xc, yv, 3, inner_epochs, 4, 42)
    t0 = time.perf_counter()
    _inner_cv_scores_batch(cache, plist, Xc, yv, 3, inner_epochs, 4, 42)
    batched_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in plist:
        _inner_cv_score(cache, p, Xc, yv, 3, inner_epochs, 4, 42)
    sequential_dt = time.perf_counter() - t0

    return {"svm_standard_5fold_seconds": svm_dt, "dl_3fold_seconds": dl_dt,
            "svm_standard_5fold_steady_seconds": svm_dt2,
            "dl_3fold_steady_seconds": dl_dt2,
            "dl_tuning_trial_seconds": trial_dt,
            "dl_tuning_trials8_batched_seconds": batched_dt,
            "dl_tuning_trials8_sequential_seconds": sequential_dt,
            "dl_tuning_trials8_speedup": sequential_dt / batched_dt}


STAGES = ["mshds_extract", "opensmile_extract", "wav2vec2_extract",
          "cnn_lstm_infer", "cv_round"]


def link_probe(n_mb: int = 8) -> dict:
    """Host↔device link bandwidth at measurement time.

    The sequence-transfer stages (wav2vec2 sequences, openSMILE fetches)
    are bound by this link on the tunneled dev rig, and it fluctuates by
    >4× with external load — recording it alongside the throughput numbers
    makes a bad-window measurement recognizable as such."""
    import jax
    import jax.numpy as jnp

    a = np.ones((n_mb << 20) // 4, np.float32)
    up = jnp.zeros(8)  # connection warm-up
    np.asarray(up)
    t0 = time.perf_counter()
    d = jnp.asarray(a)
    d.block_until_ready()
    up_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(d)
    down_s = time.perf_counter() - t0
    return {"up_mb_per_s": n_mb / up_s, "down_mb_per_s": n_mb / down_s}


def run_stage(name: str, quick: bool) -> dict:
    n_files = 3 if quick else 8
    seconds = 5.0 if quick else 20.0
    if name == "mshds_extract":
        return bench_mshds(n_files, seconds)
    if name == "opensmile_extract":
        return bench_opensmile(n_files, seconds)
    if name == "wav2vec2_extract":
        return bench_wav2vec2(n_files, seconds)
    if name == "cnn_lstm_infer":
        return bench_cnn_lstm()
    if name == "cv_round":
        return bench_cv(quick)
    raise ValueError(name)


def _load_json(path):
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _attach_ratio(name: str, result: dict, baselines: dict) -> None:
    """Annotate ``result`` with vs_baseline against the stored CPU numbers.

    Extraction/inference stages compare audio-sec/sec; the cv_round stage
    compares wall seconds (lower is better, so ratio = baseline/ours)."""
    base = baselines.get(name)
    if not base or "error" in result:
        return
    try:
        if "audio_sec_per_sec" in result and "audio_sec_per_sec" in base:
            result["vs_baseline"] = (
                result["audio_sec_per_sec"] / base["audio_sec_per_sec"]
            )
            result["baseline_impl"] = base.get("impl", "jax-cpu")
        elif name == "cv_round":
            for key in ("svm_standard_5fold_seconds", "dl_3fold_seconds",
                        "dl_tuning_trial_seconds"):
                if key in result and base.get(key):
                    result[f"vs_baseline_{key}"] = base[key] / result[key]
            for stage in ("dl_3fold", "svm_standard_5fold"):
                # steady-vs-steady when the baseline recorded one, else the
                # baseline's first pass (older baselines.json files)
                ours = result.get(f"{stage}_steady_seconds")
                base_steady = base.get(f"{stage}_steady_seconds") or base.get(
                    f"{stage}_seconds"
                )
                if ours and base_steady:
                    result[f"vs_baseline_{stage}_steady"] = base_steady / ours
            # the end-to-end tuning-round win: the reference runs trials
            # strictly sequentially (src/dl_cv_strategies.py:308-310), so
            # the honest baseline for one ask-8 round is 8 sequential CPU
            # trials; ours is the lane-batched device round
            seq_cpu = base.get("dl_tuning_trials8_sequential_seconds")
            ours_batched = result.get("dl_tuning_trials8_batched_seconds")
            if seq_cpu and ours_batched:
                result["vs_baseline_dl_tuning_trials8_round"] = (
                    seq_cpu / ours_batched
                )
            result["baseline_impl"] = base.get("impl", "jax-cpu")
    except Exception:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--stage", default=None, help="run ONE stage inline")
    parser.add_argument("--inline", action="store_true",
                        help="run all stages in this process (no isolation)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (baseline measurement)")
    parser.add_argument(
        "--baseline", action="store_true",
        help="measure every stage on the CPU backend and store the numbers "
             "in benchmarks/baselines.json (the 'reference CPU' side of "
             "BASELINE.md:41-43; note this host is 1-core)",
    )
    args = parser.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        # the site hook re-pins JAX_PLATFORMS at interpreter start; the
        # config flag is authoritative (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    if args.stage:
        result = run_stage(args.stage, args.quick)
        try:
            result["link"] = link_probe()
        except Exception:
            pass
        print("STAGE_RESULT " + json.dumps(result))
        return

    if args.baseline:
        import subprocess
        import sys

        base_path = os.path.join(os.path.dirname(__file__), "baselines.json")
        baselines = _load_json(base_path)
        for name in STAGES:
            cmd = [sys.executable, "-m", "benchmarks.suite",
                   "--stage", name, "--cpu"]
            if args.quick:
                cmd.append("--quick")
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                line = next(
                    (l for l in proc.stdout.splitlines()
                     if l.startswith("STAGE_RESULT ")), None,
                )
                if line:
                    entry = json.loads(line[len("STAGE_RESULT "):])
                    entry["impl"] = "jax-cpu"
                    entry["nproc"] = os.cpu_count()
                    if name == "cnn_lstm_infer" and name in baselines and \
                            baselines[name].get("impl") == "torch-cpu":
                        # keep the torch-CPU number as the reference-stack
                        # baseline; store the jax-cpu one alongside
                        baselines["cnn_lstm_infer_jaxcpu"] = entry
                    else:
                        baselines[name] = entry
                    print(f"{name}: {json.dumps(entry)}")
                else:
                    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                    print(f"{name}: ERROR {' | '.join(tail[-3:])[:300]}")
            except subprocess.TimeoutExpired:
                print(f"{name}: timeout")
            print(f"  ({time.perf_counter() - t0:.1f}s)")
        with open(base_path, "w") as fh:
            json.dump(baselines, fh, indent=2)
        print(f"written: {base_path}")
        return

    import subprocess
    import sys

    import jax

    results = {"backend": jax.default_backend()}
    for name in STAGES:
        t0 = time.perf_counter()
        if args.inline:
            try:
                results[name] = run_stage(name, args.quick)
            except Exception as e:
                results[name] = {"error": str(e)[:300]}
        else:
            # Each stage in its own process: a wedged device client (remote
            # backends occasionally poison a process) can't sink the rest.
            # One retry per stage — a fresh process clears a wedged client.
            cmd = [sys.executable, "-m", "benchmarks.suite", "--stage", name]
            if args.quick:
                cmd.append("--quick")
            for attempt in range(2):
                try:
                    proc = subprocess.run(
                        cmd, capture_output=True, text=True, timeout=3600,
                        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    )
                    line = next(
                        (l for l in proc.stdout.splitlines()
                         if l.startswith("STAGE_RESULT ")), None,
                    )
                    if line:
                        results[name] = json.loads(line[len("STAGE_RESULT "):])
                        break
                    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                    results[name] = {"error": " | ".join(tail[-3:])[:300]}
                except subprocess.TimeoutExpired:
                    results[name] = {"error": "stage timeout"}
        results[name]["total_seconds"] = time.perf_counter() - t0
        _attach_ratio(
            name, results[name],
            _load_json(os.path.join(os.path.dirname(__file__), "baselines.json")),
        )
        print(f"{name}: {json.dumps(results[name])}")

    out = os.path.join(os.path.dirname(__file__), "results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
