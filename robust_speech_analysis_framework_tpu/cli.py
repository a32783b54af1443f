"""Command-line interface: extract / svm / cnnlstm / bench.

The reference ships no CLI — its entry points are three notebooks run in
order (README.md:38-41). This CLI exposes the same workflows as commands:

    python -m robust_speech_analysis_framework_tpu.cli extract \\
        --corpus /data/Androids-Corpus --out data/Processed_Features
    python -m robust_speech_analysis_framework_tpu.cli svm \\
        --processed data/Processed_Features --out results/all_svm_results.pkl
    python -m robust_speech_analysis_framework_tpu.cli cnnlstm \\
        --processed data/Processed_Features --corpus /data/Androids-Corpus \\
        --out results --models models
    python -m robust_speech_analysis_framework_tpu.cli bench
"""

from __future__ import annotations

import argparse
import json
import sys


def _w2v2_precision_kwargs(precision: str) -> dict:
    """'strict' = f32 end to end (HF parity); 'fast' = int16 waveform
    upload + bf16 matmuls + f16 sequence download (cosine >0.9999 vs
    strict, ~2x throughput on bandwidth-limited links); 'fastest' = 'fast'
    with int8 per-frame-quantized sequence download (halves the dominant
    stream again; cosine >0.9999 vs 'fast')."""
    if precision in ("fast", "fastest"):
        import numpy as np

        # batch size stays at the default 16: extraction is transfer-bound
        # and the deep in-flight pipeline keeps the chip busy; larger
        # batches only add padding waste and lengthen the fetch critical
        # path (measured on the tunneled v5e: bs=64 is ~30% slower)
        return {
            "compute_dtype": "bfloat16",
            "sequence_transfer_dtype": (
                np.int8 if precision == "fastest" else np.float16
            ),
            "upload_dtype": np.int16,
        }
    return {}


def _mesh_from_args(args):
    """Resolve the --devices/--mp flags to a mesh argument.

    Default (no flags): 'auto' — shard over ALL visible devices when more
    than one is present, single-device otherwise. ``--devices 1`` forces
    single-device; ``--devices N``/``--mp M`` build an explicit (N/M, M)
    mesh."""
    n = getattr(args, "devices", None)
    mp = getattr(args, "mp", 1)
    if n == 1:
        return None
    from .parallel import auto_mesh

    return auto_mesh(n_devices=n, mp=mp)


def _cmd_extract(args) -> int:
    from .experiments import extract_all_features
    from .features.wav2vec2 import Wav2Vec2Extractor

    features = args.features.split(",")
    extractor = None
    w2v2_kw = _w2v2_precision_kwargs(args.wav2vec2_precision)
    mesh = _mesh_from_args(args)
    w2v2_kw["mesh"] = mesh
    if args.wav2vec2_checkpoint:
        extractor = Wav2Vec2Extractor.from_hf_checkpoint(
            args.wav2vec2_checkpoint, **w2v2_kw
        )
    elif args.allow_random_wav2vec2:
        extractor = Wav2Vec2Extractor(allow_random_init=True, **w2v2_kw)
    elif "wav2vec2" in features:
        # fail fast: otherwise the mshds/opensmile stages run for minutes
        # before the wav2vec2 stage hits the random-weights guard
        print(
            "error: --features includes wav2vec2 but no --wav2vec2-checkpoint "
            "was given (the reference always runs pretrained "
            "facebook/wav2vec2-base-960h). Pass --wav2vec2-checkpoint PATH, "
            "--allow-random-wav2vec2 (throughput testing only), or drop "
            "wav2vec2 from --features.",
            file=sys.stderr,
        )
        return 2
    opensmile_config = None
    if args.opensmile_conf:
        from .features.conf_parser import opensmile_config_from_conf

        with open(args.opensmile_conf) as fh:
            opensmile_config = opensmile_config_from_conf(fh.read())
    if args.opensmile_reference_compat:
        from dataclasses import replace

        from .features.opensmile import OpenSmileConfig

        opensmile_config = replace(
            opensmile_config or OpenSmileConfig(), reference_compat=True
        )
    paths = extract_all_features(
        args.corpus,
        args.out,
        features=features,
        skip_existing=not args.force,
        wav2vec2_extractor=extractor,
        opensmile_config=opensmile_config,
        verbose=not args.quiet,
        mesh=mesh,
    )
    for name, path in paths.items():
        print(f"{name}: {path}")
    return 0


def _cmd_svm(args) -> int:
    from .experiments import run_all_svm_experiments

    results = run_all_svm_experiments(
        args.processed,
        out_path=args.out,
        n_features_standard=args.k_standard,
        skip_existing=not args.force,
        verbose=not args.quiet,
    )
    for name, r in results.items():
        df = r["results_df"]
        print(
            f"{name}: acc {df['accuracy'].mean():.3f}±{df['accuracy'].std():.3f} "
            f"f1 {df['f1_score'].mean():.3f} auc {df['auc'].mean():.3f}"
        )
    return 0


def _cmd_cnnlstm(args) -> int:
    from .experiments import run_cnn_lstm_experiments

    results = run_cnn_lstm_experiments(
        args.processed,
        args.corpus,
        args.out,
        models_dir=args.models,
        n_trials=args.trials,
        skip_existing=not args.force,
        verbose=not args.quiet,
        mesh=_mesh_from_args(args),
        trial_batch=args.trial_batch,
    )
    for name, r in results.items():
        df = r["results_df"]
        print(
            f"{name}: f1 {df['f1_score'].mean():.3f}±{df['f1_score'].std():.3f} "
            f"auc {df['auc'].mean():.3f}"
        )
    return 0


def _cmd_predict(args) -> int:
    from .serving import Predictor
    from .features.wav2vec2 import Wav2Vec2Extractor

    extractor = None
    if args.wav2vec2_checkpoint:
        extractor = Wav2Vec2Extractor.from_hf_checkpoint(
            args.wav2vec2_checkpoint,
            **_w2v2_precision_kwargs(args.wav2vec2_precision),
        )
    if args.reference_format:
        predictor = Predictor.from_reference_checkpoint(args.model, extractor)
    else:
        predictor = Predictor.from_checkpoint(args.model, extractor)
    out = predictor.predict_files(args.audio)
    for name, pred in out.items():
        print(f"{name}: {pred.label} (P(Patient)={pred.probability:.3f}, "
              f"{pred.latency_seconds*1e3:.0f} ms)")
    return 0


def _cmd_reproduce(args) -> int:
    from .eval.reproduce import run_reproduction

    comparison = run_reproduction(
        args.corpus, args.processed,
        wav2vec2_checkpoint=args.wav2vec2_checkpoint,
        out_dir=args.out_dir, verbose=not args.quiet,
    )
    n_off = int((~comparison["within_noise"] & ~comparison["missing"]).sum())
    return 1 if n_off else 0


def _cmd_bench(args) -> int:
    import runpy
    import os

    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    runpy.run_path(bench_path, run_name="__main__")
    return 0


def _add_mesh_flags(p) -> None:
    p.add_argument(
        "--devices", type=int, default=None,
        help="number of devices to use (default: all visible devices — on "
             "multi-chip this shards file batches and trial lanes "
             "automatically; --devices 1 forces single-device)",
    )
    p.add_argument(
        "--mp", type=int, default=1,
        help="model-parallel axis size of the (dp, mp) mesh (must divide "
             "the device count; dp = devices / mp)",
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="robust_speech_analysis_framework_tpu",
        description="TPU-native speech analysis framework CLI",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("extract", help="run corpus feature extraction")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--features", default="mshds,opensmile,wav2vec2")
    p.add_argument(
        "--wav2vec2-checkpoint", default=None,
        help="local HF wav2vec2-base-960h checkpoint dir; REQUIRED for "
             "meaningful wav2vec2 features (the reference always runs "
             "pretrained weights)",
    )
    p.add_argument(
        "--allow-random-wav2vec2", action="store_true",
        help="run wav2vec2 on random weights (throughput testing only; "
             "embeddings are meaningless)",
    )
    p.add_argument(
        "--opensmile-conf", default=None,
        help="openSMILE .conf file (Androids.conf subset) configuring the "
             "911-feature extractor declaratively",
    )
    p.add_argument(
        "--opensmile-reference-compat", action="store_true",
        help="emit the reference's observed 911-column openSMILE schema "
             "(first emitted feature dropped, matching the reference's "
             "instname-column assumption, src/opensmile_extractor.py:83) "
             "so downstream dataset shapes are 111x911 / 109x1822 / "
             "109x2733; default is the full native 912-column schema",
    )
    p.add_argument(
        "--wav2vec2-precision", choices=("strict", "fast", "fastest"), default="strict",
        help="'strict' (default) is f32 end to end; 'fast' uses int16 "
             "waveform upload + bf16 matmuls + f16 sequence download "
             "(cosine >0.9999 vs strict, ~2x throughput on "
             "bandwidth-limited hosts); 'fastest' adds int8 per-frame "
             "quantized sequence download (halves the stream again)",
    )
    p.add_argument("--force", action="store_true")
    p.add_argument("--quiet", action="store_true")
    _add_mesh_flags(p)
    p.set_defaults(fn=_cmd_extract)

    p = sub.add_parser("svm", help="run the 18 SVM CV experiments")
    p.add_argument("--processed", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--k-standard", type=int, default=25)
    p.add_argument("--force", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.set_defaults(fn=_cmd_svm)

    p = sub.add_parser("cnnlstm", help="run the 6 CNN-LSTM CV experiments")
    p.add_argument("--processed", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--models", default=None)
    p.add_argument("--trials", type=int, default=25)
    p.add_argument(
        "--trial-batch", type=int, default=8,
        help="TPE ask-K round size: K trials score concurrently as "
             "lane-vmapped fold programs (sharded over the mesh's dp axis "
             "on multi-chip). 1 = the reference's sequential per-trial "
             "schedule (posterior updates after every trial)",
    )
    p.add_argument("--force", action="store_true")
    p.add_argument("--quiet", action="store_true")
    _add_mesh_flags(p)
    p.set_defaults(fn=_cmd_cnnlstm)

    p = sub.add_parser("predict", help="classify audio files with a trained model")
    p.add_argument("--model", required=True)
    p.add_argument("audio", nargs="+")
    p.add_argument("--reference-format", action="store_true",
                   help="load a reference torch .pt checkpoint")
    p.add_argument("--wav2vec2-checkpoint", default=None)
    p.add_argument("--wav2vec2-precision", choices=("strict", "fast", "fastest"),
                   default="strict")
    p.set_defaults(fn=_cmd_predict)

    p = sub.add_parser(
        "reproduce",
        help="run the full 24-experiment battery and diff every metric "
             "against the reference's published tables (BASELINE.md §6)",
    )
    p.add_argument("--corpus", required=True)
    p.add_argument("--processed", required=True)
    p.add_argument("--wav2vec2-checkpoint", default=None)
    p.add_argument("--out-dir", default=None,
                   help="directory for the comparison CSV + JSON report "
                        "(default: <processed>/reproduction)")
    p.add_argument("--quiet", action="store_true")
    p.set_defaults(fn=_cmd_reproduce)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=_cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
