"""End-to-end demo: synthetic corpus → extraction → experiments → figures.

Mirrors the reference's three-notebook workflow (nb01 → nb02 → nb03) on a
generated miniature Androids-style corpus, so the whole framework can be
exercised without the (restricted) real corpus:

    python -m examples.run_full_pipeline --out /tmp/rsaf_demo

Produces the feature CSVs, the SVM results pickle, CNN-LSTM result pickles,
a final model checkpoint, a served prediction, and the analysis figures.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def make_corpus(root: str, n_per_class: int = 10) -> str:
    from robust_speech_analysis_framework_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)

    def speech(f0, seed, seconds=1.5):
        r = np.random.default_rng(seed)
        t = np.arange(int(seconds * SR)) / SR
        v = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 10))
        gate = np.where((t % 0.5) < 0.35, 1.0, 0.02)
        return (0.3 * gate * v / np.abs(v).max()
                + 0.002 * r.normal(size=len(t))).astype(np.float32)

    hc = os.path.join(root, "Reading-Task", "audio", "HC")
    pt = os.path.join(root, "Reading-Task", "audio", "PT")
    clips = os.path.join(root, "Interview-Task", "audio_clip")
    for d in (hc, pt, clips):
        os.makedirs(d, exist_ok=True)
    for i in range(n_per_class):
        write_wav(os.path.join(hc, f"{i+1:02d}_CF3{i}_1.wav"),
                  speech(185 + 7 * i, i), SR)
        write_wav(os.path.join(pt, f"{i+21:02d}_PM4{i}_2.wav"),
                  speech(112 + 7 * i, 100 + i), SR)
        for pid, f0 in ((f"{i+1:02d}_CF3{i}_1", 185), (f"{i+21:02d}_PM4{i}_2", 112)):
            sess = os.path.join(clips, pid)
            os.makedirs(sess, exist_ok=True)
            for c in range(2):
                # basenames must be unique across sessions (the corpus
                # keys features by basename, as the real Androids clips are)
                write_wav(os.path.join(sess, f"{pid}_clip_{c:03d}.wav"),
                          speech(f0 + 5 * c, 200 + i * 2 + c, 1.0), SR)
    with open(os.path.join(root, "fold-lists.csv"), "w") as fh:
        fh.write("banner,,\nfold1,fold1.1\n,\n")
    return root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/rsaf_demo")
    parser.add_argument("--trials", type=int, default=2)
    args = parser.parse_args()

    corpus = make_corpus(os.path.join(args.out, "corpus"))
    processed = os.path.join(args.out, "processed")
    results_dir = os.path.join(args.out, "results")
    models_dir = os.path.join(args.out, "models")

    from robust_speech_analysis_framework_tpu.experiments import (
        extract_all_features,
        run_all_svm_experiments,
        run_cnn_lstm_experiments,
    )
    from robust_speech_analysis_framework_tpu.features.wav2vec2 import Wav2Vec2Extractor
    from robust_speech_analysis_framework_tpu.models.wav2vec2 import Wav2Vec2Config

    print("== extraction (nb01 equivalent) ==")
    ex = Wav2Vec2Extractor(config=Wav2Vec2Config(num_layers=2), batch_size=4, allow_random_init=True)
    extract_all_features(corpus, processed, wav2vec2_extractor=ex, verbose=False)
    print("artifacts:", sorted(os.listdir(processed)))

    print("== SVM experiments (nb02 equivalent) ==")
    svm_results = run_all_svm_experiments(
        processed, os.path.join(results_dir, "all_svm_results.pkl"), verbose=False
    )
    from robust_speech_analysis_framework_tpu.eval.analysis import (
        optimism_bias,
        summarize_results,
    )

    print(summarize_results(svm_results)[["accuracy_mean", "f1_score_mean",
                                          "auc_mean"]].round(3))
    print(optimism_bias(svm_results).round(3))

    print("== CNN-LSTM experiments (nb03 equivalent) ==")
    dl_results = run_cnn_lstm_experiments(
        processed, corpus, results_dir, models_dir=models_dir,
        n_trials=args.trials, nested_epochs=4, nested_patience=4,
        standard_epochs=4, standard_patience=4, batch_size=4, verbose=False,
    )
    print(summarize_results(dl_results)[["f1_score_mean", "auc_mean"]].round(3))

    print("== figures ==")
    from robust_speech_analysis_framework_tpu.eval.plots import save_all

    figures = save_all(svm_results, os.path.join(args.out, "figures"))
    print({k: os.path.basename(v) for k, v in figures.items()})

    print("== serving ==")
    from robust_speech_analysis_framework_tpu.serving import Predictor

    ckpt = os.path.join(models_dir, "final_tuned_cnn_lstm_reading.pkl")
    predictor = Predictor.from_checkpoint(ckpt, extractor=ex)
    sample = os.path.join(corpus, "Reading-Task", "audio", "HC", "01_CF30_1.wav")
    pred = predictor.predict_files(
        [os.path.join(corpus, "Reading-Task", "audio", "HC", f)
         for f in sorted(os.listdir(os.path.join(corpus, "Reading-Task", "audio", "HC")))[:2]]
    )
    for name, p in pred.items():
        print(f"{name}: {p.label} (P(Patient)={p.probability:.3f})")
    print("demo complete:", args.out)


if __name__ == "__main__":
    main()
