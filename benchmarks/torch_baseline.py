"""Reference-equivalent torch-CPU baseline for the CNN-LSTM inference bench.

The reference framework runs its CNN-LSTM in PyTorch (src/models.py:109-192,
CUDA-if-available, else CPU — this environment has CPU torch only). This
harness builds an architecturally equivalent torch model *from the published
architecture description* (residual Conv1d ×2 with BN + silu, max-pool 2,
2-layer biLSTM, attention pooling, linear head) and measures inference
throughput in audio-seconds of input per wall-clock second, writing the
result to ``benchmarks/baselines.json`` for bench.py to compare against.

Run: ``python -m benchmarks.torch_baseline``
"""

import json
import os
import time

import numpy as np

FRAMES_PER_SECOND = 49.9  # Wav2Vec2-base output rate (stride 320 @ 16 kHz)
SEQ_LEN = 4378  # reference example sequence: '01_CF56_1.wav' → (4378, 768)
DIM = 768
BATCH = 8
REPS = 5


def build_torch_model(cnn_channels=128, lstm_hidden=128, activation="silu"):
    import torch
    import torch.nn as nn

    act_cls = {"silu": nn.SiLU, "gelu": nn.GELU}[activation]

    class Residual1d(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.body = nn.Sequential(
                nn.Conv1d(cin, cout, 3, padding=1),
                nn.BatchNorm1d(cout),
                act_cls(),
                nn.Dropout(0.2),
                nn.Conv1d(cout, cout, 3, padding=1),
                nn.BatchNorm1d(cout),
            )
            self.skip = (
                nn.Sequential(nn.Conv1d(cin, cout, 1), nn.BatchNorm1d(cout))
                if cin != cout
                else nn.Identity()
            )
            self.act = act_cls()

        def forward(self, x):
            return self.act(self.body(x) + self.skip(x))

    class TorchCnnLstm(nn.Module):
        def __init__(self):
            super().__init__()
            self.block1 = Residual1d(DIM, cnn_channels)
            self.block2 = Residual1d(cnn_channels, cnn_channels)
            self.rnn = nn.LSTM(
                cnn_channels, lstm_hidden, num_layers=2,
                batch_first=True, bidirectional=True, dropout=0.5,
            )
            self.attn = nn.Linear(2 * lstm_hidden, 1)
            self.head = nn.Linear(2 * lstm_hidden, 2)

        def forward(self, x):
            h = x.transpose(1, 2)
            h = self.block1(h)
            h = nn.functional.max_pool1d(h, 2)
            h = self.block2(h)
            h = h.transpose(1, 2)
            h, _ = self.rnn(h)
            w = nn.functional.softmax(self.attn(h), dim=1)
            pooled = (h * w).sum(dim=1)
            return self.head(pooled)

    return TorchCnnLstm().eval()


def measure() -> dict:
    import torch

    model = build_torch_model()
    x = torch.randn(BATCH, SEQ_LEN, DIM)
    with torch.no_grad():
        model(x[:1, :256])  # warmup
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    audio_sec = BATCH * SEQ_LEN / FRAMES_PER_SECOND
    return {
        "cnn_lstm_infer": {
            "impl": "torch-cpu",
            "batch": BATCH,
            "seq_len": SEQ_LEN,
            "p50_batch_seconds": p50,
            "audio_sec_per_sec": audio_sec / p50,
        }
    }


def main():
    out_path = os.path.join(os.path.dirname(__file__), "baselines.json")
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    existing.update(measure())
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=2)
    print(json.dumps(existing, indent=2))


if __name__ == "__main__":
    main()
